"""Probe: where does the CT-conv gradient error vs FFT come from on TPU?

Measures, at the failing test's exact shapes (32x32 image, 5 obs):
  1. conv-op-level forward error (CT vs FFT, f32)
  2. conv-op-level gradient error (smooth cotangent, no Poisson terms)
  3. the same at lax.Precision.HIGHEST einsum precision
  4. loss-level gradient error (the failing assertion)
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from jolideco_tpu import FluxComponents, SpatialFluxComponent
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
from jolideco_tpu.parallel import StackedPoissonLoss
from jolideco_tpu.ops.fft import convolve_fft_precomputed
from jolideco_tpu.ops.ct_conv import ct_convolve_single


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.abs(b).max()
    return np.abs(a - b).max() / scale


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(11)
    datasets = {
        f"o{i}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for i in range(5)
    }
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    fluxes = components.to_flux_tuple()

    fft_loss = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="fft"
    )
    ct_loss = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="ct"
    )
    name = ct_loss.component_names[0]
    print("fft_shape:", fft_loss.fft_shape, "ct:", ct_loss.ct_fft_shape)

    x = jnp.asarray(np.asarray(fluxes[0], np.float32))

    kf = fft_loss.psf_ffts[name][0]
    kc = ct_loss.ct_singles[name][0]

    conv_f = jax.jit(
        lambda z, k: convolve_fft_precomputed(z, k, fft_loss.fft_shape)
    )

    def _conv_c(z, k, tables, precision):
        return ct_convolve_single(z, k[0], k[1], tables,
                                  ct_loss.ct_fft_shape, precision)

    conv_c = jax.jit(_conv_c, static_argnums=(3,))

    yf = np.asarray(conv_f(x, kf))
    yc = np.asarray(conv_c(x, kc, ct_loss.ct_tables, "split3"))
    print("conv fwd split3 max rel (of max):", rel(yc, yf))

    yh = np.asarray(
        conv_c(x, kc, ct_loss.ct_tables, lax.Precision.HIGHEST)
    )
    print("conv fwd HIGHEST max rel (of max):", rel(yh, yf))

    gf_fn = jax.jit(
        jax.grad(lambda z, k: jnp.sum(conv_f(z, k) ** 2))
    )
    gc_fn = jax.jit(
        jax.grad(lambda z, k, t, p: jnp.sum(_conv_c(z, k, t, p) ** 2)),
        static_argnums=(3,),
    )
    gf = np.asarray(gf_fn(x, kf))
    gc = np.asarray(gc_fn(x, kc, ct_loss.ct_tables, "split3"))
    gh = np.asarray(
        gc_fn(x, kc, ct_loss.ct_tables, lax.Precision.HIGHEST)
    )
    print("conv grad split3 max rel (of max):", rel(gc, gf))
    print("conv grad HIGHEST max rel (of max):", rel(gh, gf))

    # loss-level (the failing assertion)
    gr = jax.jit(lambda s, f: jax.grad(lambda z: s(((z,))))(f))
    g_fft = np.asarray(gr(fft_loss, fluxes[0]))
    g_ct = np.asarray(gr(ct_loss, fluxes[0]))
    print("loss-grad split3 max rel (of max):", rel(g_ct, g_fft))

    ev = jax.jit(lambda s, f: s.evaluate(f))
    v_fft = np.asarray(ev(fft_loss, fluxes))
    v_ct = np.asarray(ev(ct_loss, fluxes))
    print("loss values max rel:", rel(v_ct, v_fft))


if __name__ == "__main__":
    main()
