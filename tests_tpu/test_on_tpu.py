"""Compiled-TPU correctness tests (VERDICT round-1 task #2).

Mirrors the reference's hardware-gated pattern
(`/root/reference/jolideco/utils/testing.py:4-16`, used at
`tests/test_core.py:284-313` there) for the TPU backend.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp
from jax import lax

from jolideco_tpu.utils.testing import requires_device


@pytest.fixture(scope="module")
def gmm():
    from jolideco_tpu.priors import GaussianMixtureModel

    return GaussianMixtureModel.from_registry("builtin-8x8-v1")


@pytest.fixture(scope="module")
def patches():
    rs = np.random.RandomState(0)
    x = rs.rand(1000, 64).astype(np.float32) - 0.5
    x -= x.mean(axis=1, keepdims=True)
    return jnp.asarray(x)


@requires_device("tpu")
@pytest.mark.parametrize(
    "precision,rtol",
    [
        (lax.Precision.HIGHEST, 2e-5),
        (lax.Precision.HIGH, 3e-4),
        (lax.Precision.DEFAULT, 5e-2),
    ],
)
def test_pallas_kernel_compiled_matches_f64(gmm, patches, precision, rtol):
    """Compiled (Mosaic) kernel vs the float64 numpy reference at all
    three MXU precision modes, MAP and marginalise."""
    from jolideco_tpu.ops.gmm_pallas import gmm_score_pallas

    args = (gmm.packed, gmm.means_precisions_cholesky,
            gmm.precisions_cholesky, gmm.pixel_weights)
    ref = np.asarray(gmm.estimate_log_prob_numpy(np.asarray(patches)))

    values, argmax = jax.jit(
        lambda x: gmm_score_pallas(x, *args, False, precision, False)
    )(patches)
    assert_allclose(np.asarray(values), ref.max(axis=1), rtol=rtol)
    if precision != lax.Precision.DEFAULT:
        assert (np.asarray(argmax) == ref.argmax(axis=1)).all()

    lse_ref = ref.max(1) + np.log(
        np.exp(ref - ref.max(1, keepdims=True)).sum(1)
    )
    values_m, _ = jax.jit(
        lambda x: gmm_score_pallas(x, *args, False, precision, True)
    )(patches)
    assert_allclose(np.asarray(values_m), lse_ref, rtol=rtol)


@requires_device("tpu")
@pytest.mark.parametrize("marginalize", [False, True])
def test_pallas_gradient_compiled_matches_scan(gmm, patches, marginalize):
    """Compiled backward kernels (one-hot / softmax MXU selection,
    incl. VMEM sizing) vs the XLA scan gradient."""
    from jolideco_tpu.ops.gmm_pallas import gmm_score_pallas
    from jolideco_tpu.ops.gmm_score import gmm_score

    args = (gmm.packed, gmm.means_precisions_cholesky,
            gmm.precisions_cholesky, gmm.pixel_weights)

    g_pallas = np.asarray(jax.jit(jax.grad(
        lambda x: gmm_score_pallas(
            x, *args, False, lax.Precision.HIGHEST, marginalize
        )[0].sum()
    ))(patches))
    g_scan = np.asarray(jax.jit(jax.grad(
        lambda x: gmm_score(
            x,
            gmm.means_precisions_cholesky,
            gmm.precisions_cholesky,
            gmm.log_det_cholesky,
            gmm.log_weights,
            gmm.pixel_weights,
            marginalize=marginalize,
            precision=lax.Precision.HIGHEST,
        )[0].sum()
    ))(patches))
    scale = np.abs(g_scan).max()
    atol = 3e-2 if marginalize else 1e-4  # f32 softmax conditioning
    assert_allclose(g_pallas / scale, g_scan / scale, atol=atol)


@requires_device("tpu")
def test_pallas_hvp_compiled_matches_scan(gmm, patches):
    """Compiled forward-over-reverse (the Hessian-diagonal probe)
    through the Pallas scorer's nested custom_jvp rules vs the XLA scan
    scorer — the `compute_error` path must run on kernels without the
    multi-minute scan-scorer re-trace (VERDICT r2 item 2)."""
    from jolideco_tpu.ops.gmm_pallas import gmm_score_pallas
    from jolideco_tpu.ops.gmm_score import gmm_score

    args = (gmm.packed, gmm.means_precisions_cholesky,
            gmm.precisions_cholesky, gmm.pixel_weights)
    ones = jnp.ones_like(patches)

    def loss_pallas(x):
        return gmm_score_pallas(
            x, *args, False, lax.Precision.HIGHEST, False
        )[0].sum()

    def loss_scan(x):
        return gmm_score(
            x,
            gmm.means_precisions_cholesky,
            gmm.precisions_cholesky,
            gmm.log_det_cholesky,
            gmm.log_weights,
            gmm.pixel_weights,
            marginalize=False,
            precision=lax.Precision.HIGHEST,
        )[0].sum()

    hvp_pallas = np.asarray(jax.jit(
        lambda x, t: jax.jvp(jax.grad(loss_pallas), (x,), (t,))[1]
    )(patches, ones))
    hvp_scan = np.asarray(jax.jit(
        lambda x, t: jax.jvp(jax.grad(loss_scan), (x,), (t,))[1]
    )(patches, ones))
    scale = np.abs(hvp_scan).max()
    assert_allclose(hvp_pallas / scale, hvp_scan / scale, atol=1e-4)


@requires_device("tpu")
def test_pallas_hvp_marginalize_compiled_vs_dense_f64(gmm, patches):
    """Compiled marginalise-mode HVP (the softmax-HVP Mosaic kernel)
    vs the analytic Hessian action in numpy float64 — pins the
    compiled kernel to the mathematics rather than another f32
    softmax (the builtin GMM's O(1e5) logits make two correct f32
    softmax implementations differ at ~1e-2)."""
    from jolideco_tpu.ops.gmm_pallas import gmm_score_pallas

    x = np.asarray(patches, np.float64)[:256]
    t = np.ones_like(x)

    L = np.asarray(gmm.precisions_cholesky, np.float64)
    mp = np.asarray(gmm.means_precisions_cholesky, np.float64)
    ld = np.asarray(gmm.log_det_cholesky, np.float64)
    lw = np.asarray(gmm.log_weights, np.float64)
    w = np.asarray(gmm.pixel_weights, np.float64).reshape(-1)
    d = x.shape[1]

    a_quad = np.einsum("kde,e,kje->kdj", L, w, L)
    b_quad = np.einsum("ke,e,kje->kj", mp, w, L)
    c_quad = np.einsum("ke,e,ke->k", mp, w, mp)
    const = -0.5 * d * np.log(2 * np.pi) + ld + lw - 0.5 * c_quad

    xa = np.einsum("nd,kdj->nkj", x, a_quad)
    logits = (
        -0.5 * np.einsum("nkj,nj->nk", xa, x)
        + x @ b_quad.T
        + const[None, :]
    )
    p = np.exp(logits - logits.max(axis=1, keepdims=True))
    p /= p.sum(axis=1, keepdims=True)
    r = b_quad[None, :, :] - xa
    g = np.einsum("nkd,nd->nk", r, t)
    gbar = np.einsum("nk,nk->n", p, g)
    hvp_ref = (
        -np.einsum("nk,kdj,nj->nd", p, a_quad, t)
        + np.einsum("nk,nkd->nd", p * (g - gbar[:, None]), r)
    )

    args = (gmm.packed, gmm.means_precisions_cholesky,
            gmm.precisions_cholesky, gmm.pixel_weights)

    def loss_pallas(xx):
        return gmm_score_pallas(
            xx, *args, False, lax.Precision.HIGHEST, True
        )[0].sum()

    hvp_pallas = np.asarray(jax.jit(
        lambda xx, tt: jax.jvp(jax.grad(loss_pallas), (xx,), (tt,))[1]
    )(jnp.asarray(x, jnp.float32), jnp.asarray(t, jnp.float32)))
    scale = np.abs(hvp_ref).max()
    assert_allclose(hvp_pallas / scale, hvp_ref / scale, atol=1e-4)


@requires_device("tpu")
def test_fused_scorer_compiled_matches_patch_pipeline(gmm):
    """Compiled fused image-level scorer (batched R=8 strip tiles,
    `ops/gmm_fused.py`) vs the patch-level Pallas pipeline, values and
    gradients through the full prior."""
    from jolideco_tpu import config
    from jolideco_tpu.priors import GMMPatchPrior

    rs = np.random.RandomState(3)
    flux = jnp.asarray(rs.uniform(0.1, 2.0, size=(64, 1024)),
                       jnp.float32)
    prior = GMMPatchPrior(gmm=gmm, stride=4, cycle_spin=True)
    key = jax.random.PRNGKey(7)

    with config.force_pallas("on"):
        assert prior._fused_ok(flux.shape)
        lp_fused = jax.jit(lambda x: prior(x, key=key))(flux)
        g_fused = jax.jit(jax.grad(lambda x: prior(x, key=key)))(flux)
        with config.force_fused("off"):
            lp_ref = jax.jit(lambda x: prior(x, key=key))(flux)
            g_ref = jax.jit(jax.grad(lambda x: prior(x, key=key)))(flux)

    assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-4)
    scale = float(jnp.abs(g_ref).max())
    assert_allclose(np.asarray(g_fused) / scale,
                    np.asarray(g_ref) / scale, atol=1e-4)


@requires_device("tpu")
def test_fused_strip_fold_compiled_matches_patch_pipeline(gmm):
    """Compiled strip-folded variant (images narrower than one
    1024-lane chunk fold 2/4 strips side-by-side — multiscale levels,
    small upsampled fields) vs the patch pipeline, at a fold-2 width
    and an odd fold-4 width."""
    from jolideco_tpu import config
    from jolideco_tpu.priors import GMMPatchPrior

    for seed, shape in ((5, (48, 512)), (6, (44, 250))):
        rs = np.random.RandomState(seed)
        flux = jnp.asarray(rs.uniform(0.1, 2.0, size=shape),
                           jnp.float32)
        prior = GMMPatchPrior(gmm=gmm, stride=4, cycle_spin=True)
        key = jax.random.PRNGKey(17)

        with config.force_pallas("on"):
            assert prior._fused_ok(flux.shape)
            lp_fused = jax.jit(lambda x: prior(x, key=key))(flux)
            g_fused = jax.jit(jax.grad(lambda x: prior(x, key=key)))(flux)
            with config.force_fused("off"):
                lp_ref = jax.jit(lambda x: prior(x, key=key))(flux)
                g_ref = jax.jit(jax.grad(lambda x: prior(x, key=key)))(flux)

        assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-4)
        scale = float(jnp.abs(g_ref).max())
        assert_allclose(np.asarray(g_fused) / scale,
                        np.asarray(g_ref) / scale, atol=1e-4)


@requires_device("tpu")
def test_fused_marginalise_compiled_matches_patch_pipeline(gmm):
    """Compiled fused marginalise path (logsumexp forward + softmax
    backward with in-kernel logits recompute) vs the patch pipeline."""
    from jolideco_tpu import config
    from jolideco_tpu.priors import GMMPatchPrior

    rs = np.random.RandomState(4)
    flux = jnp.asarray(rs.uniform(0.1, 2.0, size=(64, 1024)),
                       jnp.float32)
    prior = GMMPatchPrior(gmm=gmm, stride=4, cycle_spin=True,
                          marginalize=True)
    key = jax.random.PRNGKey(11)

    with config.force_pallas("on"):
        assert prior._fused_ok(flux.shape)
        lp_fused = jax.jit(lambda x: prior(x, key=key))(flux)
        g_fused = jax.jit(jax.grad(lambda x: prior(x, key=key)))(flux)
        with config.force_fused("off"):
            lp_ref = jax.jit(lambda x: prior(x, key=key))(flux)
            g_ref = jax.jit(jax.grad(lambda x: prior(x, key=key)))(flux)

    assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-4)
    scale = float(jnp.abs(g_ref).max())
    assert_allclose(np.asarray(g_fused) / scale,
                    np.asarray(g_ref) / scale, atol=2e-4)


@requires_device("tpu")
def test_e2e_gmm_training_on_tpu():
    """Short end-to-end GMM-prior run, compiled scan on the chip."""
    from jolideco_tpu import (
        FluxComponents,
        GMMPatchPrior,
        GaussianMixtureModel,
        MAPDeconvolver,
        SpatialFluxComponent,
    )
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf

    rs = np.random.RandomState(642020)
    datasets = {
        f"o{i}": gauss_and_point_sources_gauss_psf(
            shape=(64, 64), random_state=rs
        )
        for i in range(3)
    }
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((64, 64), np.float32),
        prior=GMMPatchPrior(
            gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1")
        ),
    )
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, display_progress=False,
        update_strategy="joint", scan_epochs=True, trace_every=10,
    )
    result = deco.run(datasets=datasets, components=components)
    # the data fit must improve; the total also carries the prior term,
    # whose value fluctuates with the per-epoch cycle spins
    fit = np.asarray(result.trace_loss["datasets-total"])
    assert np.isfinite(result.flux_total).all()
    assert fit[-1] < fit[0]


@requires_device("tpu")
def test_shard_single_device_mesh_noop():
    """shard() on a 1-device mesh is a numerical no-op."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.parallel import StackedPoissonLoss, make_obs_mesh

    rs = np.random.RandomState(642020)
    datasets = {
        f"o{i}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for i in range(4)
    }
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    # pass the loss as a pytree argument: a bound-method closure would
    # bake the complex PSF spectra in as mlir constants, which needs a
    # device->host fetch (unimplemented for c64 on remote backends)
    expected = np.asarray(
        jax.jit(lambda s, f: s.evaluate(f))(stacked, fluxes)
    )

    mesh = make_obs_mesh(n_devices=1)
    sharded = stacked.shard(mesh)
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@requires_device("tpu")
def test_packed_fft_compiled_matches_vmap():
    """Pair-packed FFT path vs per-observation vmap, compiled."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.parallel import StackedPoissonLoss

    rs = np.random.RandomState(1)
    datasets = {
        f"o{i}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for i in range(5)  # odd: tail path
    }
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    packed = np.asarray(
        jax.jit(lambda s, f: s.evaluate(f))(stacked, fluxes)
    )

    def vmap_path(s, f):
        per_obs = s._per_obs_fn(f)
        args = s._stacked_args(None)
        return jax.vmap(per_obs, in_axes=(0,) * len(args))(*args)

    ref = np.asarray(jax.jit(vmap_path)(stacked, fluxes))
    assert_allclose(packed, ref, rtol=1e-5, atol=1e-6)


@requires_device("tpu")
def test_stacked_ragged_upsampled_build_on_tpu():
    """Compiled device build (`ops.fft.build_kernel_stack`): ragged PSF
    sizes + ×2 upsampling on the chip must match the per-dataset build
    (which upsamples and embeds each PSF at its own size)."""
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.loss import PoissonLoss
    from jolideco_tpu.models import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.parallel import StackedPoissonLoss

    rs = np.random.RandomState(642020)
    datasets = {}
    for idx, shape_psf in enumerate([(17, 17), (11, 11), (21, 21)]):
        datasets[f"{idx}"] = gauss_and_point_sources_gauss_psf(
            random_state=rs, shape_psf=shape_psf
        )

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32), np.float32), upsampling_factor=2
    )

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    assert_allclose(
        np.asarray(stacked.evaluate(fluxes)),
        np.asarray(per_dataset.evaluate(fluxes)),
        rtol=1e-4,
    )


@requires_device("tpu")
def test_stacked_ct_conv_compiled_matches_fft():
    """conv_mode='ct' (packed-pair Cooley-Tukey matmul DFT,
    `ops/ct_conv.py`) vs the FFT path, compiled on the chip: loss
    values and flux gradients. The Karatsuba split-float complex
    matmuls only exercise real MXU behavior here — the CPU tier runs
    them through XLA:CPU's float path, which hides bf16 rounding."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.parallel import StackedPoissonLoss

    rs = np.random.RandomState(11)
    datasets = {
        f"o{i}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for i in range(5)  # odd count: exercises the rFFT tail fallback
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
    assert ct_loss.ct_pair_kernels is not None

    ev = jax.jit(lambda s, f: s.evaluate(f))
    v_fft = np.asarray(ev(fft_loss, fluxes))
    v_ct = np.asarray(ev(ct_loss, fluxes))
    assert_allclose(v_ct, v_fft, rtol=2e-4, atol=2e-4)

    gr = jax.jit(lambda s, f: jax.grad(lambda x: s(((x,))))(f))
    g_fft = np.asarray(gr(fft_loss, fluxes[0]))
    g_ct = np.asarray(gr(ct_loss, fluxes[0]))
    scale = np.abs(g_fft).max()
    assert_allclose(g_ct / scale, g_fft / scale, atol=3e-4)


@requires_device("tpu")
def test_bf16_round_survives_xla_excess_precision():
    """The compiled bf16 rounding must match host-side rounding.

    XLA's excess-precision pass elides naive f32->bf16->f32 convert
    pairs on TPU, which zeroes split-float compensation operands (the
    round-3 CT-conv gradient regression); `ops.splitfp.bf16_round`
    pins the narrowing with an optimization_barrier.
    """
    from jolideco_tpu.ops.splitfp import bf16_round

    x = jnp.asarray(
        np.random.RandomState(0).randn(64, 64).astype(np.float32)
    )
    compiled = np.asarray(jax.jit(bf16_round)(x))
    host = np.asarray(x).astype(jnp.bfloat16).astype(np.float32)
    assert np.array_equal(compiled, host)
    # the residual actually feeds a nonzero MXU compensation pass
    lo = np.asarray(jax.jit(lambda z: z - bf16_round(z))(x))
    assert np.abs(lo).max() > 0.0


@requires_device("tpu")
@pytest.mark.parametrize("marginalize", [False, True],
                         ids=["map", "marginalise"])
def test_compute_error_at_benchmark_scale(marginalize):
    """``TotalLoss.fluxes_error`` at the north-star scale (10 obs,
    1024^2, K=200 GMM) stays on compiled second-order kernels.

    Pins the round-3 win: the Hessian probe runs forward-over-reverse
    through the patch-level Pallas kernels (MAP: piecewise-constant
    argmax rule; marginalise: the softmax-HVP kernel) in well under a
    second once compiled. A regression to the re-traced XLA scan
    scorer — or a broken capability fallback — shows up as a
    multi-second repeat probe and fails the bound."""
    import time

    from bench import make_bench_gmm, make_datasets
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.loss import PriorLoss, TotalLoss
    from jolideco_tpu.parallel import StackedPoissonLoss
    from jolideco_tpu.priors import GMMPatchPrior

    datasets = make_datasets(n_obs=10, size=1024)
    prior = GMMPatchPrior(gmm=make_bench_gmm(k=200), stride=4,
                          cycle_spin=False, marginalize=marginalize)
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((1024, 1024), np.float32), prior=prior
    )
    poisson = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    total = TotalLoss(
        poisson_loss=poisson,
        prior_loss=PriorLoss(priors=components.priors),
        beta=1.0,
    )
    fluxes = components.to_flux_tuple()

    # first call pays the compile; the repeat is the steady-state probe
    err = np.asarray(total.fluxes_error(fluxes=fluxes)["flux"])
    assert np.isfinite(err).all(), "non-finite flux errors"
    assert (err > 0).all()

    t0 = time.time()
    err2 = np.asarray(total.fluxes_error(fluxes=fluxes)["flux"])
    t_repeat = time.time() - t0
    assert np.array_equal(err, err2)
    # round-3 steady state is ~0.4 s; 4 s leaves ample tunnel-noise
    # headroom while still catching an order-of-magnitude regression
    assert t_repeat < 4.0, (
        f"cached compute_error probe took {t_repeat:.2f}s (> 4s bound)"
    )


@requires_device("tpu")
def test_stacked_pfft_conv_compiled_matches_fft():
    """conv_mode='pfft' (Pallas two-stage matmul FFT,
    `ops/pallas_fft.py`) vs the XLA FFT path, compiled on the chip:
    loss values and flux gradients at both the f32 and split matmul
    modes. 32^2 images exercise the pad-to-128-multiple path and the
    odd observation count exercises the rFFT tail fallback; the CPU
    tier only ever runs these kernels under the Pallas interpreter."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu import config as jt_config
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.parallel import StackedPoissonLoss

    rs = np.random.RandomState(12)
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
    pfft_loss = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="pfft"
    )
    assert pfft_loss.pfft_pairs is not None

    ev = jax.jit(lambda s, f: s.evaluate(f))
    gr = jax.jit(lambda s, f: jax.grad(lambda x: s(((x,))))(f))
    v_fft = np.asarray(ev(fft_loss, fluxes))
    g_fft = np.asarray(gr(fft_loss, fluxes[0]))
    g_scale = np.abs(g_fft).max()

    saved = jt_config._GMM_PRECISION
    try:
        for mode, rtol in (("highest", 2e-5), ("high", 3e-4)):
            jt_config.set_gmm_precision(mode)
            # fresh jit wrappers per mode: the matmul mode is read at
            # trace time, so a cached trace would pin the first mode
            ev_m = jax.jit(lambda s, f: s.evaluate(f))
            gr_m = jax.jit(lambda s, f: jax.grad(lambda x: s(((x,))))(f))
            v_pfft = np.asarray(ev_m(pfft_loss, fluxes))
            assert_allclose(v_pfft, v_fft, rtol=rtol, atol=rtol)
            g_pfft = np.asarray(gr_m(pfft_loss, fluxes[0]))
            assert_allclose(
                g_pfft / g_scale, g_fft / g_scale, atol=rtol * 2
            )
    finally:
        jt_config.set_gmm_precision(saved)
