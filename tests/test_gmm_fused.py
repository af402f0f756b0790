"""Fused image-level GMM scorer vs the patch-level pipeline.

All tests run the Pallas kernels in interpret mode on the CPU backend
(see ``conftest.py``); compiled equivalence is covered on-chip by
``tests_tpu``.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp
from jax import lax

from jolideco_tpu import config
from jolideco_tpu.ops.gmm_fused import (
    fused_patch_count,
    fused_supported,
    gmm_score_fused_image,
)
from jolideco_tpu.ops.gmm_pallas import gmm_score_pallas
from jolideco_tpu.priors import GaussianMixtureModel, GMMPatchPrior
from jolideco_tpu.priors.patches.core import ZERO_FLUX_SENTINEL

P = 8
H, W, STRIDE = 16, 1024, 4


@pytest.fixture(scope="module")
def gmm():
    return GaussianMixtureModel.from_registry("builtin-8x8-v1")


@pytest.fixture(scope="module")
def image():
    rs = np.random.RandomState(7)
    img = rs.uniform(0.1, 2.0, size=(H, W)).astype(np.float32)
    # a zero-flux region exercising the sentinel mask
    img[:P, :2 * P] = 2.0 * ZERO_FLUX_SENTINEL
    return img


@pytest.fixture(scope="module")
def flux_image():
    """A well-scaled strictly-positive flux for prior-level tests."""
    rs = np.random.RandomState(8)
    return rs.uniform(0.1, 2.0, size=(H, W)).astype(np.float32)


def _manual_enumeration(img, stride):
    """Patches in the fused order: group-major over padded tilings."""
    from jolideco_tpu.ops.gmm_fused import _padded_dims

    h, w = img.shape
    hp, wp, _ = _padded_dims(h, w)
    pad = np.pad(img, ((0, hp - h + P), (0, wp - w + P)))
    rows, valids = [], []
    for a in range(0, P, stride):
        for b in range(0, P, stride):
            na, nb = (h - a) // P, (w - b) // P
            for i in range(hp // P):
                for j in range(wp // P):
                    patch = pad[a + P * i:a + P * i + P,
                                b + P * j:b + P * j + P].reshape(-1)
                    real = (i < na) and (j < nb)
                    v = real and bool((patch > ZERO_FLUX_SENTINEL).all())
                    x = np.where(v, patch, 0.0)
                    rows.append(x - x.mean())
                    valids.append(v)
    return np.stack(rows).astype(np.float32), np.asarray(valids)


def test_supported_gating():
    assert fused_supported((H, W), (P, P), 4, 64)
    assert fused_supported((2048, 2048), (P, P), 2, 64)
    assert fused_supported((H, W + 8), (P, P), 4, 64)  # padded width
    assert fused_supported((H + 3, W), (P, P), 4, 64)  # padded height
    assert fused_supported((512, 512), (P, P), 4, 64)  # fold = 2
    assert fused_supported((256, 256), (P, P), 4, 64)  # fold = 4
    assert fused_supported((128, 128), (P, P), 4, 64)  # fold = 8
    assert not fused_supported((64, 64), (P, P), 4, 64)  # narrow image
    assert not fused_supported((H, W), (16, 16), 4, 256)  # 16x16 GMM
    assert not fused_supported((H, W), (P, P), 3, 64)  # stride ∤ patch


def test_padded_dims_fold():
    from jolideco_tpu.ops.gmm_fused import _padded_dims

    assert _padded_dims(16, 1024) == (16, 1024, 1)
    assert _padded_dims(20, 1100) == (24, 2048, 1)
    assert _padded_dims(48, 520) == (48, 1024, 1)   # (512, 1024) pads
    assert _padded_dims(48, 512) == (48, 512, 2)
    assert _padded_dims(44, 512) == (48, 512, 2)    # height to 2 strips
    assert _padded_dims(256, 256) == (256, 256, 4)
    assert _padded_dims(128, 128) == (128, 128, 8)
    assert _padded_dims(130, 129) == (160, 256, 4)  # height to 4 strips
    assert _padded_dims(44, 264) == (48, 512, 2)    # w > 256 → 512 pad


@pytest.mark.parametrize("shape,fold", [
    ((48, 512), 2),       # exact fold-2 grid (multiscale level of 1024)
    ((44, 250), 4),       # odd dims through the fold-4 padding
    ((128, 128), 8),      # fold-8, single virtual strip per tile row
])
def test_fused_strip_fold_matches_manual(gmm, shape, fold):
    """Strip-folded narrow images (w < 1024) match the patch-level
    kernel on the real patches, padded entries come back invalid."""
    from jolideco_tpu.ops.gmm_fused import _padded_dims

    assert _padded_dims(*shape)[2] == fold
    rs = np.random.RandomState(14 + fold)
    img = rs.uniform(0.1, 2.0, size=shape).astype(np.float32)
    img[:P, :P] = 2.0 * ZERO_FLUX_SENTINEL

    x_ref, valid_ref = _manual_enumeration(img, STRIDE)
    v_ref, a_ref = gmm_score_pallas(
        jnp.asarray(x_ref), gmm.packed, gmm.means_precisions_cholesky,
        gmm.precisions_cholesky, gmm.pixel_weights, True,
        lax.Precision.HIGH, False,
    )
    values, argmax, valid = gmm_score_fused_image(
        jnp.asarray(img), (P, P), STRIDE, gmm.packed,
        ZERO_FLUX_SENTINEL, interpret=True,
        precision=lax.Precision.HIGH,
    )
    assert values.shape[0] == fused_patch_count(img.shape, STRIDE)
    assert np.array_equal(np.asarray(valid), valid_ref)
    m = valid_ref
    assert_allclose(np.asarray(values)[m], np.asarray(v_ref)[m],
                    rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.asarray(argmax)[m], np.asarray(a_ref)[m])

    # gradient flows back through the fold relayout into the image
    def f(x):
        v, _, vd = gmm_score_fused_image(
            x, (P, P), STRIDE, gmm.packed, ZERO_FLUX_SENTINEL,
            interpret=True, precision=lax.Precision.HIGH,
        )
        return jnp.sum(jnp.where(vd, v, 0.0))

    g = np.asarray(jax.grad(f)(jnp.asarray(img)))
    assert g.shape == img.shape
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_multiscale_prior_all_levels_fused(gmm):
    """All three levels of a MultiScalePrior on a 1024-wide flux
    dispatch fused (levels 1–2 are 512- and 256-wide, strip-folded)
    and match the patch path, values and gradients."""
    from jolideco_tpu.priors import MultiScalePrior

    rs = np.random.RandomState(15)
    flux = jnp.asarray(
        rs.uniform(0.1, 2.0, size=(64, 1024)).astype(np.float32)
    )
    base = GMMPatchPrior(gmm=gmm, stride=STRIDE, cycle_spin=False)
    prior = MultiScalePrior(prior=base, n_levels=3, cycle_spin=False)
    key = jax.random.PRNGKey(16)

    with config.force_pallas("interpret"):
        assert base._fused_ok((64, 1024))
        assert base._fused_ok((32, 512))
        assert base._fused_ok((16, 256))
        lp_fused = prior(flux, key=key)
        g_fused = jax.grad(lambda x: prior(x, key=key))(flux)
        with config.force_fused("off"):
            lp_ref = prior(flux, key=key)
            g_ref = jax.grad(lambda x: prior(x, key=key))(flux)

    assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-5)
    scale = float(jnp.abs(g_ref).max())
    assert_allclose(np.asarray(g_fused) / scale,
                    np.asarray(g_ref) / scale, atol=1e-5)


def test_fused_padded_odd_shape_matches_manual(gmm):
    """A 20 x 1100 image (height ∤ 8, width ∤ 1024) zero-pads to the
    24 x 2048 grid; padded patches come back invalid and values/grads
    match the patch-level pipeline on the real patches."""
    rs = np.random.RandomState(11)
    img = rs.uniform(0.1, 2.0, size=(20, 1100)).astype(np.float32)
    img[:P, :P] = 2.0 * ZERO_FLUX_SENTINEL

    x_ref, valid_ref = _manual_enumeration(img, STRIDE)
    v_ref, a_ref = gmm_score_pallas(
        jnp.asarray(x_ref), gmm.packed, gmm.means_precisions_cholesky,
        gmm.precisions_cholesky, gmm.pixel_weights, True,
        lax.Precision.HIGH, False,
    )
    values, argmax, valid = gmm_score_fused_image(
        jnp.asarray(img), (P, P), STRIDE, gmm.packed,
        ZERO_FLUX_SENTINEL, interpret=True,
        precision=lax.Precision.HIGH,
    )
    assert values.shape[0] == fused_patch_count(img.shape, STRIDE)
    assert np.array_equal(np.asarray(valid), valid_ref)
    m = valid_ref
    assert_allclose(np.asarray(values)[m], np.asarray(v_ref)[m],
                    rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.asarray(argmax)[m], np.asarray(a_ref)[m])

    # gradient flows only into the real image region
    def f(x):
        v, _, vd = gmm_score_fused_image(
            x, (P, P), STRIDE, gmm.packed, ZERO_FLUX_SENTINEL,
            interpret=True, precision=lax.Precision.HIGH,
        )
        return jnp.sum(jnp.where(vd, v, 0.0))

    g = np.asarray(jax.grad(f)(jnp.asarray(img)))
    assert g.shape == img.shape
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_prior_fused_odd_shape_matches_unfused(gmm):
    """Prior value + gradient parity at a non-multiple shape (the
    fused path zero-pads; the patch pipeline enumerates exactly)."""
    rs = np.random.RandomState(12)
    flux = jnp.asarray(
        rs.uniform(0.1, 2.0, size=(44, 1100)).astype(np.float32)
    )
    prior = GMMPatchPrior(gmm=gmm, stride=STRIDE, cycle_spin=True)
    key = jax.random.PRNGKey(13)

    with config.force_pallas("interpret"):
        assert prior._fused_ok(flux.shape)
        lp_fused = prior(flux, key=key)
        g_fused = jax.grad(lambda x: prior(x, key=key))(flux)
        with config.force_fused("off"):
            lp_ref = prior(flux, key=key)
            g_ref = jax.grad(lambda x: prior(x, key=key))(flux)

    assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-5)
    scale = float(jnp.abs(g_ref).max())
    assert_allclose(np.asarray(g_fused) / scale,
                    np.asarray(g_ref) / scale, atol=1e-5)


@pytest.mark.parametrize("stride", [4, 8])
def test_fused_matches_manual_enumeration(gmm, image, stride):
    x_ref, valid_ref = _manual_enumeration(image, stride)
    v_ref, a_ref = gmm_score_pallas(
        jnp.asarray(x_ref), gmm.packed, gmm.means_precisions_cholesky,
        gmm.precisions_cholesky, gmm.pixel_weights, True,
        lax.Precision.HIGH, False,
    )
    values, argmax, valid = gmm_score_fused_image(
        jnp.asarray(image), (P, P), stride, gmm.packed,
        ZERO_FLUX_SENTINEL, interpret=True,
        precision=lax.Precision.HIGH,
    )
    assert values.shape[0] == fused_patch_count(image.shape, stride)
    assert np.array_equal(np.asarray(valid), valid_ref)
    m = valid_ref
    assert_allclose(np.asarray(values)[m], np.asarray(v_ref)[m],
                    rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.asarray(argmax)[m], np.asarray(a_ref)[m])


def test_fused_full_strip_tiles_multi_chunk(gmm):
    """A tall, wide image exercises the batched-strip kernel (R = 8)
    together with the multi-chunk lane order restore (wc = 2)."""
    from jolideco_tpu.ops.gmm_fused import _strips_per_tile

    h, w, stride = 64, 2048, 4
    assert _strips_per_tile(h // P) == 8
    rs = np.random.RandomState(9)
    img = rs.uniform(0.1, 2.0, size=(h, w)).astype(np.float32)
    img[:P, -3 * P:] = 2.0 * ZERO_FLUX_SENTINEL

    x_ref, valid_ref = _manual_enumeration(img, stride)
    v_ref, a_ref = gmm_score_pallas(
        jnp.asarray(x_ref), gmm.packed, gmm.means_precisions_cholesky,
        gmm.precisions_cholesky, gmm.pixel_weights, True,
        lax.Precision.HIGH, False,
    )
    values, argmax, valid = gmm_score_fused_image(
        jnp.asarray(img), (P, P), stride, gmm.packed,
        ZERO_FLUX_SENTINEL, interpret=True,
        precision=lax.Precision.HIGH,
    )
    assert values.shape[0] == fused_patch_count(img.shape, stride)
    assert np.array_equal(np.asarray(valid), valid_ref)
    m = valid_ref
    assert_allclose(np.asarray(values)[m], np.asarray(v_ref)[m],
                    rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.asarray(argmax)[m], np.asarray(a_ref)[m])

    # reverse mode through the reorder + batched backward kernel
    def f_fused(x):
        v, _, vd = gmm_score_fused_image(
            x, (P, P), stride, gmm.packed, ZERO_FLUX_SENTINEL,
            interpret=True, precision=lax.Precision.HIGH,
        )
        return jnp.sum(jnp.where(vd, v, 0.0))

    g_fused = np.asarray(jax.grad(f_fused)(jnp.asarray(img)))
    assert np.isfinite(g_fused).all()
    assert np.abs(g_fused).max() > 0


def test_prior_fused_matches_unfused_batched_strips(gmm):
    """Value + gradient parity of the R = 8 batched-strip kernel
    against the patch-level pipeline, through the full prior."""
    rs = np.random.RandomState(10)
    flux = jnp.asarray(
        rs.uniform(0.1, 2.0, size=(64, 1024)).astype(np.float32)
    )
    prior = GMMPatchPrior(gmm=gmm, stride=STRIDE, cycle_spin=True)
    key = jax.random.PRNGKey(12)

    with config.force_pallas("interpret"):
        assert prior._fused_ok(flux.shape)
        lp_fused = prior(flux, key=key)
        g_fused = jax.grad(lambda x: prior(x, key=key))(flux)
        with config.force_fused("off"):
            lp_ref = prior(flux, key=key)
            g_ref = jax.grad(lambda x: prior(x, key=key))(flux)

    assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-5)
    scale = float(jnp.abs(g_ref).max())
    assert_allclose(np.asarray(g_fused) / scale,
                    np.asarray(g_ref) / scale, atol=1e-5)


@pytest.mark.parametrize("precision", [lax.Precision.HIGH,
                                       lax.Precision.HIGHEST])
def test_fused_marginalise_matches_manual(gmm, image, precision):
    """Marginalise (logsumexp) fused values vs the patch-level kernel
    on the same enumeration, both precisions."""
    x_ref, valid_ref = _manual_enumeration(image, STRIDE)
    v_ref, _ = gmm_score_pallas(
        jnp.asarray(x_ref), gmm.packed, gmm.means_precisions_cholesky,
        gmm.precisions_cholesky, gmm.pixel_weights, True,
        precision, True,
    )
    values, _, valid = gmm_score_fused_image(
        jnp.asarray(image), (P, P), STRIDE, gmm.packed,
        ZERO_FLUX_SENTINEL, interpret=True, precision=precision,
        marginalize=True,
    )
    assert np.array_equal(np.asarray(valid), valid_ref)
    m = valid_ref
    assert_allclose(np.asarray(values)[m], np.asarray(v_ref)[m],
                    rtol=3e-4, atol=3e-4)


def test_prior_fused_marginalise_matches_unfused(gmm, flux_image):
    """Value + gradient parity of the fused marginalise path (softmax
    backward with in-kernel logits recompute) against the patch-level
    pipeline, through the full prior."""
    flux = jnp.asarray(flux_image)
    prior = GMMPatchPrior(gmm=gmm, stride=STRIDE, cycle_spin=True,
                          marginalize=True)
    key = jax.random.PRNGKey(21)

    with config.force_pallas("interpret"):
        assert prior.marginalize
        assert prior._fused_ok(flux.shape)
        lp_fused = prior(flux, key=key)
        g_fused = jax.grad(lambda x: prior(x, key=key))(flux)
        with config.force_fused("off"):
            lp_ref = prior(flux, key=key)
            g_ref = jax.grad(lambda x: prior(x, key=key))(flux)

    assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-5)
    scale = float(jnp.abs(g_ref).max())
    assert_allclose(np.asarray(g_fused) / scale,
                    np.asarray(g_ref) / scale, atol=2e-5)


@pytest.mark.parametrize("precision", [lax.Precision.DEFAULT,
                                       lax.Precision.HIGHEST])
def test_fused_precision_modes(gmm, image, precision):
    x_ref, valid_ref = _manual_enumeration(image, STRIDE)
    v_ref, _ = gmm_score_pallas(
        jnp.asarray(x_ref), gmm.packed, gmm.means_precisions_cholesky,
        gmm.precisions_cholesky, gmm.pixel_weights, True,
        precision, False,
    )
    values, _, _ = gmm_score_fused_image(
        jnp.asarray(image), (P, P), STRIDE, gmm.packed,
        ZERO_FLUX_SENTINEL, interpret=True, precision=precision,
    )
    tol = 2e-2 if precision == lax.Precision.DEFAULT else 1e-5
    m = valid_ref
    assert_allclose(np.asarray(values)[m], np.asarray(v_ref)[m],
                    rtol=tol, atol=tol)


def test_fused_gradient_matches_patch_pipeline(gmm, image):
    """Reverse-mode through the fused custom_vjp equals autodiff of the
    explicit slice/extract/mask/normalise/score graph."""

    def f_fused(x):
        v, _, vd = gmm_score_fused_image(
            x, (P, P), STRIDE, gmm.packed, ZERO_FLUX_SENTINEL,
            interpret=True, precision=lax.Precision.HIGH,
        )
        return jnp.sum(jnp.where(vd, v, 0.0))

    def f_ref(x):
        pad = jnp.pad(x, ((0, P), (0, P)))
        rows, real = [], []
        for a in range(0, P, STRIDE):
            for b in range(0, P, STRIDE):
                na, nb = (H - a) // P, (W - b) // P
                for i in range(H // P):
                    for j in range(W // P):
                        patch = lax.slice(
                            pad, (a + P * i, b + P * j),
                            (a + P * i + P, b + P * j + P),
                        ).reshape(-1)
                        rows.append(patch)
                        real.append((i < na) and (j < nb))
        xj = jnp.stack(rows)
        sv = jnp.all(xj > ZERO_FLUX_SENTINEL, axis=1) & jnp.asarray(real)
        xj = jnp.where(sv[:, None], xj, 0.0)
        xj = xj - jnp.mean(xj, axis=1, keepdims=True)
        v, _ = gmm_score_pallas(
            xj, gmm.packed, gmm.means_precisions_cholesky,
            gmm.precisions_cholesky, gmm.pixel_weights, True,
            lax.Precision.HIGH, False,
        )
        return jnp.sum(jnp.where(sv, v, 0.0))

    x = jnp.asarray(image)
    g_fused = np.asarray(jax.grad(f_fused)(x))
    g_ref = np.asarray(jax.grad(f_ref)(x))
    scale = np.abs(g_ref).max()
    assert_allclose(g_fused / scale, g_ref / scale, atol=1e-5)


def test_prior_call_fused_matches_unfused(gmm, flux_image):
    prior = GMMPatchPrior(gmm=gmm, stride=STRIDE, cycle_spin=True)
    flux = jnp.asarray(flux_image)
    key = jax.random.PRNGKey(11)

    with config.force_pallas("interpret"):
        assert prior._fused_ok(flux.shape)
        lp_fused = prior(flux, key=key)
        g_fused = jax.grad(lambda x: prior(x, key=key))(flux)
        with config.force_fused("off"):
            lp_ref = prior(flux, key=key)
            g_ref = jax.grad(lambda x: prior(x, key=key))(flux)

    assert_allclose(float(lp_fused), float(lp_ref), rtol=1e-5)
    scale = float(jnp.abs(g_ref).max())
    assert_allclose(np.asarray(g_fused) / scale,
                    np.asarray(g_ref) / scale, atol=1e-5)


def test_prior_fused_gating(gmm):
    """Non-mean patch norms, jitter and subsampling all keep the
    patch-level path; marginalise goes fused."""
    from jolideco_tpu.utils.norms import StandardizedSubtractMeanPatchNorm

    shape = (H, W)
    with config.force_pallas("interpret"):
        assert GMMPatchPrior(gmm=gmm, stride=4)._fused_ok(shape)
        assert GMMPatchPrior(gmm=gmm, stride=4,
                             marginalize=True)._fused_ok(shape)
        assert not GMMPatchPrior(gmm=gmm, stride=4,
                                 jitter=True)._fused_ok(shape)
        assert not GMMPatchPrior(gmm=gmm, stride=4,
                                 patch_fraction=0.25)._fused_ok(shape)
        assert not GMMPatchPrior(
            gmm=gmm, stride=4,
            patch_norm=StandardizedSubtractMeanPatchNorm(),
        )._fused_ok(shape)
        assert not GMMPatchPrior(gmm=gmm, stride=4)._fused_ok((64, 64))
    with config.force_pallas("off"):
        assert not GMMPatchPrior(gmm=gmm, stride=4)._fused_ok(shape)


def test_fused_jvp_raises_and_hessian_falls_back(gmm, flux_image):
    """The fused path cannot be forward-over-reverse differentiated
    (custom_vjp TypeError, or NotImplementedError from JVP-ing the
    residualised forward kernel); the priors advertise this through
    ``second_order_ok`` (the capability probe hessian_diagonals
    dispatches on — no JAX error-text matching), and
    TotalLoss.hessian_diagonals lands on the patch-level kernels and
    matches them."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.data import point_source_gauss_psf
    from jolideco_tpu.loss import PoissonLoss, PriorLoss, TotalLoss

    prior = GMMPatchPrior(gmm=gmm, stride=P, cycle_spin=False)
    flux = jnp.asarray(flux_image)
    key = jax.random.PRNGKey(2)

    with config.force_pallas("interpret"):
        # capability probe: fused would dispatch here, and it has no
        # JVP rule — second_order_ok must say so (and flip back once
        # the fused kernel is off)
        assert prior._fused_ok(flux.shape)
        assert not prior.second_order_ok(flux.shape)
        with config.force_fused("off"):
            assert prior.second_order_ok(flux.shape)

        def f(x):
            return prior(x, key=key)

        with pytest.raises((TypeError, NotImplementedError)):
            jax.jvp(jax.grad(f), (flux,), (jnp.ones_like(flux),))

        rs = np.random.RandomState(3)
        datasets = {"obs": point_source_gauss_psf(shape=(H, W),
                                                  random_state=rs)}
        components = FluxComponents()
        components["flux"] = SpatialFluxComponent.from_numpy(
            flux=np.asarray(flux_image, np.float64), prior=prior,
        )
        total = TotalLoss(
            poisson_loss=PoissonLoss.from_datasets(
                datasets=datasets, components=components
            ),
            prior_loss=PriorLoss(priors=components.priors),
        )
        fluxes = components.to_flux_tuple()
        hvp_fallback = total.hessian_diagonals(fluxes, key=key)
        with config.force_fused("off"):
            hvp_direct = total.hessian_diagonals(fluxes, key=key)

    for hf, hd in zip(hvp_fallback, hvp_direct):
        hf, hd = np.asarray(hf), np.asarray(hd)
        scale = np.abs(hd).max()
        assert_allclose(hf / scale, hd / scale, atol=2e-4)


def test_fused_marginalise_hessian_falls_back_to_scan(gmm, flux_image):
    """Marginalise + fused needs TWO fallback hops: custom_vjp
    TypeError (fused) then NotImplementedError (patch-kernel marg JVP)
    before landing on the differentiable XLA scan scorer."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.data import point_source_gauss_psf
    from jolideco_tpu.loss import PoissonLoss, PriorLoss, TotalLoss

    prior = GMMPatchPrior(gmm=gmm, stride=P, cycle_spin=False,
                          marginalize=True)
    key = jax.random.PRNGKey(5)
    rs = np.random.RandomState(6)
    datasets = {"obs": point_source_gauss_psf(shape=(H, W),
                                              random_state=rs)}
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.asarray(flux_image, np.float64), prior=prior,
    )
    total = TotalLoss(
        poisson_loss=PoissonLoss.from_datasets(
            datasets=datasets, components=components
        ),
        prior_loss=PriorLoss(priors=components.priors),
    )
    fluxes = components.to_flux_tuple()

    with config.force_pallas("interpret"):
        assert prior._fused_ok(
            jnp.asarray(flux_image).shape
        )
        hvp_fallback = total.hessian_diagonals(fluxes, key=key)
        with config.force_pallas("off"):
            hvp_scan = total.hessian_diagonals(fluxes, key=key)

    for hf, hs in zip(hvp_fallback, hvp_scan):
        hf, hs = np.asarray(hf), np.asarray(hs)
        scale = np.abs(hs).max()
        assert_allclose(hf / scale, hs / scale, atol=2e-4)
