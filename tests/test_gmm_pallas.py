"""Pallas GMM kernel correctness vs the XLA scan (interpret mode)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from jolideco_tpu.ops.gmm_pallas import (
    gmm_score_pallas,
    pack_gmm_buffers,
    pallas_supported,
)
from jolideco_tpu.priors import GaussianMixtureModel


@pytest.fixture(scope="module")
def gmm():
    return GaussianMixtureModel.from_registry("builtin-8x8-v1")


@pytest.fixture(scope="module")
def patches(gmm):
    rs = np.random.RandomState(0)
    x = rs.rand(500, 64).astype(np.float32) - 0.5
    x -= x.mean(axis=1, keepdims=True)
    return jnp.asarray(x)


def _pallas_args(gmm):
    return (
        gmm.packed,
        gmm.means_precisions_cholesky,
        gmm.precisions_cholesky,
        gmm.pixel_weights,
    )


def test_supported(gmm):
    assert pallas_supported(gmm.n_features, gmm.n_components)
    assert gmm.packed is not None


def test_forward_matches_scan(gmm, patches):
    values_ref, argmax_ref = gmm.score(patches)  # XLA scan on CPU (auto)
    values, argmax = gmm_score_pallas(
        patches, *_pallas_args(gmm), True
    )
    assert_allclose(np.asarray(values), np.asarray(values_ref), rtol=1e-4,
                    atol=1e-4)
    assert (np.asarray(argmax) == np.asarray(argmax_ref)).all()


def test_forward_padded_k(patches):
    """K not a multiple of the component block size."""
    rs = np.random.RandomState(1)
    k, d = 13, 64
    from sklearn.datasets import make_spd_matrix

    means = rs.rand(k, d)
    covariances = np.stack(
        [make_spd_matrix(d, random_state=i) for i in range(k)]
    )
    weights = rs.dirichlet(np.ones(k))
    gmm = GaussianMixtureModel.from_numpy(
        means=means, covariances=covariances, weights=weights
    )

    values_ref, argmax_ref = gmm.score(patches)
    values, argmax = gmm_score_pallas(
        patches, *_pallas_args(gmm), True
    )
    assert_allclose(np.asarray(values), np.asarray(values_ref), rtol=1e-4,
                    atol=1e-4)
    assert (np.asarray(argmax) == np.asarray(argmax_ref)).all()


def test_forward_ragged_n(gmm):
    """N not a multiple of the tile size (padding path)."""
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(77, 64).astype(np.float32) - 0.5)
    values_ref, _ = gmm.score(x)
    values, _ = gmm_score_pallas(x, *_pallas_args(gmm), True)
    assert values.shape == (77,)
    assert_allclose(np.asarray(values), np.asarray(values_ref), rtol=1e-4,
                    atol=1e-4)


def test_marginalize_forward_matches_scan(gmm, patches):
    from jolideco_tpu.ops.gmm_score import gmm_score

    values_ref, _ = gmm_score(
        patches,
        gmm.means_precisions_cholesky,
        gmm.precisions_cholesky,
        gmm.log_det_cholesky,
        gmm.log_weights,
        gmm.pixel_weights,
        marginalize=True,
    )
    values, _ = gmm_score_pallas(
        patches, *_pallas_args(gmm), True,
        marginalize=True,
    )
    assert_allclose(np.asarray(values), np.asarray(values_ref), rtol=1e-4,
                    atol=1e-4)


def test_marginalize_gradient_matches_scan(patches):
    # use a moderately-conditioned GMM: the built-in model's logits are
    # O(1e5), where f32 softmax weights of near-tied components are
    # intrinsically ill-conditioned (~1e-2 gradient spread between any
    # two correct implementations)
    from sklearn.datasets import make_spd_matrix

    from jolideco_tpu.ops.gmm_score import gmm_score

    rs = np.random.RandomState(3)
    k, d = 16, 64
    gmm = GaussianMixtureModel.from_numpy(
        means=rs.rand(k, d),
        covariances=np.stack(
            [make_spd_matrix(d, random_state=i) for i in range(k)]
        ),
        weights=rs.dirichlet(np.ones(k)),
    )

    def loss_pallas(x):
        values, _ = gmm_score_pallas(
            x, *_pallas_args(gmm), True, marginalize=True
        )
        return jnp.sum(values)

    def loss_scan(x):
        values, _ = gmm_score(
            x,
            gmm.means_precisions_cholesky,
            gmm.precisions_cholesky,
            gmm.log_det_cholesky,
            gmm.log_weights,
            gmm.pixel_weights,
            marginalize=True,
        )
        return jnp.sum(values)

    g_pallas = np.asarray(jax.grad(loss_pallas)(patches))
    g_scan = np.asarray(jax.grad(loss_scan)(patches))
    scale = np.abs(g_scan).max()
    assert_allclose(g_pallas / scale, g_scan / scale, atol=1e-4)


def test_marginalize_gradient_builtin_gmm_loose(gmm, patches):
    """Built-in GMM: agreement within the f32 softmax conditioning."""
    from jolideco_tpu.ops.gmm_score import gmm_score

    g_pallas = np.asarray(jax.grad(
        lambda x: gmm_score_pallas(
            x, *_pallas_args(gmm), True, marginalize=True
        )[0].sum()
    )(patches))
    g_scan = np.asarray(jax.grad(
        lambda x: gmm_score(
            x,
            gmm.means_precisions_cholesky,
            gmm.precisions_cholesky,
            gmm.log_det_cholesky,
            gmm.log_weights,
            gmm.pixel_weights,
            marginalize=True,
        )[0].sum()
    )(patches))
    scale = np.abs(g_scan).max()
    assert_allclose(g_pallas / scale, g_scan / scale, atol=3e-2)


def test_gradient_matches_scan(gmm, patches):
    def loss_pallas(x):
        values, _ = gmm_score_pallas(x, *_pallas_args(gmm), True)
        return jnp.sum(values)

    def loss_scan(x):
        values, _ = gmm.score(x)
        return jnp.sum(values)

    g_pallas = np.asarray(jax.grad(loss_pallas)(patches))
    g_scan = np.asarray(jax.grad(loss_scan)(patches))
    # gradients of the builtin GMM are O(1e5); compare relatively
    scale = np.abs(g_scan).max()
    assert_allclose(g_pallas / scale, g_scan / scale, atol=1e-4)


def test_pack_layout(gmm):
    packed = pack_gmm_buffers(
        np.asarray(gmm.means_precisions_cholesky),
        np.asarray(gmm.precisions_cholesky),
        np.asarray(gmm.log_det_cholesky),
        np.asarray(gmm.log_weights),
        np.asarray(gmm.pixel_weights),
    )
    k, d = gmm.n_components, gmm.n_features
    from jolideco_tpu.ops.gmm_pallas import K_ALIGN

    k_pad = -(-k // K_ALIGN) * K_ALIGN
    assert packed["aq"].shape == (d * d, k_pad)
    assert packed["bq"].shape == (d, k_pad)
    assert packed["const2"].shape == (1, k_pad)
    # A_0 = L_0 W L_0^T round-trips through the packed layout
    w = np.asarray(gmm.pixel_weights, np.float64)
    prec0 = np.asarray(gmm.precisions_cholesky[0], np.float64)
    a0 = prec0 @ np.diag(w) @ prec0.T
    assert_allclose(
        np.asarray(packed["aq"][:, 0]).reshape(d, d), a0, rtol=1e-5,
        atol=1e-7,
    )
    # padded components never win: -inf constants
    assert np.all(np.isneginf(np.asarray(packed["const2"][0, k:])))
    # hi/lo splits recompose to f32 A (~2^-17 relative)
    aq = np.asarray(packed["aq"])
    assert_allclose(
        np.asarray(packed["aq_hi"], np.float32)
        + np.asarray(packed["aq_lo"], np.float32),
        aq,
        atol=np.abs(aq).max() * 1e-4,
    )


def test_hvp_matches_scan(gmm, patches):
    """Forward-over-reverse (the Hessian-diagonal probe) through the
    Pallas scorer matches the XLA scan scorer — VERDICT r2 item 2: the
    second-order path must not need the scan-scorer fallback."""
    ones = jnp.ones_like(patches)

    def loss_pallas(x):
        values, _ = gmm_score_pallas(x, *_pallas_args(gmm), True)
        return jnp.sum(values)

    def loss_scan(x):
        values, _ = gmm.score(x)  # XLA scan on CPU (auto)
        return jnp.sum(values)

    _, hvp_pallas = jax.jvp(jax.grad(loss_pallas), (patches,), (ones,))
    _, hvp_scan = jax.jvp(jax.grad(loss_scan), (patches,), (ones,))
    scale = np.abs(np.asarray(hvp_scan)).max()
    assert_allclose(
        np.asarray(hvp_pallas) / scale, np.asarray(hvp_scan) / scale,
        atol=1e-4,
    )


def test_hvp_marginalize_matches_scan(patches):
    """Forward-over-reverse through the marginalise (logsumexp) scorer
    runs on kernels and matches the XLA scan scorer: the HVP kernel
    recomputes the softmax and applies
    ``-sum_k p_k t A_k + sum_k dp_k (b_k - x A_k)``.

    Uses the moderately-conditioned SPD GMM (like the gradient test
    above): two correct f32 implementations of the built-in model's
    O(1e5) logits differ at the softmax-conditioning level."""
    from sklearn.datasets import make_spd_matrix

    from jolideco_tpu.ops.gmm_score import gmm_score

    rs = np.random.RandomState(3)
    k, d = 16, 64
    gmm = GaussianMixtureModel.from_numpy(
        means=rs.rand(k, d),
        covariances=np.stack(
            [make_spd_matrix(d, random_state=i) for i in range(k)]
        ),
        weights=rs.dirichlet(np.ones(k)),
    )
    ones = jnp.ones_like(patches)

    def loss_pallas(x):
        values, _ = gmm_score_pallas(
            x, *_pallas_args(gmm), True, marginalize=True
        )
        return jnp.sum(values)

    def loss_scan(x):
        values, _ = gmm_score(
            x,
            gmm.means_precisions_cholesky,
            gmm.precisions_cholesky,
            gmm.log_det_cholesky,
            gmm.log_weights,
            gmm.pixel_weights,
            marginalize=True,
        )
        return jnp.sum(values)

    _, hvp_pallas = jax.jvp(jax.grad(loss_pallas), (patches,), (ones,))
    _, hvp_scan = jax.jvp(jax.grad(loss_scan), (patches,), (ones,))
    scale = np.abs(np.asarray(hvp_scan)).max()
    assert_allclose(
        np.asarray(hvp_pallas) / scale, np.asarray(hvp_scan) / scale,
        atol=1e-4,
    )


def test_hvp_marginalize_builtin_vs_dense_f64(gmm, patches):
    """Built-in (ill-conditioned) GMM: the kernel HVP against the
    analytic Hessian action evaluated in numpy float64 —
    ``H t = -sum_k p_k A_k t + sum_k p_k (g_k - gbar) r_k`` with
    ``r_k = b_k - x A_k`` and ``g_k = r_k . t``. This pins the kernel
    to the exact mathematics rather than to another f32 softmax."""
    x = np.asarray(patches, np.float64)[:64]
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
    r = b_quad[None, :, :] - xa                     # (n, k, d)
    g = np.einsum("nkd,nd->nk", r, t)
    gbar = np.einsum("nk,nk->n", p, g)
    hvp_ref = (
        -np.einsum("nk,kdj,nj->nd", p, a_quad, t)
        + np.einsum("nk,nkd->nd", p * (g - gbar[:, None]), r)
    )

    def loss_pallas(xx):
        values, _ = gmm_score_pallas(
            xx, *_pallas_args(gmm), True, marginalize=True
        )
        return jnp.sum(values)

    xj = jnp.asarray(x, jnp.float32)
    _, hvp_pallas = jax.jvp(
        jax.grad(loss_pallas), (xj,), (jnp.asarray(t, jnp.float32),)
    )
    scale = np.abs(hvp_ref).max()
    assert_allclose(
        np.asarray(hvp_pallas) / scale, hvp_ref / scale, atol=1e-4,
    )


def test_hessian_diagonals_pallas_path(gmm):
    """End-to-end TotalLoss.hessian_diagonals with the Pallas scorer
    (interpret) agrees with the XLA scan scorer, for both MAP (kernel
    JVP) and marginalise (softmax-HVP kernel) GMM priors."""
    from jolideco_tpu import (
        FluxComponents,
        GMMPatchPrior,
        SpatialFluxComponent,
    )
    from jolideco_tpu.config import force_pallas
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.loss import PoissonLoss, PriorLoss, TotalLoss

    rs = np.random.RandomState(642020)
    datasets = {"obs": gauss_and_point_sources_gauss_psf(random_state=rs)}

    for marginalize in (False, True):
        components = FluxComponents()
        components["flux"] = SpatialFluxComponent.from_numpy(
            flux=rs.gamma(20, size=(32, 32)),
            prior=GMMPatchPrior(gmm=gmm, cycle_spin=False,
                                marginalize=marginalize),
        )
        total = TotalLoss(
            poisson_loss=PoissonLoss.from_datasets(
                datasets=datasets, components=components
            ),
            prior_loss=PriorLoss(priors=components.priors),
        )
        fluxes = components.to_flux_tuple()
        key = jax.random.PRNGKey(0)

        with force_pallas("interpret"):
            hvp_pallas = total.hessian_diagonals(fluxes, key=key)
        with force_pallas("off"):
            hvp_scan = total.hessian_diagonals(fluxes, key=key)

        for hp, hs in zip(hvp_pallas, hvp_scan):
            hp, hs = np.asarray(hp), np.asarray(hs)
            scale = np.abs(hs).max()
            assert_allclose(hp / scale, hs / scale, atol=2e-4,
                            err_msg=f"marginalize={marginalize}")


def test_hessian_diagonals_jitted_probe_no_key(gmm):
    """hessian_diagonals with key=None and a cycle-spin prior: the
    probe is jitted (eager op-by-op dispatch recompiles per probe and
    hit a backend op that only lowers inside a fused program on TPU),
    so the stateful Prior.next_key fallback must not leak a traced key
    out of the trace. Finite values and repeat-call stability cover
    both the leak and the fixed-key-within-trace semantics."""
    from jolideco_tpu import (
        FluxComponents,
        GMMPatchPrior,
        SpatialFluxComponent,
    )
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.loss import PoissonLoss, PriorLoss, TotalLoss

    rs = np.random.RandomState(642020)
    datasets = {"obs": gauss_and_point_sources_gauss_psf(random_state=rs)}
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32)),
        prior=GMMPatchPrior(gmm=gmm, cycle_spin=True),
    )
    total = TotalLoss(
        poisson_loss=PoissonLoss.from_datasets(
            datasets=datasets, components=components
        ),
        prior_loss=PriorLoss(priors=components.priors),
    )
    fluxes = components.to_flux_tuple()

    hvp = total.hessian_diagonals(fluxes, key=None)
    assert all(np.isfinite(np.asarray(h)).all() for h in hvp)
    errors = total.fluxes_error(fluxes=fluxes, key=None)
    assert np.isfinite(np.asarray(errors["flux"])).all()
