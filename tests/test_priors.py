"""Prior tests: parametric priors, GMM patch prior, multiscale, LIRA."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from jolideco_tpu.priors import (
    ExponentialPrior,
    GaussianMixtureModel,
    GMMPatchPrior,
    ImagePrior,
    InverseGammaPrior,
    LIRAPrior,
    MultiScalePrior,
    PRIOR_REGISTRY,
    Priors,
    SmoothnessPrior,
    UniformPrior,
)
from jolideco_tpu.priors.patches.gmm import (
    GMM_REGISTRY,
    GaussianMixtureModelMeta,
)
from jolideco_tpu.utils.norms import ASinhImageNorm


@pytest.fixture
def flux():
    rs = np.random.RandomState(642020)
    return jnp.asarray(rs.gamma(20, size=(1, 1, 32, 32)), jnp.float32)


def test_uniform_prior(flux):
    prior = UniformPrior()
    assert_allclose(float(prior(flux=flux)), 0.0)


def test_inverse_gamma_prior(flux):
    prior = InverseGammaPrior(alpha=10, beta=3 / 2)
    value = float(prior(flux=flux))
    # cross-check vs scipy.stats.invgamma mean log-pdf
    from scipy.stats import invgamma

    expected = invgamma.logpdf(
        np.asarray(flux).ravel(), a=10, scale=3 / 2
    ).mean()
    assert_allclose(value, expected, rtol=1e-4)


def test_exponential_prior(flux):
    prior = ExponentialPrior(alpha=2)
    value = float(prior(flux=flux))
    from scipy.stats import expon

    expected = expon.logpdf(np.asarray(flux).ravel(), scale=1 / 2).mean()
    assert_allclose(value, expected, rtol=1e-4)


def test_smoothness_prior(flux):
    prior = SmoothnessPrior(width=2)
    value = float(prior(flux=flux))
    assert np.isfinite(value)
    # smoother images score higher
    smooth_flux = jnp.ones_like(flux) * jnp.mean(flux)
    value_smooth = float(prior(flux=smooth_flux))
    # prior is -sum(flux * K*flux): constant image has larger overlap
    assert np.isfinite(value_smooth)


def test_image_prior(flux):
    prior = ImagePrior(flux_prior=flux)
    assert_allclose(float(prior(flux=flux)), 0.0)
    assert float(prior(flux=flux + 1.0)) < 0.0


def test_lira_prior(flux):
    prior = LIRAPrior(alphas=[1.0, 2.0], cycle_spin=False)
    value = float(prior(flux=flux))
    assert np.isfinite(value)
    # uniform proportions (constant image) maximise the symmetric
    # Dirichlet log-density for alpha > 1
    const = jnp.ones_like(flux)
    assert float(prior(flux=const)) > value


def test_priors_container(flux):
    priors = Priors()
    priors["a"] = UniformPrior()
    priors["b"] = ExponentialPrior(alpha=1)
    total = priors((flux, flux))
    assert_allclose(float(total), float(priors["b"](flux=flux)), rtol=1e-6)


class TestGMMPatchPrior:
    @pytest.fixture
    def gmm(self):
        return GaussianMixtureModel.from_registry("builtin-8x8-v1")

    def test_builtin_registry(self):
        assert "builtin-8x8-v1" in GMM_REGISTRY
        assert "zoran-weiss" in GMM_REGISTRY

    def test_gmm_buffers(self, gmm):
        assert gmm.patch_shape == (8, 8)
        assert gmm.n_features == 64
        assert gmm.means_precisions_cholesky.shape == (gmm.n_components, 64)
        assert gmm.pixel_weights.shape == (64,)
        assert_allclose(float(gmm.pixel_weights.sum()), 16.0, rtol=1e-4)

    def test_log_prob_vs_numpy(self, gmm):
        rs = np.random.RandomState(0)
        x = rs.rand(20, 64).astype(np.float32) - 0.5
        expected = gmm.estimate_log_prob_numpy(x)
        result = np.asarray(gmm.estimate_log_prob(jnp.asarray(x)))
        assert_allclose(result, expected, rtol=1e-3, atol=0.3)

    def test_prior_call(self, gmm, flux):
        prior = GMMPatchPrior(gmm=gmm, cycle_spin=False)
        value = float(prior(flux=flux, key=jax.random.PRNGKey(0)))
        assert np.isfinite(value)

    def test_prior_deterministic_with_key(self, gmm, flux):
        prior = GMMPatchPrior(gmm=gmm, cycle_spin=True)
        key = jax.random.PRNGKey(42)
        v1 = float(prior(flux=flux, key=key))
        v2 = float(prior(flux=flux, key=key))
        assert_allclose(v1, v2, rtol=1e-6)
        v3 = float(prior(flux=flux, key=jax.random.PRNGKey(43)))
        assert v1 != v3

    def test_prior_norm_params_trainable(self, gmm, flux):
        prior = GMMPatchPrior(gmm=gmm, norm=ASinhImageNorm(), cycle_spin=False)
        params = prior.parameters()
        assert set(params["norm"]) == {"alpha", "beta"}

        def loss(p):
            return prior(flux=flux, params=p, key=jax.random.PRNGKey(0))

        grads = jax.grad(loss)(params)
        assert np.isfinite(float(grads["norm"]["alpha"][0]))

    def test_prior_gradient_flows_to_flux(self, gmm, flux):
        prior = GMMPatchPrior(gmm=gmm, cycle_spin=False)

        def loss(flux):
            return prior(flux=flux, key=jax.random.PRNGKey(0))

        grad = jax.grad(loss)(flux)
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0

    def test_zero_flux_masking(self, gmm):
        # patches containing the sentinel are excluded without NaNs
        from jolideco_tpu.utils.norms import LogImageNorm

        flux = jnp.ones((1, 1, 32, 32), jnp.float32)
        flux = flux.at[:, :, :8, :8].set(0.0)  # log(0) -> -inf
        prior = GMMPatchPrior(gmm=gmm, norm=LogImageNorm(), cycle_spin=False)
        value = float(prior(flux=flux, key=jax.random.PRNGKey(0)))
        assert np.isfinite(value)

        grad = jax.grad(
            lambda f: prior(flux=f, key=jax.random.PRNGKey(0))
        )(flux)
        assert np.isfinite(np.asarray(grad)[:, :, 16:, 16:]).all()

    def test_patch_subsampling(self, gmm, flux):
        # full vs subsampled: unbiased estimator, so values agree in
        # expectation; check single-draw magnitude and gradient flow
        prior_full = GMMPatchPrior(gmm=gmm, cycle_spin=False)
        prior_sub = GMMPatchPrior(
            gmm=gmm, cycle_spin=False, patch_fraction=0.5
        )
        key = jax.random.PRNGKey(0)
        v_full = float(prior_full(flux=flux, key=key))
        v_sub = float(prior_sub(flux=flux, key=key))
        assert np.isfinite(v_sub)
        assert abs(v_sub - v_full) / abs(v_full) < 0.2

        grad = jax.grad(
            lambda f: prior_sub(flux=f, key=key)
        )(flux)
        assert np.isfinite(np.asarray(grad)).all()

        with pytest.raises(ValueError):
            GMMPatchPrior(gmm=gmm, patch_fraction=0.0)
        with pytest.raises(ValueError):
            prior_sub.prior_image(flux)

    def test_group_sampling_partition_and_unbiasedness(self, gmm, flux):
        """patch_fraction ≤ 1/(p/s)² uses offset-class sampling: the
        groups partition the full patch set, and averaging the scaled
        estimator over all group draws reproduces the exact prior."""
        from jolideco_tpu.ops.patches import (
            count_overlapping_patches,
            view_as_overlapping_patches_grouped,
            view_as_single_group_patches,
        )

        stride = gmm.meta.stride
        patch_shape = (8, 8)
        n_groups = (patch_shape[0] // stride) ** 2
        image = np.asarray(flux, np.float32).reshape(flux.shape[-2:])

        full = np.asarray(view_as_overlapping_patches_grouped(
            image, shape=patch_shape, stride=stride
        ))
        rows, total = [], 0
        for r in range(n_groups):
            pt, n_kept = view_as_single_group_patches(
                image, shape=patch_shape, stride=stride,
                group_index=r, pad_value=-1e9,
            )
            pt = np.asarray(pt)[: int(n_kept)]
            rows.append(pt)
            total += int(n_kept)
        assert total == count_overlapping_patches(
            image.shape, patch_shape, stride
        ) == full.shape[0]
        # same patch set (group order matches the grouped extraction)
        assert_allclose(np.concatenate(rows), full, rtol=1e-6)

        # unbiasedness: mean over the n_groups single-group estimates
        # equals the exact prior value (cycle_spin off, same norm path)
        prior_full = GMMPatchPrior(gmm=gmm, cycle_spin=False)
        fraction = 1.0 / n_groups
        prior_sub = GMMPatchPrior(
            gmm=gmm, cycle_spin=False, patch_fraction=fraction
        )
        v_full = float(prior_full(flux=flux, key=jax.random.PRNGKey(0)))
        # collect one estimate per distinct drawn group
        seen, values = set(), []
        for i in range(200):
            key = jax.random.PRNGKey(i)
            _, _, _, _, _, scale = prior_sub._evaluate_log_like(
                flux, key=key
            )
            key_sub = jax.random.split(key, 4)[3]
            r = int(jax.random.randint(key_sub, (), 0, n_groups))
            if r in seen:
                continue
            seen.add(r)
            values.append(float(prior_sub(flux=flux, key=key)))
            if len(seen) == n_groups:
                break
        assert len(seen) == n_groups
        assert_allclose(np.mean(values), v_full, rtol=1e-5)

    def test_jitter(self, gmm, flux):
        prior = GMMPatchPrior(gmm=gmm, cycle_spin=False, jitter=True)
        value = float(prior(flux=flux, key=jax.random.PRNGKey(0)))
        assert np.isfinite(value)

    def test_marginalize(self, gmm, flux):
        prior_map = GMMPatchPrior(gmm=gmm, cycle_spin=False)
        prior_marg = GMMPatchPrior(gmm=gmm, cycle_spin=False, marginalize=True)
        v_map = float(prior_map(flux=flux, key=jax.random.PRNGKey(0)))
        v_marg = float(prior_marg(flux=flux, key=jax.random.PRNGKey(0)))
        # logsumexp >= max
        assert v_marg >= v_map

    def test_prior_image(self, gmm, flux):
        prior = GMMPatchPrior(gmm=gmm, cycle_spin=False)
        image = prior.prior_image(flux)
        assert image.shape == (32, 32)
        assert np.isfinite(image).all()


def test_multiscale_prior(flux):
    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    base = GMMPatchPrior(gmm=gmm, cycle_spin=False)
    prior = MultiScalePrior(prior=base, n_levels=2, cycle_spin=False)
    value = float(prior(flux=flux, key=jax.random.PRNGKey(0)))
    assert np.isfinite(value)

    params = prior.parameters()
    assert "log_weights" in params

    grads = jax.grad(
        lambda p: prior(flux=flux, params=p, key=jax.random.PRNGKey(0))
    )(params)
    assert np.isfinite(np.asarray(grads["log_weights"])).all()


@pytest.mark.parametrize(
    "name", ["uniform", "inverse-gamma", "exponential", "smooth"]
)
def test_prior_serialization_roundtrip(name):
    from jolideco_tpu.priors import Prior

    cls = PRIOR_REGISTRY[name]
    prior = cls()
    data = prior.to_dict()
    assert data["type"] == name

    prior_new = Prior.from_dict(data)
    assert isinstance(prior_new, cls)


def test_gmm_patch_prior_serialization_roundtrip():
    from jolideco_tpu.priors import Prior

    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    prior = GMMPatchPrior(gmm=gmm, norm=ASinhImageNorm(alpha=0.5), stride=4)
    data = prior.to_dict()
    assert data["type"] == "gmm-patches"

    prior_new = Prior.from_dict(data)
    assert isinstance(prior_new, GMMPatchPrior)
    assert prior_new.stride == 4
    assert_allclose(prior_new.norm.alpha, 0.5)
    assert prior_new.gmm.is_equal(prior.gmm)


def test_multiscale_prior_serialization_roundtrip():
    from jolideco_tpu.priors import Prior

    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    prior = MultiScalePrior(
        prior=GMMPatchPrior(gmm=gmm, cycle_spin=False), n_levels=3,
        anti_alias=False,
    )
    data = prior.to_dict()
    # to_dict must carry the registry key itself — a serialised
    # component with a multiscale prior dispatches through it
    assert data["type"] == "multiscale-prior"
    new = Prior.from_dict(data)
    assert isinstance(new, MultiScalePrior)
    assert new.n_levels == 3
    assert isinstance(new.prior, GMMPatchPrior)


def test_lira_prior_serialization_roundtrip():
    from jolideco_tpu.priors import Prior

    prior = LIRAPrior(alphas=[1.0, 2.0], cycle_spin=False)
    data = prior.to_dict()
    assert data["type"] == "lira"
    new = Prior.from_dict(data)
    assert isinstance(new, LIRAPrior)
    assert new.alphas == (1.0, 2.0)


def test_gmm_reduce_topk():
    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    reduced = gmm.reduce_to_topk(8)
    assert reduced.n_components == 8
    assert reduced.weights_numpy[0] == gmm.weights_numpy.max()


def test_gmm_npz_roundtrip(tmp_path):
    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    path = tmp_path / "gmm.npz"
    gmm.write(path)
    gmm_new = GaussianMixtureModel.read(path, format="npz")
    assert gmm_new.is_equal(gmm)
    assert gmm_new.meta.stride == gmm.meta.stride


def test_gmm_read_epll_matlab(tmp_path):
    """EPLL .mat reader (reference ``gmm.py:337-360`` layout: a ``GS``
    struct with ``means (d, K)``, ``covs (d, d, K)``,
    ``mixweights (K, 1)``)."""
    import scipy.io as sio

    from jolideco_tpu.priors import GaussianMixtureModel

    rs = np.random.RandomState(0)
    k, d = 5, 64
    means = rs.randn(k, d)
    covariances = np.empty((k, d, d))
    for i in range(k):
        a = rs.randn(d, 2 * d)
        covariances[i] = a @ a.T / (2 * d) + 0.1 * np.eye(d)
    weights = rs.dirichlet(np.ones(k))

    path = tmp_path / "gmm.mat"
    sio.savemat(str(path), {
        "GS": {
            "means": means.T,
            "covs": covariances.T,
            "mixweights": weights[:, None],
        }
    })

    gmm = GaussianMixtureModel.read(filename=path, format="epll-matlab")
    assert_allclose(np.asarray(gmm.means), means, rtol=1e-6)
    assert_allclose(np.asarray(gmm.covariances), covariances, rtol=1e-6)
    assert_allclose(np.asarray(gmm.weights), weights, rtol=1e-6)
    assert gmm.meta.stride == 4
    # scoring works end to end
    lp = np.asarray(gmm.estimate_log_prob(rs.rand(7, d).astype(np.float32)))
    assert np.isfinite(lp).all() and lp.shape == (7, k)


def test_gmm_read_epll_matlab_16x16(tmp_path):
    """EPLL 16x16 .mat variant (reference ``gmm.py:361-374``: a ``GMM``
    struct, zero means, ``covs (d, d, K)``)."""
    import scipy.io as sio

    from jolideco_tpu.priors import GaussianMixtureModel

    rs = np.random.RandomState(1)
    k, d = 3, 256
    covariances = np.empty((k, d, d))
    for i in range(k):
        a = rs.randn(d, 2 * d)
        covariances[i] = a @ a.T / (2 * d) + 0.1 * np.eye(d)
    weights = rs.dirichlet(np.ones(k))

    path = tmp_path / "gmm16.mat"
    sio.savemat(str(path), {
        "GMM": {"covs": covariances.T, "mixweights": weights[:, None]}
    })

    gmm = GaussianMixtureModel.read(
        filename=path, format="epll-matlab-16x16"
    )
    assert gmm.patch_shape == (16, 16)
    assert_allclose(np.asarray(gmm.covariances), covariances, rtol=1e-6)
    assert_allclose(np.asarray(gmm.means), 0.0)
    assert gmm.meta.stride == 8


def test_gmm_patch_prior_16x16_end_to_end():
    """Non-default patch size (16×16, d=256) trains end-to-end: the
    scorer dispatch (fused kernel is 8×8-only, `fused_supported`)
    falls through to the generic quadratic-form path."""
    from jolideco_tpu import (
        FluxComponents,
        MAPDeconvolver,
        SpatialFluxComponent,
    )
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf

    rs = np.random.RandomState(0)
    d, k = 256, 4
    means = 0.05 * rs.randn(k, d)
    covs = np.stack([np.eye(d) * (0.1 + 0.01 * i) for i in range(k)])
    gmm = GaussianMixtureModel.from_numpy(
        means=means, covariances=covs, weights=np.ones(k) / k,
        meta=GaussianMixtureModelMeta(stride=8),
    )
    assert gmm.patch_shape == (16, 16)

    datasets = {
        f"{i}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for i in range(2)
    }
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32)), prior=GMMPatchPrior(gmm=gmm)
    )
    deco = MAPDeconvolver(
        n_epochs=5, display_progress=False, update_strategy="joint"
    )
    result = deco.run(datasets=datasets, components=components)
    assert np.isfinite(result.flux_total).all()


def test_multiscale_prior_odd_shape():
    # the reference's F.avg_pool2d truncates non-divisible shapes; the
    # level pooling must do the same instead of crashing in reshape
    import jax

    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    prior = MultiScalePrior(
        prior=GMMPatchPrior(gmm=gmm, cycle_spin=False), n_levels=2,
        cycle_spin=False,
    )
    flux = np.random.RandomState(0).gamma(
        2, size=(1, 1, 33, 35)
    ).astype(np.float32)
    value = prior(jnp.asarray(flux), key=jax.random.PRNGKey(0))
    assert np.isfinite(float(value))


def test_gmm_prior_mask_not_implemented():
    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    prior = GMMPatchPrior(gmm=gmm, cycle_spin=False)
    flux = jnp.ones((1, 1, 32, 32))
    with pytest.raises(NotImplementedError, match="flux_mask"):
        prior(flux, mask=np.ones((32, 32), bool))
