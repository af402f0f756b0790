"""Coverage for less-travelled paths: psf_scale, marginalise e2e,
trace cadence, io errors, registry env merging."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    NPredCalibration,
    NPredCalibrations,
    NPredModel,
    SpatialFluxComponent,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
from jolideco_tpu.priors import GaussianMixtureModel
from jolideco_tpu.utils.kernels import gaussian_kernel_2d


def test_npred_model_psf_scale_rescale_path():
    """psf_scale != 1 re-transforms the rescaled PSF inside the trace."""
    import jax

    exposure = np.ones((24, 24), np.float32)
    psf = gaussian_kernel_2d(2, x_size=9, y_size=9).astype(np.float32)
    model = NPredModel.from_numpy(
        exposure=exposure, psf=psf, upsampling_factor=None
    )

    flux = np.zeros((1, 1, 24, 24), np.float32)
    flux[0, 0, 12, 12] = 1.0

    out1 = np.asarray(model(jnp.asarray(flux), psf_scale=1.0))
    out_wide = np.asarray(
        jax.jit(lambda f: model(f, psf_scale=1.5))(jnp.asarray(flux))
    )
    # grid_sample-style zoom: the PSF image magnifies without
    # renormalisation (reference semantics, npred.py:178 +
    # utils/torch.py:172-193) — total grows, profile broadens
    assert out_wide.sum() > out1.sum()
    ys = np.arange(24) - 12.0
    var1 = (out1[0, 0] * ys[:, None] ** 2).sum() / out1.sum()
    var_wide = (out_wide[0, 0] * ys[:, None] ** 2).sum() / out_wide.sum()
    assert var_wide > var1


def test_training_with_psf_scale_calibration():
    rs = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=rs)

    calibrations = NPredCalibrations()
    calibrations["obs"] = NPredCalibration(psf_scale=1.2)

    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    deco = MAPDeconvolver(n_epochs=3, learning_rate=0.1,
                          display_progress=False)
    result = deco.run(
        datasets={"obs": dataset}, components=components,
        calibrations=calibrations,
    )
    assert np.isfinite(result.trace_loss[-1]["total"])
    assert result.calibrations["obs"].psf_scale == 1.2


def test_marginalize_gmm_e2e():
    from jolideco_tpu.priors import GMMPatchPrior, GaussianMixtureModel

    rs = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=rs)

    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32)),
        prior=GMMPatchPrior(
            gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
            marginalize=True,
        ),
    )
    deco = MAPDeconvolver(n_epochs=3, learning_rate=0.1,
                          display_progress=False)
    result = deco.run(datasets={"obs": dataset}, components=components)
    assert np.isfinite(result.trace_loss[-1]["total"])


def test_trace_every_multiple():
    rs = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=rs)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    deco = MAPDeconvolver(
        n_epochs=10, learning_rate=0.1, display_progress=False,
        trace_every=5,
    )
    result = deco.run(datasets={"obs": dataset}, components=components)
    assert len(result.trace_loss) == 2


def test_io_format_errors(tmp_path):
    from jolideco_tpu.utils.io import (
        IO_FORMATS_MAP_RESULT_READ,
        get_reader,
        guess_format_from_filename,
    )

    with pytest.raises(ValueError):
        guess_format_from_filename("result.unknown")

    with pytest.raises(ValueError):
        get_reader("x.fits", "nope", IO_FORMATS_MAP_RESULT_READ)


def test_unknown_optimizer():
    with pytest.raises(ValueError):
        MAPDeconvolver(optimizer_type="momentum")


def test_bad_update_strategy():
    with pytest.raises(ValueError):
        MAPDeconvolver(update_strategy="pipelined")


def test_gmm_registry_env_merge(tmp_path, monkeypatch):
    import json

    from jolideco_tpu.priors.patches.gmm import GMM_REGISTRY, get_gmm_registry

    index = {"custom-gmm": {"filename": "/nonexistent.npz", "format": "npz"}}
    (tmp_path / "jolideco-gmm-library-index.json").write_text(
        json.dumps(index)
    )
    monkeypatch.setenv("JOLIDECO_GMM_LIBRARY", str(tmp_path))

    registry = get_gmm_registry()
    assert "custom-gmm" in registry
    assert "builtin-8x8-v1" in registry

    # the module-level lazy registry can be refreshed
    GMM_REGISTRY.refresh()
    assert "custom-gmm" in GMM_REGISTRY
    monkeypatch.delenv("JOLIDECO_GMM_LIBRARY")
    GMM_REGISTRY.refresh()
    assert "custom-gmm" not in GMM_REGISTRY


@pytest.fixture
def clean_gmm_registry():
    """Refresh the lazy GMM registry after env-var manipulation, even
    when the test body fails mid-way."""
    from jolideco_tpu.priors.patches.gmm import GMM_REGISTRY

    yield GMM_REGISTRY
    GMM_REGISTRY.refresh()


def test_gmm_alias_substitution_warns(
    caplog, monkeypatch, clean_gmm_registry
):
    """Reference library names resolve to a shipped substitute when the
    external jolideco-gmm-prior-library isn't installed — loudly, so
    users know their numbers differ from the actual library model."""
    import logging

    monkeypatch.delenv("JOLIDECO_GMM_LIBRARY", raising=False)
    clean_gmm_registry.refresh()

    with caplog.at_level(logging.WARNING, "jolideco_tpu.priors.patches.gmm"):
        gmm = GaussianMixtureModel.from_registry("zoran-weiss")
    assert gmm.means.shape[-1] == 64
    messages = [r.message for r in caplog.records]
    assert any(
        "zoran-weiss" in m and "substituting" in m for m in messages
    ), messages

    # shipped models resolve silently
    caplog.clear()
    with caplog.at_level(logging.WARNING, "jolideco_tpu.priors.patches.gmm"):
        GaussianMixtureModel.from_registry("builtin-8x8-v1")
    assert not caplog.records


def test_gmm_external_library_round_trip(
    tmp_path, monkeypatch, caplog, clean_gmm_registry
):
    """A real external-library directory (index JSON + model file, the
    reference's $JOLIDECO_GMM_LIBRARY layout) overrides the alias
    substitution: the model reads through the index with no warning and
    returns the library's arrays."""
    import json
    import logging

    rs = np.random.RandomState(7)
    k, d = 3, 64
    means = rs.normal(size=(k, d)).astype(np.float32)
    eye = np.eye(d, dtype=np.float32)
    covariances = np.stack([eye * (i + 1.0) for i in range(k)])
    weights = np.full(k, 1.0 / k, dtype=np.float32)
    np.savez(
        tmp_path / "gmm-zoran-weiss.npz",
        means=means,
        covariances=covariances,
        weights=weights,
    )
    index = {
        "zoran-weiss": {
            "filename": str(tmp_path / "gmm-zoran-weiss.npz"),
            "format": "npz",
        }
    }
    (tmp_path / "jolideco-gmm-library-index.json").write_text(
        json.dumps(index)
    )
    monkeypatch.setenv("JOLIDECO_GMM_LIBRARY", str(tmp_path))
    clean_gmm_registry.refresh()

    with caplog.at_level(logging.WARNING, "jolideco_tpu.priors.patches.gmm"):
        gmm = GaussianMixtureModel.from_registry("zoran-weiss")
    assert not caplog.records  # library model: no substitution warning
    assert_allclose(np.asarray(gmm.means), means, rtol=1e-6)
    assert_allclose(np.asarray(gmm.weights), weights, rtol=1e-6)
    assert gmm.covariances.shape == (k, d, d)


def test_overwrite_protection(tmp_path):
    rs = np.random.RandomState(0)
    component = SpatialFluxComponent.from_numpy(flux=np.ones((8, 8)))
    path = tmp_path / "c.asdf"
    component.write(path)
    with pytest.raises(OSError):
        component.write(path, overwrite=False)
    component.write(path, overwrite=True)


def test_data_generators_non_square_shapes():
    """Rectangular shape/shape_psf produce correctly-shaped datasets
    (the reference crashes or silently squares the PSF for these —
    reference data/core.py:58,112,117); square outputs are unchanged."""
    from jolideco_tpu.data import (
        disk_source_gauss_psf,
        gauss_and_point_sources_gauss_psf,
        point_source_gauss_psf,
    )

    rs = np.random.RandomState(0)
    d = point_source_gauss_psf(
        shape=(32, 48), shape_psf=(9, 17), random_state=rs
    )
    assert d["counts"].shape == (32, 48)
    assert d["psf"].shape == (9, 17)

    d = disk_source_gauss_psf(
        shape=(32, 48), shape_psf=(9, 17), random_state=rs
    )
    assert d["counts"].shape == (32, 48)
    assert d["exposure"].shape == (32, 48)
    assert d["psf"].shape == (9, 17)

    d = gauss_and_point_sources_gauss_psf(
        shape=(48, 32), shape_psf=(17, 9), random_state=rs
    )
    assert d["counts"].shape == (48, 32)
    assert d["psf"].shape == (17, 9)
