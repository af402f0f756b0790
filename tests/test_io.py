"""Serialization matrix tests (reference ``models/tests/test_core.py:125-216``
and ``tests/test_core.py:82-92,191-221``): every prior class x every
format round-trips components, sparse components, calibrations and full
results — via the package's native FITS/ASDF/YAML implementations.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    MAPDeconvolverResult,
    NPredCalibration,
    NPredCalibrations,
    SparseSpatialFluxComponent,
    SpatialFluxComponent,
)
from jolideco_tpu.priors import (
    ExponentialPrior,
    GMMPatchPrior,
    InverseGammaPrior,
    SmoothnessPrior,
    UniformPrior,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf

PRIOR_FACTORIES = {
    "uniform": UniformPrior,
    "inverse-gamma": InverseGammaPrior,
    "exponential": ExponentialPrior,
    "smooth": SmoothnessPrior,
    "gmm-patches": lambda: GMMPatchPrior(),
}


@pytest.mark.parametrize("prior_name", list(PRIOR_FACTORIES))
@pytest.mark.parametrize("format", ["fits", "yaml", "asdf"])
def test_flux_component_io(prior_name, format, tmp_path):
    flux_init = jnp.ones((1, 1, 32, 32))

    prior = PRIOR_FACTORIES[prior_name]()
    component = SpatialFluxComponent(
        flux_upsampled=flux_init,
        upsampling_factor=2,
        use_log_flux=False,
        frozen=True,
        prior=prior,
    )

    filename = tmp_path / f"test.{format}"
    component.write(filename=filename, format=format)

    component_new = SpatialFluxComponent.read(filename=filename, format=format)

    assert component.shape == component_new.shape
    assert component.upsampling_factor == component_new.upsampling_factor
    assert component.use_log_flux == component_new.use_log_flux
    assert type(component_new.prior) is type(prior)
    assert_allclose(
        component_new.flux_upsampled_numpy, component.flux_upsampled_numpy,
        rtol=1e-6,
    )


@pytest.mark.parametrize("prior_name", list(PRIOR_FACTORIES))
@pytest.mark.parametrize("format", ["fits", "asdf", "yaml"])
def test_flux_components_io(prior_name, format, tmp_path):
    components = FluxComponents()
    flux_init = jnp.ones((1, 1, 32, 32))

    components["flux-uniform"] = SpatialFluxComponent(
        flux_upsampled=flux_init,
        upsampling_factor=2,
        use_log_flux=False,
        prior=UniformPrior(),
    )
    components["flux-point"] = SpatialFluxComponent(
        flux_upsampled=flux_init,
        upsampling_factor=2,
        use_log_flux=False,
        prior=PRIOR_FACTORIES[prior_name](),
    )

    filename = tmp_path / f"test.{format}"
    components.write(filename=filename, format=format)

    components_new = FluxComponents.read(filename=filename, format=format)
    assert list(components_new) == ["flux-uniform", "flux-point"]


@pytest.mark.parametrize("format", ["fits"])
def test_sparse_flux_components_io(format, tmp_path):
    components = FluxComponents()

    components["flux-sparse"] = SparseSpatialFluxComponent(
        x_pos=jnp.arange(3, dtype=jnp.float32),
        y_pos=jnp.arange(3, dtype=jnp.float32) + 0.1,
        flux=jnp.ones(3),
        shape=(11, 9),
        use_log_flux=False,
        frozen=False,
    )

    filename = tmp_path / f"test.{format}"
    components.write(filename=filename, format=format)

    components_new = FluxComponents.read(filename=filename, format=format)
    assert list(components_new) == ["flux-sparse"]

    component = components_new["flux-sparse"]
    assert_allclose(component.x_pos_numpy, [0, 1, 2])
    assert_allclose(component.y_pos_numpy, [0.1, 1.1, 2.1])
    assert component.shape == (1, 1, 11, 9)
    assert not component.frozen


@pytest.mark.parametrize("format", ["yaml", "fits"])
def test_npred_calibrations_io(format, tmp_path):
    calibrations = NPredCalibrations()
    calibrations["obs-1"] = NPredCalibration(shift_x=0.2, shift_y=-0.1)
    calibrations["obs-2"] = NPredCalibration(background_norm=1.4, frozen=True)

    filename = tmp_path / f"test.{format}"
    calibrations.write(filename=filename, format=format)

    new = NPredCalibrations.read(filename=filename, format=format)
    assert list(new) == ["obs-1", "obs-2"]
    assert_allclose(new["obs-1"].to_dict()["shift_x"], 0.2, rtol=1e-6)
    assert_allclose(
        new["obs-2"].to_dict()["background_norm"], 1.4, rtol=1e-5
    )
    assert new["obs-2"].frozen


@pytest.fixture(scope="module")
def deconvolver_result():
    datasets = {}
    random_state = np.random.RandomState(642020)
    for idx in range(3):
        datasets[f"{idx}"] = gauss_and_point_sources_gauss_psf(
            random_state=random_state
        )
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, display_progress=False
    )
    flux_init = np.random.RandomState(642020).gamma(20, size=(32, 32))
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, prior=UniformPrior()
    )
    return deco.run(datasets=datasets, components=components)


@pytest.mark.parametrize("format", ["fits", "asdf"])
def test_map_deconvolver_result_io(format, deconvolver_result, tmp_path):
    filename = tmp_path / f"result.{format}"
    deconvolver_result.write(filename, format=format)

    result = MAPDeconvolverResult.read(filename=filename, format=format)

    assert result.config["n_epochs"] == 100
    # REF goldens (reference tests/test_core.py:89-91)
    assert_allclose(result.flux_total[12, 12], 1.542659, rtol=1e-3)
    assert_allclose(result.flux_total[0, 0], 3.927929, rtol=1e-3)
    assert_allclose(
        result.trace_loss["total"][-1],
        deconvolver_result.trace_loss["total"][-1],
        rtol=1e-6,
    )


def test_map_deconvolver_checkpoints(tmp_path):
    """GMM run with per-epoch checkpoints, reread (reference
    tests/test_core.py:191-221)."""
    datasets = {}
    random_state = np.random.RandomState(642020)
    for idx in range(2):
        datasets[f"{idx}"] = gauss_and_point_sources_gauss_psf(
            random_state=random_state
        )

    deco = MAPDeconvolver(
        n_epochs=3, learning_rate=0.1, display_progress=False,
        checkpoint_path=tmp_path,
    )
    flux_init = np.random.RandomState(642020).gamma(20, size=(32, 32))
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, upsampling_factor=2, prior=UniformPrior()
    )
    result = deco.run(datasets=datasets, components=components)

    filename = result.checkpoint_path / result.trace_loss["filename"][-1]
    result_checkpoint = MAPDeconvolverResult.read(filename=filename)

    assert result_checkpoint.flux_upsampled_total.shape == (64, 64)
    assert result.flux_upsampled_total.shape == (64, 64)

    # last checkpoint state equals the final state
    assert_allclose(
        result_checkpoint.flux_total, result.flux_total, rtol=1e-5
    )

    # reread an earlier checkpoint through the result API
    earlier = result.read_checkpoint(epoch=0)
    assert earlier.flux_upsampled_total.shape == (64, 64)


def test_minifits_roundtrip(tmp_path):
    from jolideco_tpu.utils.io.minifits import (
        BinTableHDU,
        ImageHDU,
        read_hdulist,
        write_hdulist,
    )

    rng = np.random.RandomState(0)
    image = rng.rand(8, 16).astype(np.float32)
    hdu_img = ImageHDU(
        data=image, header={"LOG_FLUX": True, "UPSAMPLE": 2}, name="flux"
    )
    hdu_tab = BinTableHDU(
        columns={
            "name": np.asarray(["a", "bb", "ccc"]),
            "value": np.asarray([1.5, 2.5, 3.5]),
            "count": np.asarray([1, 2, 3], np.int64),
            "flag": np.asarray([True, False, True]),
        },
        name="table",
    )
    path = tmp_path / "test.fits"
    write_hdulist([hdu_img, hdu_tab], path)

    hdus = read_hdulist(path)
    assert hdus[0].name == "FLUX"
    assert_allclose(hdus[0].data, image, rtol=1e-7)
    assert hdus[0].header["LOG_FLUX"] is True
    assert hdus[0].header["UPSAMPLE"] == 2

    tab = hdus[1]
    assert list(tab.columns["name"]) == ["a", "bb", "ccc"]
    assert_allclose(tab.columns["value"], [1.5, 2.5, 3.5])
    assert_allclose(tab.columns["count"], [1, 2, 3])
    assert list(tab.columns["flag"]) == [True, False, True]


def test_asdf_lite_roundtrip(tmp_path):
    from jolideco_tpu.utils.io.asdf_lite import read_asdf, write_asdf

    rng = np.random.RandomState(0)
    tree = {
        "a": {"flux": rng.rand(4, 5).astype(np.float32), "n": 3},
        "b": [1.0, 2.0],
        "c": "text",
        "mask": rng.rand(4) > 0.5,
    }
    path = tmp_path / "test.asdf"
    write_asdf(tree, path)

    back = read_asdf(path)
    assert_allclose(back["a"]["flux"], tree["a"]["flux"], rtol=1e-7)
    assert back["a"]["n"] == 3
    assert back["b"] == [1.0, 2.0]
    assert back["c"] == "text"
    assert (back["mask"] == tree["mask"]).all()


def test_sparse_component_yaml_roundtrip(tmp_path):
    # sparse components carry their source lists inline; the yaml
    # writer used to attach a dense-only sidecar key that made the
    # file unreadable
    from jolideco_tpu.models import (
        FluxComponents,
        SparseSpatialFluxComponent,
        SpatialFluxComponent,
    )
    from jolideco_tpu.priors import UniformPrior

    components = FluxComponents()
    components["points"] = SparseSpatialFluxComponent.from_numpy(
        flux=np.array([1.5, 2.5]), x_pos=np.array([3.0, 10.0]),
        y_pos=np.array([4.0, 11.0]), shape=(32, 32),
    )
    components["diffuse"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32)), prior=UniformPrior()
    )
    path = tmp_path / "components.yaml"
    components.write(path, overwrite=True)
    back = FluxComponents.read(path)
    assert isinstance(back["points"], SparseSpatialFluxComponent)
    np.testing.assert_allclose(
        back["points"].x_pos_numpy, [3.0, 10.0]
    )
    np.testing.assert_allclose(
        np.asarray(back["diffuse"].flux_upsampled_numpy),
        np.ones((32, 32)), rtol=1e-6,
    )


def test_inverse_cdf_norm_fits_write_refuses(tmp_path):
    from jolideco_tpu.models import SpatialFluxComponent
    from jolideco_tpu.priors import GMMPatchPrior, GaussianMixtureModel
    from jolideco_tpu.utils.norms import InverseCDFImageNorm

    rs = np.random.RandomState(0)
    norm = InverseCDFImageNorm.from_image(rs.gamma(2, size=(32, 32)))
    prior = GMMPatchPrior(
        gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
        norm=norm, cycle_spin=False,
    )
    component = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32)), prior=prior
    )
    with pytest.raises(ValueError, match="asdf"):
        component.write(tmp_path / "c.fits", overwrite=True)
    # the asdf path carries the tabulated norm fine
    component.write(tmp_path / "c.asdf", overwrite=True)
    back = SpatialFluxComponent.read(tmp_path / "c.asdf")
    assert type(back.prior.norm).__name__ == "InverseCDFImageNorm"


def test_config_none_fits_roundtrip(tmp_path):
    from jolideco_tpu.utils.io.fits import _config_from_hdu, _config_to_hdu

    config = {"scan_chunk": None, "n_epochs": 5, "beta": 1.0,
              "update_strategy": "joint", "flag": True}
    back = _config_from_hdu(_config_to_hdu(config))
    assert back["scan_chunk"] is None
    assert back["n_epochs"] == 5 and back["flag"] is True
    assert back["update_strategy"] == "joint"


def test_component_name_containing_init_not_mangled(
    tmp_path, deconvolver_result_like=None
):
    from jolideco_tpu.models import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.priors import UniformPrior
    from jolideco_tpu.utils.io.fits import (
        flux_components_from_hdulist,
        flux_components_to_hdulist,
    )

    components = FluxComponents()
    components["disk-initial"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((16, 16)), prior=UniformPrior()
    )
    hdus = flux_components_to_hdulist(components)
    back = flux_components_from_hdulist(hdus)
    assert list(back) == ["disk-initial"]
