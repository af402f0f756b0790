"""End-to-end MAP deconvolution regression tests.

Golden values marked REF are taken from the reference implementation's
own test suite (reference ``jolideco/tests/test_core.py:71-188``) — our
JAX implementation reproduces the PyTorch package's results on the same
seeded synthetic configurations to ~1e-3, which is the reference's own
cross-platform test tolerance. GMM-prior and error-computation goldens
are self-generated (different GMM asset / corrected Hessian — see
SURVEY.md §3.4).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from jolideco_tpu import (
    FluxComponents,
    GMMPatchPrior,
    GaussianMixtureModel,
    InverseGammaPrior,
    MAPDeconvolver,
    SpatialFluxComponent,
    UniformPrior,
)
from jolideco_tpu.priors import ExponentialPrior
from jolideco_tpu.data import (
    disk_source_gauss_psf,
    gauss_and_point_sources_gauss_psf,
)
from jolideco_tpu.utils.norms import ASinhImageNorm


@pytest.fixture(scope="session")
def datasets_gauss():
    datasets = {}
    random_state = np.random.RandomState(642020)
    for idx in range(3):
        datasets[f"{idx}"] = gauss_and_point_sources_gauss_psf(
            random_state=random_state
        )
    return datasets


@pytest.fixture(scope="session")
def datasets_disk():
    datasets = {}
    random_state = np.random.RandomState(642020)
    for idx in range(3):
        datasets[f"{idx}"] = disk_source_gauss_psf(random_state=random_state)
    for dataset in datasets.values():
        dataset["psf"] = {"flux-1": dataset["psf"]}
    return datasets


def flux_init_32():
    return np.random.RandomState(642020).gamma(20, size=(32, 32))


@pytest.fixture(scope="session")
def deconvolver_result(datasets_gauss):
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, display_progress=False
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    return deco.run(datasets=datasets_gauss, components=components)


def test_map_deconvolver_str():
    deco = MAPDeconvolver(n_epochs=1_000)
    assert "n_epochs" in str(deco)


def test_map_deconvolver_result(deconvolver_result):
    # REF goldens (reference tests/test_core.py:71-79)
    assert_allclose(deconvolver_result.flux_total[12, 12], 1.542659, rtol=1e-3)
    assert_allclose(deconvolver_result.flux_total[0, 0], 3.927929, rtol=1e-3)

    trace_loss = deconvolver_result.trace_loss[-1]
    assert_allclose(trace_loss["total"], 5.842237, rtol=1e-3)
    assert_allclose(trace_loss["dataset-0"], 1.956523, rtol=1e-3)
    assert_allclose(trace_loss["dataset-1"], 1.945902, rtol=1e-3)
    assert_allclose(trace_loss["dataset-2"], 1.939812, rtol=1e-3)


def test_map_deconvolver_result_plot(deconvolver_result):
    import matplotlib

    matplotlib.use("agg")
    deconvolver_result.components.plot()
    deconvolver_result.plot_trace_loss()
    deconvolver_result.peek()


def test_map_deconvolver_upsampling(datasets_disk):
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, display_progress=False
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), upsampling_factor=2, prior=UniformPrior()
    )
    result = deco.run(datasets=datasets_disk, components=components)

    assert result.flux_upsampled_total.shape == (64, 64)
    assert result.components["flux-1"].upsampling_factor == 2
    # REF goldens (reference tests/test_core.py:117-124)
    assert_allclose(result.flux_total[12, 12], 3.565998, rtol=1e-3)
    assert_allclose(result.flux_total[0, 0], 1.605782, rtol=1e-3)

    trace_loss = result.trace_loss[-1]
    assert_allclose(trace_loss["total"], 5.844786, rtol=1e-3)
    assert_allclose(trace_loss["dataset-0"], 1.946759, rtol=1e-3)


def test_map_deconvolver_inverse_gamma_prior(datasets_disk):
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, display_progress=False
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), upsampling_factor=1,
        prior=InverseGammaPrior(alpha=10),
    )
    result = deco.run(datasets=datasets_disk, components=components)

    assert result.flux_upsampled_total.shape == (32, 32)
    # REF goldens (reference tests/test_core.py:144-153)
    assert_allclose(result.flux_total[12, 12], 0.136798, rtol=1e-3)
    assert_allclose(result.flux_total[0, 0], 0.136563, rtol=1e-3)

    trace_loss = result.trace_loss[-1]
    assert_allclose(trace_loss["total"], 3.478109, rtol=1e-3)
    assert_allclose(trace_loss["prior-flux-1"], -1.950841, rtol=1e-3)


def test_map_deconvolver_validation_datasets(datasets_disk):
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, stop_early_n_average=10,
        display_progress=False,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), upsampling_factor=1,
        prior=ExponentialPrior(alpha=1),
    )

    datasets = {name: datasets_disk[name] for name in ["0", "1"]}
    datasets_validation = {"2": datasets_disk["2"]}

    result = deco.run(
        datasets=datasets, components=components,
        datasets_validation=datasets_validation,
    )

    # REF goldens (reference tests/test_core.py:180-188)
    assert_allclose(result.flux_total[12, 12], 1.382768, rtol=1e-3)
    assert_allclose(result.flux_total[0, 0], 0.407479, rtol=1e-3)

    trace_loss = result.trace_loss[-1]
    assert_allclose(trace_loss["total"], 4.66624, rtol=1e-3)
    assert_allclose(trace_loss["dataset-0"], 1.917588, rtol=1e-3)
    assert_allclose(trace_loss["prior-flux-1"], 0.825783, rtol=5e-3)
    assert_allclose(
        trace_loss["datasets-validation-total"], 1.888031, rtol=1e-3
    )


def test_map_deconvolver_early_stop(datasets_disk):
    deco = MAPDeconvolver(
        n_epochs=500, learning_rate=0.5, stop_early=True,
        stop_early_n_average=10, display_progress=False,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=ExponentialPrior(alpha=1)
    )
    datasets = {name: datasets_disk[name] for name in ["0", "1"]}
    result = deco.run(
        datasets=datasets, components=components,
        datasets_validation={"2": datasets_disk["2"]},
    )
    # training stopped well before 500 epochs (self-golden: 25)
    assert len(result.trace_loss) < 100


def test_joint_validation_and_early_stop(datasets_disk):
    # the joint strategy builds a SECOND StackedPoissonLoss for the
    # validation datasets and reads the early-stop signal off the
    # per-epoch trace — previously only exercised on the sequential
    # path
    deco = MAPDeconvolver(
        n_epochs=500, learning_rate=0.5, stop_early=True,
        stop_early_n_average=10, display_progress=False,
        update_strategy="joint",
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=ExponentialPrior(alpha=1)
    )
    datasets = {name: datasets_disk[name] for name in ["0", "1"]}
    result = deco.run(
        datasets=datasets, components=components,
        datasets_validation={"2": datasets_disk["2"]},
    )
    assert len(result.trace_loss) < 200
    assert np.isfinite(result.trace_loss[-1]["datasets-validation-total"])


def test_joint_with_checkpoints(tmp_path, datasets_gauss):
    # joint strategy + per-epoch checkpoints forces the host loop
    # around the stacked loss; checkpoints must write and reread
    deco = MAPDeconvolver(
        n_epochs=4, learning_rate=0.1, display_progress=False,
        update_strategy="joint", checkpoint_path=tmp_path, trace_every=1,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    result = deco.run(datasets=datasets_gauss, components=components)
    earlier = result.read_checkpoint(epoch=2)
    assert earlier.flux_total.shape == (32, 32)
    assert np.isfinite(earlier.flux_total).all()
    last = result.read_checkpoint(epoch=3)
    assert_allclose(last.flux_total, result.flux_total, rtol=1e-5)


def test_mesh_with_sequential_warns(caplog):
    import logging

    import jax

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("obs",))
    with caplog.at_level(logging.WARNING, logger="jolideco_tpu.core"):
        MAPDeconvolver(update_strategy="sequential", mesh=mesh)
    assert any("joint" in rec.message for rec in caplog.records)


def test_map_deconvolver_early_stop_requires_validation(datasets_disk):
    deco = MAPDeconvolver(n_epochs=10, stop_early=True)
    with pytest.raises(ValueError):
        deco.run(datasets=datasets_disk, components=FluxComponents())


def test_map_deconvolver_gmm(datasets_disk):
    deco = MAPDeconvolver(
        n_epochs=10, learning_rate=0.1, display_progress=False, seed=0
    )
    components = FluxComponents()
    prior = GMMPatchPrior(
        gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
        norm=ASinhImageNorm(),
    )
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), upsampling_factor=2, prior=prior
    )
    result = deco.run(datasets=datasets_disk, components=components)

    assert result.flux_upsampled_total.shape == (64, 64)
    # self-goldens (built-in GMM differs from the reference's library)
    assert_allclose(result.flux_total[12, 12], 81.474449, rtol=1e-2)
    trace_loss = result.trace_loss[-1]
    assert_allclose(trace_loss["total"], 154.829193, rtol=1e-2)
    assert_allclose(trace_loss["dataset-0"], 49.849510, rtol=1e-2)
    assert_allclose(trace_loss["prior-flux-1"], 4.912446, rtol=5e-2)


def test_map_deconvolver_compute_error(datasets_disk):
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, compute_error=True,
        display_progress=False,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), upsampling_factor=1,
        prior=InverseGammaPrior(alpha=0.1),
    )
    result = deco.run(datasets=datasets_disk, components=components)

    # self-golden: differs from the reference's 24.106102 because our
    # Hessian keeps the Poisson term (the reference detaches it —
    # SURVEY.md §3.4); the fluxes themselves match the reference.
    assert_allclose(
        result.components["flux-1"].flux_upsampled_error_numpy[3, 3],
        22.082710,
        rtol=1e-3,
    )


def test_scan_and_host_loop_agree(datasets_gauss):
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    import copy

    components2 = copy.deepcopy(components)

    deco_scan = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False,
        scan_epochs=True,
    )
    deco_loop = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False,
        scan_epochs=False,
    )
    r1 = deco_scan.run(datasets=datasets_gauss, components=components)
    r2 = deco_loop.run(datasets=datasets_gauss, components=components2)

    assert_allclose(r1.flux_total, r2.flux_total, rtol=1e-5)
    assert_allclose(
        r1.trace_loss["total"], r2.trace_loss["total"], rtol=1e-5
    )


def test_scan_and_host_loop_agree_with_randomness(datasets_gauss):
    """Per-epoch PRNG keys are fold_in-derived in both execution modes,
    so even random cycle spins give identical trajectories."""
    import copy

    def build():
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init_32(),
            prior=GMMPatchPrior(
                gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
                cycle_spin=True,
            ),
        )
        return components

    deco_scan = MAPDeconvolver(
        n_epochs=5, learning_rate=0.1, display_progress=False,
        scan_epochs=True, seed=7,
    )
    deco_loop = MAPDeconvolver(
        n_epochs=5, learning_rate=0.1, display_progress=False,
        scan_epochs=False, seed=7,
    )
    r1 = deco_scan.run(datasets=datasets_gauss, components=build())
    r2 = deco_loop.run(datasets=datasets_gauss, components=build())
    assert_allclose(r1.flux_total, r2.flux_total, rtol=1e-5)


def test_joint_update_strategy(datasets_gauss):
    deco = MAPDeconvolver(
        n_epochs=100, learning_rate=0.1, display_progress=False,
        update_strategy="joint",
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    result = deco.run(datasets=datasets_gauss, components=components)
    # joint updates converge to a comparable optimum (self-golden)
    assert_allclose(result.trace_loss[-1]["total"], 6.095006, rtol=1e-2)


def test_compute_error_with_multiscale_prior(datasets_gauss):
    # regression: MultiScalePrior.second_order_ok used to unpack the
    # full 4-D (1, 1, H, W) shape into (h, w), crashing every
    # compute_error run with a multiscale prior after training finished
    from jolideco_tpu.priors import MultiScalePrior
    from jolideco_tpu.priors.patches.gmm import GaussianMixtureModel

    base = GMMPatchPrior(
        gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
        norm=ASinhImageNorm(), cycle_spin=False,
    )
    prior = MultiScalePrior(prior=base, n_levels=2, cycle_spin=False)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=prior
    )
    deco = MAPDeconvolver(
        n_epochs=3, learning_rate=0.1, compute_error=True,
        display_progress=False,
    )
    result = deco.run(datasets=datasets_gauss, components=components)
    err = result.components["flux-1"].flux_upsampled_error_numpy
    # after 3 epochs some pixels sit at negative curvature, where
    # sqrt(1/H) is NaN by construction (reference behaviour too) —
    # the regression target is the shape-unpack crash, not the values
    assert err.shape == (32, 32)
    finite = np.isfinite(err)
    assert finite.any() and np.all(err[finite] > 0)


def test_joint_fft_shape_override(datasets_gauss):
    # any padding >= image + kernel - 1 computes the same linear
    # convolution, so an oversized fft_shape must reproduce the
    # default run (the knob trades transform radix vs padded area,
    # docs/performance.md)
    def build():
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init_32(), prior=UniformPrior()
        )
        return components

    kwargs = dict(
        n_epochs=20, learning_rate=0.1, display_progress=False,
        update_strategy="joint",
    )
    r_default = MAPDeconvolver(**kwargs).run(
        datasets=datasets_gauss, components=build()
    )
    deco = MAPDeconvolver(fft_shape=(48, 50), **kwargs)
    assert deco.to_dict()["fft_shape"] == [48, 50]
    r_padded = deco.run(datasets=datasets_gauss, components=build())
    assert_allclose(r_padded.flux_total, r_default.flux_total, rtol=1e-5)

    with pytest.raises(ValueError, match="too small"):
        MAPDeconvolver(fft_shape=(8, 8), **kwargs).run(
            datasets=datasets_gauss, components=build()
        )

    # the sequential (per-dataset) path honours the override too
    kwargs_seq = dict(kwargs, update_strategy="sequential", n_epochs=10)
    r_seq = MAPDeconvolver(**kwargs_seq).run(
        datasets=datasets_gauss, components=build()
    )
    r_seq_padded = MAPDeconvolver(fft_shape=(48, 50), **kwargs_seq).run(
        datasets=datasets_gauss, components=build()
    )
    assert_allclose(r_seq_padded.flux_total, r_seq.flux_total, rtol=1e-5)


def test_sgd_optimizer(datasets_gauss):
    deco = MAPDeconvolver(
        n_epochs=10, learning_rate=0.01, optimizer_type="sgd",
        display_progress=False,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    result = deco.run(datasets=datasets_gauss, components=components)
    assert np.isfinite(result.trace_loss[-1]["total"])


def test_trace_every_zero(datasets_gauss):
    deco = MAPDeconvolver(
        n_epochs=5, learning_rate=0.1, display_progress=False, trace_every=0
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    result = deco.run(datasets=datasets_gauss, components=components)
    assert len(result.trace_loss) == 0
    assert np.isfinite(result.flux_total).all()


def test_trace_every_gated_and_config_roundtrip(datasets_gauss):
    """trace_every=5 records every 5th epoch; the trace forward is
    gated inside the compiled step (not just filtered host-side), and
    gated runs match per-epoch-traced runs exactly."""
    def build():
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init_32(), prior=UniformPrior()
        )
        return components

    deco5 = MAPDeconvolver(
        n_epochs=10, learning_rate=0.1, display_progress=False,
        trace_every=5,
    )
    result5 = deco5.run(datasets=datasets_gauss, components=build())
    deco1 = MAPDeconvolver(
        n_epochs=10, learning_rate=0.1, display_progress=False,
        trace_every=1,
    )
    result1 = deco1.run(datasets=datasets_gauss, components=build())

    assert len(result5.trace_loss) == 2  # epochs 0 and 5
    assert len(result1.trace_loss) == 10
    assert_allclose(
        result5.trace_loss["total"],
        np.asarray(result1.trace_loss["total"])[[0, 5]],
        rtol=1e-6,
    )
    assert_allclose(result5.flux_total, result1.flux_total, rtol=1e-6)


def test_config_describes_run_fully():
    """to_dict must include every knob that shaped the run
    (round-1 omitted conv_mode/scan_epochs/scan_chunk/mesh/
    optimizer_kwargs)."""
    deco = MAPDeconvolver(
        n_epochs=3, conv_mode="mxu", scan_chunk=50, trace_every=2,
        optimizer_kwargs={"betas": (0.8, 0.95)},
    )
    config = deco.to_dict()
    for key in ("conv_mode", "scan_epochs", "scan_chunk", "mesh",
                "optimizer_kwargs"):
        assert key in config, key
    assert config["conv_mode"] == "mxu"
    assert config["scan_chunk"] == 50
    assert config["mesh"] is None
    assert config["optimizer_kwargs"] == {"betas": (0.8, 0.95)}

    from jolideco_tpu.parallel import make_obs_mesh

    deco_mesh = MAPDeconvolver(mesh=make_obs_mesh())
    assert deco_mesh.to_dict()["mesh"] == "obs:8"


def test_scan_epochs_with_checkpoint_warns(tmp_path, caplog, datasets_gauss):
    """Explicitly requesting scan_epochs=True together with
    checkpoint_path can't be honoured (per-epoch checkpoint writes need
    the host loop) — it must warn, not silently run the slow path."""
    import logging

    deco = MAPDeconvolver(
        n_epochs=2,
        learning_rate=0.1,
        display_progress=False,
        scan_epochs=True,
        checkpoint_path=tmp_path,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    with caplog.at_level(logging.WARNING, "jolideco_tpu.core"):
        result = deco.run(datasets=datasets_gauss, components=components)
    assert any(
        "scan_epochs" in r.message and "checkpoint_path" in r.message
        for r in caplog.records
    ), [r.message for r in caplog.records]
    # the host loop actually ran and wrote the checkpoints
    assert result.checkpoint_path is not None
    assert list(tmp_path.glob("checkpoint-epoch-*")), "no checkpoints written"


def test_checkpoint_path_none(deconvolver_result):
    """No checkpointing configured -> checkpoint_path is None (not
    Path('None')) and read_checkpoint refuses loudly."""
    assert deconvolver_result.checkpoint_path is None
    with pytest.raises(ValueError, match="without checkpoint_path"):
        deconvolver_result.read_checkpoint(0)


def test_gmm_to_dict_constant_time():
    """Registry GMMs serialise as their name without instantiating the
    registry; unregistered GMMs inline; both round-trip; pytree
    flatten/unflatten keeps provenance."""
    import jax

    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    assert gmm.to_dict() == {"type": "builtin-8x8-v1"}

    flat, treedef = jax.tree_util.tree_flatten(gmm)
    rebuilt = jax.tree_util.tree_unflatten(treedef, flat)
    assert rebuilt.to_dict() == {"type": "builtin-8x8-v1"}

    rs = np.random.RandomState(0)
    means = rs.normal(size=(3, 4))
    covs = np.stack([np.eye(4)] * 3)
    weights = np.full(3, 1 / 3)
    inline = GaussianMixtureModel.from_numpy(
        means=means, covariances=covs, weights=weights
    )
    data = inline.to_dict()
    assert data["type"] == "inline"
    back = GaussianMixtureModel.from_dict(data)
    assert back.is_equal(inline)


def test_mesh_sharding_failure_raises(datasets_disk):
    # 3 observations cannot shard over a 2-device obs mesh; previously
    # the broad fallback silently trained UNSHARDED on one device
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("obs",))
    deco = MAPDeconvolver(
        n_epochs=2, display_progress=False, update_strategy="joint",
        mesh=mesh,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    with pytest.raises(ValueError):
        deco.run(datasets=datasets_disk, components=components)


def test_stop_early_with_trace_every_zero(datasets_disk):
    # early stopping must work even when the recorded trace is disabled
    def build():
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init_32(), prior=ExponentialPrior(alpha=1)
        )
        return components

    datasets = {name: datasets_disk[name] for name in ["0", "1"]}
    validation = {"2": datasets_disk["2"]}

    kwargs = dict(
        n_epochs=500, learning_rate=0.5, stop_early=True,
        stop_early_n_average=10, display_progress=False,
    )
    r_ref = MAPDeconvolver(trace_every=1, **kwargs).run(
        datasets=datasets, components=build(),
        datasets_validation=validation,
    )
    r_quiet = MAPDeconvolver(trace_every=0, **kwargs).run(
        datasets=datasets, components=build(),
        datasets_validation=validation,
    )
    assert len(r_quiet.trace_loss) == 0
    # stopped at the same point -> same trained fluxes
    assert_allclose(r_quiet.flux_total, r_ref.flux_total, rtol=1e-6)


def test_stop_early_scan_and_host_agree_with_thinned_trace(datasets_disk):
    # trace_every=5 thins the RECORDED trace; the stopping rule must
    # stay per-epoch and identical between the scan and host paths
    def build():
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init_32(), prior=ExponentialPrior(alpha=1)
        )
        return components

    datasets = {name: datasets_disk[name] for name in ["0", "1"]}
    validation = {"2": datasets_disk["2"]}
    kwargs = dict(
        n_epochs=300, learning_rate=0.5, stop_early=True,
        stop_early_n_average=10, display_progress=False, trace_every=5,
        seed=3,
    )
    r_scan = MAPDeconvolver(scan_epochs=True, **kwargs).run(
        datasets=datasets, components=build(),
        datasets_validation=validation,
    )
    r_host = MAPDeconvolver(scan_epochs=False, **kwargs).run(
        datasets=datasets, components=build(),
        datasets_validation=validation,
    )
    assert_allclose(r_host.flux_total, r_scan.flux_total, rtol=1e-5)
    assert len(r_host.trace_loss) == len(r_scan.trace_loss)


def test_stop_early_prebuilt_loss_without_validation_raises(datasets_disk):
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    deco = MAPDeconvolver(n_epochs=5, display_progress=False)
    loss = deco.build_loss(datasets_disk, components=components)
    deco.stop_early = True
    with pytest.raises(ValueError, match="built without"):
        deco.run(
            datasets=datasets_disk, components=components,
            datasets_validation={"2": datasets_disk["2"]},
            total_loss=loss,
        )


def test_read_checkpoint_with_thinned_trace(tmp_path, datasets_gauss):
    # trace_every=2 records every other row; read_checkpoint(epoch)
    # must still return the state of THAT epoch, not a trace-row index
    deco = MAPDeconvolver(
        n_epochs=4, learning_rate=0.3, display_progress=False,
        checkpoint_path=tmp_path, trace_every=2,
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    result = deco.run(datasets=datasets_gauss, components=components)
    ck3 = result.read_checkpoint(epoch=3)
    assert_allclose(ck3.flux_total, result.flux_total, rtol=1e-5)
    ck1 = result.read_checkpoint(epoch=1)
    assert not np.allclose(ck1.flux_total, result.flux_total, rtol=1e-5)
    with pytest.raises(FileNotFoundError):
        result.read_checkpoint(epoch=99)


def test_n_epochs_zero_returns_untrained(datasets_gauss):
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init_32(), prior=UniformPrior()
    )
    deco = MAPDeconvolver(
        n_epochs=0, display_progress=False, scan_epochs=True
    )
    result = deco.run(datasets=datasets_gauss, components=components)
    assert_allclose(result.flux_total, flux_init_32(), rtol=1e-6)
    assert len(result.trace_loss) == 0
