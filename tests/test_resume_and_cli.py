"""Resume-training, train-state checkpoint and CLI tests."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    SpatialFluxComponent,
    UniformPrior,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf


@pytest.fixture(scope="module")
def datasets():
    rs = np.random.RandomState(642020)
    return {
        f"{idx}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for idx in range(2)
    }


def build_components():
    rs = np.random.RandomState(642020)
    flux_init = rs.gamma(20, size=(32, 32))
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, prior=UniformPrior()
    )
    return components


def test_resume_from_result_matches_continuous(datasets):
    """20 epochs == 10 epochs + resume(10 epochs) with Adam moments."""
    deco20 = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False
    )
    r20 = deco20.run(datasets=datasets, components=build_components())

    deco10 = MAPDeconvolver(
        n_epochs=10, learning_rate=0.1, display_progress=False
    )
    r10 = deco10.run(datasets=datasets, components=build_components())
    r10b = deco10.run(
        datasets=datasets, components=r10.components, resume_from=r10
    )

    assert_allclose(r10b.flux_total, r20.flux_total, rtol=1e-4)


def test_save_restore_state_roundtrip(datasets, tmp_path):
    deco = MAPDeconvolver(
        n_epochs=10, learning_rate=0.1, display_progress=False
    )
    result = deco.run(datasets=datasets, components=build_components())
    result.save_state(tmp_path / "state")

    # resume from disk: params + optimiser moments restored
    components = build_components()  # structure template; overwritten
    result2 = deco.run(
        datasets=datasets, components=components,
        resume_from=tmp_path / "state",
    )
    assert np.isfinite(result2.flux_total).all()

    # the restored run must continue, not restart: compare to a
    # 20-epoch continuous run
    deco20 = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False
    )
    r20 = deco20.run(datasets=datasets, components=build_components())
    assert_allclose(result2.flux_total, r20.flux_total, rtol=1e-3)


def test_cross_topology_resume(datasets, tmp_path):
    """The checkpoint contract is topology-agnostic: a state saved from
    an 8-device-mesh run resumes on a single device and vice versa,
    matching the continuous single-topology runs — and neither
    direction may emit orbax's unsafe-sharding warning (round-4 weak
    #4: restores previously went through orbax's device-array path)."""
    import warnings

    from jolideco_tpu.parallel import make_obs_mesh

    # need an even obs count on the mesh: 8 datasets
    rs = np.random.RandomState(0)
    datasets8 = {
        f"{idx}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for idx in range(8)
    }
    mesh = make_obs_mesh(n_devices=8)

    def make_deco(n_epochs, use_mesh):
        return MAPDeconvolver(
            n_epochs=n_epochs, learning_rate=0.1,
            display_progress=False, update_strategy="joint",
            mesh=mesh if use_mesh else None,
        )

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*[Ss]harding info not provided.*"
        )

        # mesh -> single device
        r_mesh = make_deco(10, True).run(
            datasets=datasets8, components=build_components()
        )
        r_mesh.save_state(tmp_path / "mesh-state")
        r_resumed = make_deco(10, False).run(
            datasets=datasets8, components=build_components(),
            resume_from=tmp_path / "mesh-state",
        )
        r20_single = make_deco(20, False).run(
            datasets=datasets8, components=build_components()
        )
        assert_allclose(
            r_resumed.flux_total, r20_single.flux_total, rtol=1e-4
        )

        # single device -> mesh
        r_single = make_deco(10, False).run(
            datasets=datasets8, components=build_components()
        )
        r_single.save_state(tmp_path / "single-state")
        r_resumed2 = make_deco(10, True).run(
            datasets=datasets8, components=build_components(),
            resume_from=tmp_path / "single-state",
        )
        r20_mesh = make_deco(20, True).run(
            datasets=datasets8, components=build_components()
        )
        assert_allclose(
            r_resumed2.flux_total, r20_mesh.flux_total, rtol=1e-4
        )


def test_cli_version():
    from click.testing import CliRunner

    from jolideco_tpu.cli import cli

    runner = CliRunner()
    result = runner.invoke(cli, ["--version"])
    assert result.exit_code == 0
    assert "Jolideco-TPU version" in result.output


def test_cli_help():
    from click.testing import CliRunner

    from jolideco_tpu.cli import cli

    runner = CliRunner()
    result = runner.invoke(cli, ["--help"])
    assert result.exit_code == 0
    assert "test" in result.output
    assert "run" in result.output


def test_cli_run(tmp_path):
    import yaml
    from click.testing import CliRunner

    from jolideco_tpu.cli import cli

    rs = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=rs)
    np.savez(tmp_path / "obs.npz", **dataset)

    flux_init = rs.gamma(20, size=(32, 32))
    config = {
        "datasets": {"obs-1": {"filename": str(tmp_path / "obs.npz")}},
        "components": {
            "flux": {
                # plain 2-D image spec (promoted to (1, 1, H, W))
                "flux_upsampled": flux_init.tolist(),
                "prior": {"type": "uniform"},
            }
        },
        "deconvolver": {
            "n_epochs": 3,
            "learning_rate": 0.1,
            "display_progress": False,
        },
    }
    config_path = tmp_path / "run.yaml"
    config_path.write_text(yaml.safe_dump(config))

    runner = CliRunner()
    output = tmp_path / "result.fits"
    result = runner.invoke(
        cli, ["run", str(config_path), "--output", str(output)]
    )
    assert result.exit_code == 0, result.output
    assert output.exists()


def test_prebuilt_loss_reuse_matches_fresh_build(datasets):
    """run(total_loss=build_loss(...)) must reproduce a fresh-build run
    exactly, and each run must get a fresh trace table."""
    deco = MAPDeconvolver(
        n_epochs=20, display_progress=False, scan_epochs=True,
        update_strategy="joint", trace_every=1, seed=0,
    )
    fresh = deco.run(datasets=datasets, components=build_components())

    loss = deco.build_loss(datasets, components=build_components())
    reused_1 = deco.run(
        datasets=datasets, components=build_components(), total_loss=loss
    )
    reused_2 = deco.run(
        datasets=datasets, components=build_components(), total_loss=loss
    )

    assert_allclose(
        reused_1.components["flux-1"].flux_upsampled_numpy,
        fresh.components["flux-1"].flux_upsampled_numpy,
        rtol=1e-6,
    )
    assert_allclose(
        reused_2.components["flux-1"].flux_upsampled_numpy,
        fresh.components["flux-1"].flux_upsampled_numpy,
        rtol=1e-6,
    )
    # trace does not accumulate across reused runs
    assert len(reused_1.trace_loss) == len(fresh.trace_loss)
    assert len(reused_2.trace_loss) == len(fresh.trace_loss)
