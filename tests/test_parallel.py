"""Multi-observation stacking and multi-chip sharding tests.

Runs on the 8-virtual-CPU-device mesh configured in conftest.py —
exercises the real sharding/collective logic without TPU hardware.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    NPredCalibration,
    NPredCalibrations,
    SpatialFluxComponent,
    UniformPrior,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
from jolideco_tpu.loss import PoissonLoss
from jolideco_tpu.parallel import StackedPoissonLoss, make_obs_mesh


@pytest.fixture(scope="module")
def datasets():
    rs = np.random.RandomState(642020)
    return {
        f"{idx}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for idx in range(8)
    }


@pytest.fixture(scope="module")
def components():
    rs = np.random.RandomState(642020)
    flux_init = rs.gamma(20, size=(32, 32))
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, prior=UniformPrior()
    )
    return components


def test_stacked_matches_per_dataset(datasets, components):
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )

    fluxes = components.to_flux_tuple()
    losses_stacked = np.asarray(stacked.evaluate(fluxes))
    losses_ref = np.asarray(per_dataset.evaluate(fluxes))
    assert_allclose(losses_stacked, losses_ref, rtol=1e-5)


def test_stacked_ragged_psf_sizes(components):
    """Different per-observation PSF sizes pad into one FFT shape."""
    rs = np.random.RandomState(642020)
    datasets = {}
    for idx, shape_psf in enumerate([(17, 17), (11, 11), (21, 21)]):
        datasets[f"{idx}"] = gauss_and_point_sources_gauss_psf(
            random_state=rs, shape_psf=shape_psf
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


def test_stacked_ragged_psf_sizes_upsampled():
    """Ragged PSFs + upsampling: the batched device build (per-group
    bilinear upsample, center-aligned pad, common-shape FFT) must match
    the per-dataset build, which upsamples and embeds each PSF at its
    own size."""
    from jolideco_tpu.models import SpatialFluxComponent

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


def test_stacked_direct_conv_matches_fft(datasets, components):
    stacked_fft = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="fft"
    )
    stacked_direct = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="direct"
    )
    fluxes = components.to_flux_tuple()
    assert_allclose(
        np.asarray(stacked_direct.evaluate(fluxes)),
        np.asarray(stacked_fft.evaluate(fluxes)),
        rtol=1e-4, atol=1e-5,
    )

    # gradients agree too
    def total(loss, flux):
        return jnp.sum(loss.evaluate((flux,)))

    g_fft = jax.grad(total, argnums=1)(stacked_fft, fluxes[0])
    g_direct = jax.grad(total, argnums=1)(stacked_direct, fluxes[0])
    assert_allclose(np.asarray(g_direct), np.asarray(g_fft), atol=1e-4)


def test_stacked_direct_conv_ragged_psfs(components):
    rs = np.random.RandomState(642020)
    datasets = {}
    for idx, shape_psf in enumerate([(17, 17), (11, 11), (14, 14)]):
        datasets[f"{idx}"] = gauss_and_point_sources_gauss_psf(
            random_state=rs, shape_psf=shape_psf
        )
    stacked_fft = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="fft"
    )
    stacked_direct = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="direct"
    )
    fluxes = components.to_flux_tuple()
    assert_allclose(
        np.asarray(stacked_direct.evaluate(fluxes)),
        np.asarray(stacked_fft.evaluate(fluxes)),
        rtol=1e-4, atol=1e-5,
    )


def test_stacked_mxu_conv_matches_fft(datasets, components):
    stacked_fft = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="fft"
    )
    stacked_mxu = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="mxu"
    )
    fluxes = components.to_flux_tuple()
    assert_allclose(
        np.asarray(stacked_mxu.evaluate(fluxes)),
        np.asarray(stacked_fft.evaluate(fluxes)),
        rtol=1e-4, atol=1e-5,
    )

    def total(loss, flux):
        return jnp.sum(loss.evaluate((flux,)))

    g_fft = jax.grad(total, argnums=1)(stacked_fft, fluxes[0])
    g_mxu = jax.grad(total, argnums=1)(stacked_mxu, fluxes[0])
    assert_allclose(np.asarray(g_mxu), np.asarray(g_fft), atol=1e-4)

    # sharded evaluation with replicated DFT tables
    mesh = make_obs_mesh()
    sharded = stacked_mxu.shard(mesh)
    assert_allclose(
        np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes)),
        np.asarray(stacked_fft.evaluate(fluxes)),
        rtol=1e-4, atol=1e-5,
    )


def test_stacked_heterogeneous_shapes_raises(components):
    rs = np.random.RandomState(0)
    datasets = {
        "a": gauss_and_point_sources_gauss_psf(random_state=rs),
        "b": gauss_and_point_sources_gauss_psf(
            random_state=rs, shape=(64, 64)
        ),
    }
    with pytest.raises(ValueError):
        StackedPoissonLoss.from_datasets(
            datasets=datasets, components=components
        )


def test_stacked_mixed_upsampling_factors_raises(datasets):
    """Components with different upsampling factors have no common
    linear-convolution shape; the stacked build must raise (the driver
    then falls back to per-dataset models)."""
    import copy

    from jolideco_tpu.models import SpatialFluxComponent

    components = FluxComponents()
    components["a"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32), np.float32)
    )
    components["b"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32), np.float32), upsampling_factor=2
    )
    datasets = copy.deepcopy(datasets)
    for name, dataset in datasets.items():
        psf = dataset["psf"]
        if not isinstance(psf, dict):
            dataset["psf"] = {"a": psf, "b": psf}
    with pytest.raises(ValueError):
        StackedPoissonLoss.from_datasets(
            datasets=datasets, components=components
        )


def test_stacked_with_calibrations(datasets, components):
    calibrations = NPredCalibrations()
    for name in datasets:
        calibrations[name] = NPredCalibration(shift_x=0.1, background_norm=1.2)

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    fluxes = components.to_flux_tuple()
    calib_params = calibrations.parameters()
    losses = np.asarray(stacked.evaluate(fluxes, calib_params))
    assert losses.shape == (8,)
    assert np.isfinite(losses).all()

    # compare against the per-dataset path with the same calibrations
    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    losses_ref = np.asarray(per_dataset.evaluate(fluxes, calib_params))
    assert_allclose(losses, losses_ref, rtol=1e-4)


def test_sharded_loss_matches_single_device(datasets, components):
    mesh = make_obs_mesh()
    assert mesh.devices.size == 8

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    expected = np.asarray(stacked.evaluate(fluxes))

    sharded = stacked.shard(mesh)
    result = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(result, expected, rtol=1e-5)

    # gradients through the sharded loss (psum over ICI-analogue)
    def total(s, flux):
        return jnp.sum(s.evaluate((flux,)))

    g_single = jax.grad(total, argnums=1)(stacked, fluxes[0])
    g_sharded = jax.jit(jax.grad(total, argnums=1))(sharded, fluxes[0])
    assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-4)


def test_sharded_keeps_pair_packed_ffts(datasets, components):
    """With an even observation count per device the FFT pair packing
    survives obs sharding: pairs (2i, 2i+1) are shard-local under
    contiguous block sharding, so each device runs per_device/2 packed
    complex FFTs instead of per_device real ones."""
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    assert stacked.pair_kernels is not None
    fluxes = components.to_flux_tuple()
    expected = np.asarray(stacked.evaluate(fluxes))

    mesh4 = make_obs_mesh(n_devices=4)  # 8 obs / 4 devices = 2 per device
    sharded = stacked.shard(mesh4)
    assert sharded.pair_kernels is not None, "packing must stay active"
    result = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(result, expected, rtol=1e-5)

    def total(s, flux):
        return jnp.sum(s.evaluate((flux,)))

    g_single = jax.grad(total, argnums=1)(stacked, fluxes[0])
    g_sharded = jax.jit(jax.grad(total, argnums=1))(sharded, fluxes[0])
    assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-4)

    # one observation per device: pairs would straddle devices, so the
    # packing is dropped and the per-obs vmap path runs
    mesh8 = make_obs_mesh()
    assert stacked.shard(mesh8).pair_kernels is None


def test_sharded_pfft_matches_unsharded(datasets, components):
    """The Pallas matmul-DFT conv partitions over the obs mesh.

    With an even per-device observation count the packed pairs are
    shard-local, so `shard` keeps the pfft spectra (pair-axis
    block-sharded) and `_conv_pfft_pair` runs the kernels per-device
    under jax.shard_map — values and gradients must equal the
    unsharded pfft evaluation exactly (same kernels, same per-pair
    arithmetic) and the XLA-FFT path to conv tolerance."""
    from jolideco_tpu.config import force_pallas

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="pfft"
    )
    assert stacked.pfft_pairs is not None
    fluxes = components.to_flux_tuple()

    with force_pallas("interpret"):
        expected = np.asarray(stacked.evaluate(fluxes))

        mesh4 = make_obs_mesh(n_devices=4)  # 8 obs / 4 dev = 1 local pair
        sharded = stacked.shard(mesh4)
        assert sharded.pfft_pairs is not None, "pfft must survive sharding"
        assert sharded.obs_mesh is mesh4
        result = np.asarray(
            jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes)
        )
        assert_allclose(result, expected, rtol=1e-6)

        def total(s, flux):
            return jnp.sum(s.evaluate((flux,)))

        g_single = jax.grad(total, argnums=1)(stacked, fluxes[0])
        g_sharded = jax.jit(jax.grad(total, argnums=1))(sharded, fluxes[0])
        assert_allclose(
            np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5
        )

    # cross-backend check against the XLA FFT path on the same mesh
    stacked_fft = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="fft"
    )
    expected_fft = np.asarray(stacked_fft.evaluate(fluxes))
    assert_allclose(result, expected_fft, rtol=1e-4)

    # odd per-device count: pairs would straddle devices — pfft drops
    # and the per-observation rFFT path serves the sharded loss
    mesh8 = make_obs_mesh()
    dropped = stacked.shard(mesh8)
    assert dropped.pfft_pairs is None
    assert dropped.obs_mesh is None
    with force_pallas("interpret"):
        result8 = np.asarray(
            jax.jit(lambda s, f: s.evaluate(f))(dropped, fluxes)
        )
    assert_allclose(result8, expected_fft, rtol=1e-4)


def test_sharded_pfft_multiband(datasets):
    """Sharded pfft with per-band channels: the flattened pair axis
    carries (pair, band) blocks, whose contiguous split must still
    align with whole pairs per device."""
    from jolideco_tpu.config import force_pallas
    from jolideco_tpu.utils.kernels import gaussian_kernel_2d

    rs = np.random.RandomState(3)
    c, h = 2, 32
    psfs = np.stack(
        [gaussian_kernel_2d(1.0 + b, x_size=9, y_size=9) for b in range(c)]
    ).astype(np.float32)
    mb_datasets = {}
    for i in range(8):
        flux = rs.gamma(2, size=(h, h)).astype(np.float32)
        background = 0.5 * np.ones((c, h, h), np.float32)
        counts = rs.poisson(background + flux[None]).astype(np.float32)
        mb_datasets[f"obs-{i}"] = {
            "counts": counts,
            "psf": psfs,
            "exposure": np.ones((c, h, h), np.float32),
            "background": background,
        }

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((h, h), np.float32), prior=UniformPrior()
    )
    fluxes = components.to_flux_tuple()

    stacked = StackedPoissonLoss.from_datasets(
        datasets=mb_datasets, components=components, conv_mode="pfft"
    )
    assert stacked.pfft_pairs is not None
    with force_pallas("interpret"):
        expected = np.asarray(stacked.evaluate(fluxes))
        sharded = stacked.shard(make_obs_mesh(n_devices=4))
        assert sharded.pfft_pairs is not None
        result = np.asarray(
            jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes)
        )
        assert_allclose(result, expected, rtol=1e-6)

        def total(s, flux):
            return jnp.sum(s.evaluate((flux,)))

        g_single = jax.grad(total, argnums=1)(stacked, fluxes[0])
        g_sharded = jax.jit(jax.grad(total, argnums=1))(sharded, fluxes[0])
        assert_allclose(
            np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5
        )


def test_joint_training_pfft_on_mesh_matches_fft(datasets):
    """End-to-end: MAPDeconvolver(conv_mode='pfft', mesh=...) keeps the
    Pallas conv backend on a pure obs mesh (no row axis) and trains to
    the same flux as the XLA-FFT mesh path."""
    from jolideco_tpu.config import force_pallas

    def build_components():
        rs = np.random.RandomState(642020)
        flux_init = rs.gamma(20, size=(32, 32))
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init, prior=UniformPrior()
        )
        return components

    mesh = make_obs_mesh(n_devices=4)
    results = {}
    for mode in ("fft", "pfft"):
        deco = MAPDeconvolver(
            n_epochs=10, learning_rate=0.1, display_progress=False,
            update_strategy="joint", mesh=mesh, conv_mode=mode,
        )
        with force_pallas("interpret"):
            results[mode] = deco.run(
                datasets=datasets, components=build_components()
            )
    assert_allclose(
        results["pfft"].flux_total,
        results["fft"].flux_total,
        rtol=1e-4,
    )


def test_joint_training_sharded_matches_unsharded(datasets):
    def build_components():
        rs = np.random.RandomState(642020)
        flux_init = rs.gamma(20, size=(32, 32))
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init, prior=UniformPrior()
        )
        return components

    mesh = make_obs_mesh()
    deco_sharded = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False,
        update_strategy="joint", mesh=mesh,
    )
    deco_plain = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False,
        update_strategy="joint",
    )

    r_sharded = deco_sharded.run(
        datasets=datasets, components=build_components()
    )
    r_plain = deco_plain.run(datasets=datasets, components=build_components())

    assert_allclose(r_sharded.flux_total, r_plain.flux_total, rtol=1e-4)
    assert_allclose(
        r_sharded.trace_loss["total"], r_plain.trace_loss["total"], rtol=1e-4
    )


def test_joint_training_on_2d_mesh_matches_unsharded(datasets):
    """MAPDeconvolver(mesh=obs x row) trains through the row-sharded
    pencil-FFT conv end-to-end and matches unsharded training."""
    from jolideco_tpu.parallel import make_obs_row_mesh

    def build_components():
        rs = np.random.RandomState(642020)
        flux_init = rs.gamma(20, size=(32, 32))
        components = FluxComponents()
        components["flux-1"] = SpatialFluxComponent.from_numpy(
            flux=flux_init, prior=UniformPrior()
        )
        return components

    deco_sharded = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False,
        update_strategy="joint", mesh=make_obs_row_mesh(2, 4),
    )
    deco_plain = MAPDeconvolver(
        n_epochs=20, learning_rate=0.1, display_progress=False,
        update_strategy="joint",
    )

    r_sharded = deco_sharded.run(
        datasets=datasets, components=build_components()
    )
    r_plain = deco_plain.run(datasets=datasets, components=build_components())

    assert_allclose(r_sharded.flux_total, r_plain.flux_total, rtol=1e-4)
    assert_allclose(
        r_sharded.trace_loss["total"], r_plain.trace_loss["total"], rtol=1e-4
    )


def test_spatial_sharding_matches_single_device(datasets, components):
    """2-D (obs x row) mesh: image-axis sharding with the matmul-DFT
    convolution (the FFT op rejects resharded layouts — see
    parallel/spatial.py)."""
    from jolideco_tpu.parallel import make_obs_row_mesh, shard_stacked_spatial

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="mxu"
    )
    fluxes = components.to_flux_tuple()
    expected = np.asarray(stacked.evaluate(fluxes))

    mesh = make_obs_row_mesh(2, 4)
    sharded = shard_stacked_spatial(stacked, mesh)
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda f: jnp.sum(stacked.evaluate((f,))))(fluxes[0])
    g2 = jax.jit(
        jax.grad(lambda f, s=sharded: jnp.sum(s.evaluate((f,))))
    )(fluxes[0])
    assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-6)


def test_spatial_sharding_fft_matches_single_device(datasets, components):
    """2-D (obs x row) mesh with conv_mode='fft': the row-sharded
    pencil-FFT convolution (ops.dist_fft) — values and gradients match
    the single-device FFT path."""
    from jolideco_tpu.parallel import make_obs_row_mesh, shard_stacked_spatial

    # discover the minimal conv shape, then grow the width until the
    # half-spectrum divides over the 4 row shards
    probe = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fh, fw = probe.fft_shape
    while (fw // 2 + 1) % 4:
        fw += 1
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, fft_shape=(fh, fw)
    )
    fluxes = components.to_flux_tuple()
    expected = np.asarray(jax.jit(stacked.evaluate)(fluxes))

    mesh = make_obs_row_mesh(2, 4)
    sharded = shard_stacked_spatial(stacked, mesh)
    assert sharded.spatial_mesh is mesh
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda f: jnp.sum(stacked.evaluate((f,))))(fluxes[0])
    g2 = jax.jit(
        jax.grad(lambda f, s=sharded: jnp.sum(s.evaluate((f,))))
    )(fluxes[0])
    assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)


def test_spatial_sharding_fft_requires_divisible_spectrum(
    datasets, components
):
    """An FFT shape whose half-spectrum does not divide over the row
    shards must be rejected at shard time with the fix spelled out."""
    from jolideco_tpu.parallel import make_obs_row_mesh, shard_stacked_spatial

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fwh = stacked.fft_shape[1] // 2 + 1
    mesh = make_obs_row_mesh(2, 4)
    if fwh % 4 == 0:
        pytest.skip("fixture spectrum happens to divide; nothing to test")
    with pytest.raises(ValueError, match="spatial_fft_shape"):
        shard_stacked_spatial(stacked, mesh)


def test_spatial_fft_shape_helper():
    from jolideco_tpu.ops.dist_fft import spatial_fft_shape

    fh, fw = spatial_fft_shape((32, 32), (9, 9), 4)
    assert fh == 40 and fw >= 40 and (fw // 2 + 1) % 4 == 0


def test_joint_training_with_gmm_sharded(datasets):
    """Full pipeline: GMM patch prior + sharded joint updates."""
    from jolideco_tpu.priors import GMMPatchPrior, GaussianMixtureModel

    rs = np.random.RandomState(642020)
    flux_init = rs.gamma(20, size=(32, 32))
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init,
        prior=GMMPatchPrior(
            gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1")
        ),
    )

    deco = MAPDeconvolver(
        n_epochs=5, learning_rate=0.1, display_progress=False,
        update_strategy="joint", mesh=make_obs_mesh(),
    )
    result = deco.run(datasets=datasets, components=components)
    assert np.isfinite(result.trace_loss[-1]["total"])
    assert np.isfinite(result.flux_total).all()


def test_mesh_builders_raise_on_insufficient_devices():
    """Silent mesh degradation is forbidden: asking for more devices
    than exist must raise, not quietly build a smaller mesh
    (regression: round-1 dryrun 'passed' on a 1-device mesh)."""
    from jolideco_tpu.parallel import make_obs_row_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="refusing"):
        make_obs_mesh(n_devices=n + 1)
    with pytest.raises(ValueError, match="refusing"):
        make_obs_row_mesh(2, n)


def test_hermetic_cpu_env_scrubs_tpu_vars():
    """The dry-run child env must carry no var that could register or
    select a TPU plugin, and must force the virtual-CPU device count
    over whatever the parent had in XLA_FLAGS."""
    import __graft_entry__

    environ = {
        "PALLAS_AXON_POOL_IPS": "127.0.0.1",
        "AXON_LOOPBACK_RELAY": "1",
        "TPU_SKIP_MDS_QUERY": "1",
        "LIBTPU_INIT_ARGS": "--foo",
        "JAX_PLATFORMS": "tpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2 --xla_abc=1",
        "PATH": "/usr/bin",
    }
    env = __graft_entry__._hermetic_cpu_env(environ, 8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "device_count=2" not in env["XLA_FLAGS"]
    assert "--xla_abc=1" in env["XLA_FLAGS"]  # unrelated flags survive
    assert env["PATH"] == "/usr/bin"  # unrelated vars survive
    leaked = [
        k
        for k in env
        if k.startswith(("PALLAS_AXON_", "AXON_", "TPU_", "LIBTPU"))
    ]
    assert not leaked, leaked


def test_dryrun_multichip_driver_context():
    """Regression for the round-1/2 red driver dryrun: call
    ``dryrun_multichip(8)`` from a parent process that has BOTH the
    driver's ``--xla_force_host_platform_device_count`` flag AND a
    non-CPU default JAX platform. The parent must never initialize a
    jax backend (probing one is what dragged in the remote TPU plugin),
    and the sharded train step must still run green inside the scrubbed
    subprocess."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"]
    )
    # A platform the parent cannot actually build: if any code path in
    # the parent touches jax.devices(), it fails loudly here.
    env["JAX_PLATFORMS"] = "tpu"
    code = (
        "import sys; "
        f"sys.path.insert(0, {repo!r}); "
        "import __graft_entry__; "
        "__graft_entry__.dryrun_multichip(8); "
        "mod = sys.modules.get('jax'); "
        "assert mod is None or not __import__('jax._src.xla_bridge', "
        "fromlist=['xla_bridge']).backends_are_initialized(), "
        "'parent initialized a jax backend'"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        cwd=repo,
    )
    assert result.returncode == 0, (
        f"driver-context dryrun failed (rc={result.returncode})\n"
        f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}"
    )
    assert "dryrun_multichip OK" in result.stdout


def test_evaluate_dataset_single_obs(datasets, components):
    """evaluate_dataset computes one observation's loss without
    evaluating the whole stack (regression: O(N^2) sequential use)."""
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    full = np.asarray(stacked.evaluate(fluxes))
    for idx in range(stacked.n_datasets):
        single = np.asarray(stacked.evaluate_dataset(idx, fluxes))
        assert_allclose(single, full[idx], rtol=1e-6)

    # the hot ops (FFTs) must not be batched over the stack: a
    # single-obs evaluation does exactly as many FFT elements as one
    # observation's forward
    jaxpr = jax.make_jaxpr(
        lambda f: stacked.evaluate_dataset(0, f)
    )(fluxes)
    n = stacked.n_datasets

    def fft_out_shapes(jxpr):
        shapes = []
        for eqn in jxpr.eqns:
            if eqn.primitive.name == "fft":
                shapes.extend(v.aval.shape for v in eqn.outvars)
            for param in eqn.params.values():
                if hasattr(param, "jaxpr"):
                    shapes.extend(fft_out_shapes(param.jaxpr))
        return shapes

    shapes = fft_out_shapes(jaxpr.jaxpr)
    assert shapes, "expected FFT ops in the forward"
    assert all(
        s[0] != n for s in shapes
    ), f"evaluate_dataset still batches the stack: {shapes}"


@pytest.mark.parametrize("n_obs", [2, 3, 4])
def test_packed_fft_matches_vmap_path(n_obs):
    """Pair-packed FFT evaluation == per-observation vmap path (both
    values and gradients), including the odd-N tail."""
    rs = np.random.RandomState(5)
    datasets = {}
    for i in range(n_obs):
        datasets[f"o{i}"] = {
            "counts": rs.poisson(5.0, (32, 32)).astype(np.float32),
            "psf": np.ones((5 + 2 * i, 5 + 2 * i), np.float32)
            / (5 + 2 * i) ** 2,
            "exposure": 1.0 + rs.rand(32, 32).astype(np.float32),
            "background": np.full((32, 32), 2.0, np.float32),
        }
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    assert stacked.pair_kernels is not None
    fluxes = components.to_flux_tuple()

    packed = np.asarray(jax.jit(stacked.evaluate)(fluxes))

    per_obs = stacked._per_obs_fn(fluxes)
    args = stacked._stacked_args(None)
    ref = np.asarray(jax.vmap(per_obs, in_axes=(0,) * len(args))(*args))
    assert_allclose(packed, ref, rtol=1e-5, atol=1e-6)

    g_packed = jax.jit(
        jax.grad(lambda f: stacked.evaluate((f,)).sum())
    )(fluxes[0])
    def ref_loss(f):
        po = stacked._per_obs_fn((f,))
        a = stacked._stacked_args(None)
        return jax.vmap(po, in_axes=(0,) * len(a))(*a).sum()
    g_ref = jax.grad(ref_loss)(fluxes[0])
    assert_allclose(np.asarray(g_packed), np.asarray(g_ref), rtol=1e-4,
                    atol=1e-6)


def test_packed_fft_with_calibrations():
    """Packed path under per-observation calibration shifts/norms."""
    from jolideco_tpu.models import NPredCalibration, NPredCalibrations

    rs = np.random.RandomState(6)
    datasets = {}
    for i in range(4):
        datasets[f"o{i}"] = {
            "counts": rs.poisson(5.0, (32, 32)).astype(np.float32),
            "psf": np.ones((5, 5), np.float32) / 25.0,
            "exposure": np.ones((32, 32), np.float32),
            "background": np.full((32, 32), 2.0, np.float32),
        }
    calibrations = NPredCalibrations()
    calib_params = {}
    for i, name in enumerate(datasets):
        calibrations[name] = NPredCalibration()
        calib_params[name] = {
            "shift_xy": jnp.asarray([[0.1 * i, -0.05 * i]], jnp.float32),
            "log_background_norm": jnp.asarray([0.01 * i], jnp.float32),
        }
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    fluxes = components.to_flux_tuple()
    packed = np.asarray(jax.jit(stacked.evaluate)(fluxes, calib_params))
    per_obs = stacked._per_obs_fn(fluxes)
    args = stacked._stacked_args(calib_params)
    ref = np.asarray(jax.vmap(per_obs, in_axes=(0,) * len(args))(*args))
    assert_allclose(packed, ref, rtol=1e-5, atol=1e-6)


def test_sharded_path_disables_packing(datasets, components):
    """shard() falls back to the per-observation vmap (one obs per
    device) and still matches the packed unsharded result."""
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    expected = np.asarray(jax.jit(stacked.evaluate)(fluxes))

    mesh = make_obs_mesh()
    sharded = stacked.shard(mesh)
    assert sharded.sharded and sharded.pair_kernels is None
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_frozen_calibrations_use_static_values():
    """(Partially) frozen calibrations contribute their stored values
    in the stacked path (round 1 silently substituted zeros)."""
    from jolideco_tpu.models import NPredCalibration, NPredCalibrations

    rs = np.random.RandomState(7)
    datasets = {}
    for i in range(2):
        datasets[f"o{i}"] = {
            "counts": rs.poisson(5.0, (32, 32)).astype(np.float32),
            "psf": np.ones((5, 5), np.float32) / 25.0,
            "exposure": np.ones((32, 32), np.float32),
            "background": np.full((32, 32), 2.0, np.float32),
        }
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    fluxes = components.to_flux_tuple()

    def build(frozen, frozen_shift):
        cals = NPredCalibrations()
        cals["o0"] = NPredCalibration(
            shift_x=0.4, shift_y=-0.3, background_norm=1.7,
            frozen=frozen, frozen_shift=frozen_shift,
        )
        cals["o1"] = NPredCalibration()
        return cals

    # reference: fully-trainable calibration with those values
    cals_free = build(frozen=False, frozen_shift=False)
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=cals_free
    )
    expected = np.asarray(
        stacked.evaluate(fluxes, cals_free.parameters())
    )

    # fully frozen: no params at all, static values must apply
    cals_frozen = build(frozen=True, frozen_shift=False)
    assert cals_frozen.parameters().get("o0", {}) == {}
    stacked_frozen = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=cals_frozen
    )
    got = np.asarray(
        stacked_frozen.evaluate(fluxes, cals_frozen.parameters())
    )
    assert_allclose(got, expected, rtol=1e-6)

    # frozen shift only: shift static, norm trainable (reference E0102
    # pattern: calibrations[ref].shift_xy.requires_grad = False)
    cals_fs = build(frozen=False, frozen_shift=True)
    params = cals_fs.parameters()
    assert "shift_xy" not in params["o0"]
    assert "log_background_norm" in params["o0"]
    stacked_fs = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=cals_fs
    )
    got_fs = np.asarray(stacked_fs.evaluate(fluxes, params))
    assert_allclose(got_fs, expected, rtol=1e-6)


def test_multi_component_order_survives_jit():
    """Component names that sort differently than their insertion
    order must stay paired with their fluxes through jit (dict pytree
    children re-sort by key on unflatten; regression: a 'background-*'
    component before a 'filament-*' component swapped exposures)."""
    rs = np.random.RandomState(8)
    psf = np.ones((5, 5), np.float32) / 25.0
    datasets = {
        "o0": {
            "counts": rs.poisson(5.0, (32, 32)).astype(np.float32),
            "psf": {"zz-first": psf, "aa-second": psf},
            "exposure": np.ones((32, 32), np.float32),
            "background": np.full((32, 32), 0.1, np.float32),
        },
        "o1": {
            "counts": rs.poisson(5.0, (32, 32)).astype(np.float32),
            "psf": {"zz-first": psf, "aa-second": psf},
            "exposure": np.ones((32, 32), np.float32),
            "background": np.full((32, 32), 0.1, np.float32),
        },
    }
    components = FluxComponents()
    # insertion order is the reverse of sorted order, AND the two
    # components have different shapes (upsampling) so a swap is loud
    components["zz-first"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32), np.float32), upsampling_factor=2
    )
    components["aa-second"] = SpatialFluxComponent.from_numpy(
        flux=np.full((32, 32), 0.1, np.float32), frozen=True
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    eager = np.asarray(stacked.evaluate(fluxes))
    jitted = np.asarray(
        jax.jit(lambda s, f: s.evaluate(f))(stacked, fluxes)
    )
    assert_allclose(jitted, eager, rtol=1e-6)


@pytest.mark.parametrize("conv_mode", ["fft", "ct", "pfft"])
@pytest.mark.parametrize("seed", range(6))
def test_stacked_matches_per_dataset_random_configs(seed, conv_mode):
    """Property sweep over the device-build parameter space: random
    observation counts, image sizes, odd/even ragged PSF sizes and
    upsampling factors — the stacked loss and its gradient must match
    the per-dataset build, in the FFT, Cooley-Tukey matmul-DFT and
    Pallas matmul-FFT (interpreted; heavy pad-to-128 territory)
    convolution modes."""
    from contextlib import ExitStack

    from jolideco_tpu.config import force_pallas
    from jolideco_tpu.models import SpatialFluxComponent

    rs = np.random.RandomState(1000 + seed)
    n_obs = int(rs.randint(1, 5))
    size = int(rs.choice([24, 32, 40]))
    factor = int(rs.choice([1, 2, 3]))

    datasets = {}
    for i in range(n_obs):
        psf_size = int(rs.randint(3, 12))  # odd AND even kernels
        yy, xx = np.mgrid[0:psf_size, 0:psf_size]
        c = (psf_size - 1) / 2
        psf = np.exp(-((yy - c) ** 2 + (xx - c) ** 2)
                     / (2 * rs.uniform(0.8, 2.0) ** 2))
        psf = (psf / psf.sum()).astype(np.float32)
        flux = rs.gamma(2.0, size=(size, size)).astype(np.float32)
        exposure = rs.uniform(0.5, 2.0, (size, size)).astype(np.float32)
        background = rs.uniform(0.1, 1.0, (size, size)).astype(np.float32)
        counts = rs.poisson(flux + background).astype(np.float32)
        datasets[f"obs-{i}"] = {
            "counts": counts, "psf": psf,
            "exposure": exposure, "background": background,
        }

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((size, size), np.float32), upsampling_factor=factor
    )

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode=conv_mode
    )
    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()

    with ExitStack() as stack:
        if conv_mode == "pfft":
            stack.enter_context(force_pallas("interpret"))
        assert_allclose(
            np.asarray(stacked.evaluate(fluxes)),
            np.asarray(per_dataset.evaluate(fluxes)),
            rtol=2e-4,
        )

        def total(loss, flux):
            return jnp.sum(loss.evaluate((flux,)))

        g_stacked = jax.grad(total, argnums=1)(stacked, fluxes[0])
        g_seq = jax.grad(total, argnums=1)(per_dataset, fluxes[0])
    assert_allclose(
        np.asarray(g_stacked), np.asarray(g_seq), rtol=2e-4, atol=1e-5
    )


def test_stacked_multiband_matches_per_dataset():
    """Multi-band (3-D counts/psf/exposure) observations through the
    stacked build match the per-dataset models (BASELINE config 5
    shape: per-band PSFs, shared 2-D flux)."""
    from jolideco_tpu.models import SpatialFluxComponent
    from jolideco_tpu.utils.kernels import gaussian_kernel_2d

    rs = np.random.RandomState(0)
    c, h = 3, 32
    psfs = np.stack(
        [gaussian_kernel_2d(1.0 + b, x_size=9, y_size=9) for b in range(c)]
    ).astype(np.float32)

    datasets = {}
    for i in range(3):
        flux = rs.gamma(2, size=(h, h)).astype(np.float32)
        background = 0.5 * np.ones((c, h, h), np.float32)
        counts = rs.poisson(background + flux[None]).astype(np.float32)
        datasets[f"obs-{i}"] = {
            "counts": counts,
            "psf": psfs,
            "exposure": np.ones((c, h, h), np.float32),
            "background": background,
        }

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((h, h), np.float32)
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

    def total(loss, flux):
        return jnp.sum(loss.evaluate((flux,)))

    g_stacked = jax.grad(total, argnums=1)(stacked, fluxes[0])
    g_seq = jax.grad(total, argnums=1)(per_dataset, fluxes[0])
    assert_allclose(
        np.asarray(g_stacked), np.asarray(g_seq), rtol=1e-4, atol=1e-6
    )


# ----------------------------------------------------------------------
# energy redistribution (rmf) on the stacked path
# (reference models/npred.py:184-188; the per-dataset chain is
# conv -> sum-pool -> RMF -> clip, per component)

def _rmf_datasets(n=4, c=2, k=None, h=16, rmf_kind="square", seed=0):
    rng = np.random.RandomState(seed)
    k = c if k is None else k
    psf = rng.uniform(0, 1, (5, 5)).astype(np.float32)
    psf /= psf.sum()
    if rmf_kind == "scalar":
        rmf = np.array([[0.9]], np.float32)
    elif rmf_kind == "square":
        rmf = np.array([[0.7, 0.3], [0.2, 0.8]], np.float32)[:c, :k]
    else:  # nonsquare: c input channels -> k output channels
        rmf = rng.uniform(0.1, 0.9, (c, k)).astype(np.float32)
        rmf /= rmf.sum(axis=1, keepdims=True)
    datasets = {}
    for i in range(n):
        in_shape = (h, h) if c == 1 else (c, h, h)
        out_shape = (h, h) if k == 1 and c == 1 else (k, h, h)
        psf_c = psf if c == 1 else np.stack([psf] * c)
        datasets[f"o{i}"] = {
            "counts": rng.poisson(3.0, out_shape).astype(np.float32),
            "background": np.full(out_shape, 0.5, np.float32),
            "exposure": rng.uniform(0.8, 1.2, in_shape).astype(np.float32),
            "psf": psf_c,
            "rmf": rmf,
        }
    return datasets


def _single_flux_components(h=16, seed=0):
    rng = np.random.RandomState(seed)
    components = FluxComponents()
    components["c0"] = SpatialFluxComponent.from_numpy(
        flux=rng.uniform(0.5, 2.0, (h, h)).astype(np.float32)
    )
    return components


@pytest.mark.parametrize("conv_mode", ["fft", "ct", "mxu", "direct"])
@pytest.mark.parametrize("rmf_kind, c, k", [
    ("scalar", 1, 1),
    ("square", 2, 2),
    ("nonsquare", 2, 3),
])
def test_stacked_rmf_matches_per_dataset(conv_mode, rmf_kind, c, k):
    """Every stacked conv backend folds dataset RMFs identically to the
    per-dataset forward models — values and flux gradients."""
    datasets = _rmf_datasets(c=c, k=k, rmf_kind=rmf_kind)
    components = _single_flux_components()
    fluxes = components.to_flux_tuple()

    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode=conv_mode
    )
    assert stacked.rmfs is not None
    assert stacked.rmfs["c0"].shape == (4, c, k)

    assert_allclose(
        np.asarray(stacked.evaluate(fluxes)),
        np.asarray(per_dataset.evaluate(fluxes)),
        rtol=1e-4,
    )

    def total(loss, flux):
        return jnp.sum(loss.evaluate((flux,)))

    g_stacked = jax.grad(total, argnums=1)(stacked, fluxes[0])
    g_seq = jax.grad(total, argnums=1)(per_dataset, fluxes[0])
    assert_allclose(
        np.asarray(g_stacked), np.asarray(g_seq), rtol=2e-4, atol=1e-6
    )


def test_stacked_rmf_changes_the_loss():
    """Guard against the einsum silently not running: dropping the rmf
    must change the stacked loss."""
    datasets = _rmf_datasets(rmf_kind="scalar", c=1)
    components = _single_flux_components()
    fluxes = components.to_flux_tuple()
    with_rmf = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    for d in datasets.values():
        d.pop("rmf")
    without = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    a = float(jnp.sum(with_rmf.evaluate(fluxes)))
    b = float(jnp.sum(without.evaluate(fluxes)))
    assert abs(a - b) > 1e-3


def test_stacked_rmf_per_component_dict():
    """dataset['rmf'] may be a dict keyed by component name (the
    per-dataset path accepts the same form)."""
    datasets = _rmf_datasets(c=2, k=2, rmf_kind="square")
    for d in datasets.values():
        d["rmf"] = {"c0": d["rmf"]}
    components = _single_flux_components()
    fluxes = components.to_flux_tuple()
    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    assert_allclose(
        np.asarray(stacked.evaluate(fluxes)),
        np.asarray(per_dataset.evaluate(fluxes)),
        rtol=1e-4,
    )


def test_stacked_rmf_evaluate_dataset():
    """The O(1) single-observation path folds the rmf too (sequential
    update strategy over a stacked loss)."""
    datasets = _rmf_datasets(c=2, k=2)
    components = _single_flux_components()
    fluxes = components.to_flux_tuple()
    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    for idx in range(len(datasets)):
        assert_allclose(
            float(stacked.evaluate_dataset(idx, fluxes)),
            float(per_dataset.evaluate_dataset(idx, fluxes)),
            rtol=1e-4,
        )


def test_stacked_rmf_sharded_matches_unsharded():
    datasets = _rmf_datasets(n=8, c=2, k=2)
    components = _single_flux_components()
    fluxes = components.to_flux_tuple()
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    expected = np.asarray(stacked.evaluate(fluxes))
    sharded = stacked.shard(make_obs_mesh())
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5)

    def total(s, flux):
        return jnp.sum(s.evaluate((flux,)))

    g1 = jax.grad(total, argnums=1)(stacked, fluxes[0])
    g2 = jax.jit(jax.grad(total, argnums=1))(sharded, fluxes[0])
    assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-6)


def test_stacked_rmf_spatial_mesh_matches():
    """RMF einsum under the 2-D (obs, row) pencil-FFT mesh: channel
    contraction is row-sharding-neutral; values and grads match."""
    from jolideco_tpu.parallel import make_obs_row_mesh, shard_stacked_spatial

    datasets = _rmf_datasets(n=2, c=2, k=2)
    components = _single_flux_components()
    fluxes = components.to_flux_tuple()
    probe = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fh, fw = probe.fft_shape
    while (fw // 2 + 1) % 4:
        fw += 1
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, fft_shape=(fh, fw)
    )
    expected = np.asarray(jax.jit(stacked.evaluate)(fluxes))
    sharded = shard_stacked_spatial(stacked, make_obs_row_mesh(2, 4))
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda f: jnp.sum(stacked.evaluate((f,))))(fluxes[0])
    g2 = jax.jit(
        jax.grad(lambda f, s=sharded: jnp.sum(s.evaluate((f,))))
    )(fluxes[0])
    assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)


def test_stacked_rmf_mixed_presence_raises_and_joint_falls_back(caplog):
    """Some-but-not-all datasets with an rmf cannot stack; the joint
    strategy must fall back to the per-dataset models (which fold each
    dataset's rmf correctly) instead of silently dropping physics."""
    import logging

    datasets = _rmf_datasets(c=1, rmf_kind="scalar")
    datasets["o3"].pop("rmf")
    components = _single_flux_components()
    with pytest.raises(ValueError, match="rmf"):
        StackedPoissonLoss.from_datasets(
            datasets=datasets, components=components
        )

    deco = MAPDeconvolver(n_epochs=1, update_strategy="joint")
    with caplog.at_level(logging.WARNING):
        total_loss = deco._build_total_loss(
            datasets, None, components, None
        )
    assert any("Cannot stack" in r.message for r in caplog.records)
    # the fallback evaluates the per-dataset physics (rmf folded)
    expected = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    fluxes = components.to_flux_tuple()
    assert_allclose(
        float(jnp.sum(total_loss.poisson_loss.evaluate(fluxes))),
        float(jnp.sum(expected.evaluate(fluxes))),
        rtol=1e-5,
    )


def test_stacked_rmf_output_channel_mismatch_raises():
    datasets = _rmf_datasets(c=2, k=3, rmf_kind="nonsquare")
    for d in datasets.values():
        d["counts"] = d["counts"][:2]  # 2 channels vs rmf K=3
        d["background"] = d["background"][:2]
    components = _single_flux_components()
    with pytest.raises(ValueError, match="channel"):
        StackedPoissonLoss.from_datasets(
            datasets=datasets, components=components
        )


def test_stacked_direct_multiband_grouped_conv():
    """conv_mode='direct' on multiband observations: per-channel
    grouped convolution (the old path hard-reshaped to one channel)."""
    datasets = _rmf_datasets(c=2, k=2)
    for d in datasets.values():
        d.pop("rmf")
    components = _single_flux_components()
    fluxes = components.to_flux_tuple()
    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="direct"
    )
    assert_allclose(
        np.asarray(stacked.evaluate(fluxes)),
        np.asarray(per_dataset.evaluate(fluxes)),
        rtol=1e-4,
    )


def test_stacked_rmf_input_channel_mismatch_fails_fast():
    """A genuinely data-invalid RMF (wrong INPUT channel count) raises
    DataValidationError at build time — and _build_total_loss re-raises
    it instead of falling back to per-dataset models that would fail
    later inside jit with an opaque einsum shape error."""
    from jolideco_tpu.parallel.stacked import DataValidationError

    datasets = _rmf_datasets(c=2, k=2, rmf_kind="square")
    for d in datasets.values():
        # 3 input channels vs 2-channel exposure/counts
        d["rmf"] = np.ones((3, 2), np.float32) / 2.0
    components = _single_flux_components()
    with pytest.raises(DataValidationError, match="input"):
        StackedPoissonLoss.from_datasets(
            datasets=datasets, components=components
        )

    deco = MAPDeconvolver(n_epochs=1, update_strategy="joint")
    with pytest.raises(DataValidationError, match="input"):
        deco._build_total_loss(datasets, None, components, None)


def test_stacked_rmf_dict_missing_component_fails_fast():
    """A dict-form rmf missing a component name is invalid for BOTH
    paths (the per-dataset build needs the same key): the stacked build
    raises DataValidationError naming the component instead of an
    opaque KeyError, and the joint build does not fall back."""
    from jolideco_tpu.parallel.stacked import DataValidationError

    datasets = _rmf_datasets(c=2, k=2, rmf_kind="square")
    for d in datasets.values():
        d["rmf"] = {"not-c0": d["rmf"]}
    components = _single_flux_components()
    with pytest.raises(DataValidationError, match="'c0'"):
        StackedPoissonLoss.from_datasets(
            datasets=datasets, components=components
        )
    with pytest.raises(ValueError, match="'c0'"):
        PoissonLoss.from_datasets(
            datasets=datasets, components=components
        )
    deco = MAPDeconvolver(n_epochs=1, update_strategy="joint")
    with pytest.raises(DataValidationError, match="'c0'"):
        deco._build_total_loss(datasets, None, components, None)


# ----------------------------------------------------------------------
# sparse components through the stacked joint path


def _sparse_plus_dense_setup(n_obs=4):
    from jolideco_tpu import SparseSpatialFluxComponent

    rs = np.random.RandomState(642020)
    datasets = {
        f"obs-{i}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for i in range(n_obs)
    }
    for d in datasets.values():
        d["psf"] = {"diffuse": d["psf"], "points": d["psf"]}

    components = FluxComponents()
    components["diffuse"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32))
    )
    components["points"] = SparseSpatialFluxComponent.from_numpy(
        flux=np.array([10.0, 5.0]),
        x_pos=np.array([16.0, 26.0]),
        y_pos=np.array([26.0, 16.0]),
        shape=(32, 32),
    )
    return datasets, components


def test_stacked_sparse_plus_dense_matches_per_dataset():
    """Sparse (centroid-splat) + dense components through the stacked
    JOINT path: values and parameter gradients (including the sparse
    positions) match the per-dataset models."""
    datasets, components = _sparse_plus_dense_setup()
    params = components.parameters()

    per_dataset = PoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )

    def total(loss, p):
        fluxes = components.fluxes_from(p)
        return jnp.sum(loss.evaluate(fluxes))

    assert_allclose(
        float(total(stacked, params)), float(total(per_dataset, params)),
        rtol=1e-5,
    )
    g_stacked = jax.grad(lambda p: total(stacked, p))(params)
    g_seq = jax.grad(lambda p: total(per_dataset, p))(params)
    for leaf_s, leaf_p in zip(
        jax.tree_util.tree_leaves(g_stacked),
        jax.tree_util.tree_leaves(g_seq),
    ):
        assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_p), rtol=1e-4, atol=1e-6
        )


def test_stacked_sparse_plus_dense_sharded_joint_trains():
    """The sparse+dense stack trains end-to-end through the sharded
    joint strategy on the 8-device mesh, matching the unsharded run."""
    datasets, components = _sparse_plus_dense_setup(n_obs=8)
    import copy

    mesh = make_obs_mesh(n_devices=8)
    deco = MAPDeconvolver(
        n_epochs=3, learning_rate=0.05, display_progress=False,
        update_strategy="joint", scan_epochs=True, seed=7,
    )
    result_plain = deco.run(
        datasets=datasets, components=copy.deepcopy(components)
    )
    deco_mesh = MAPDeconvolver(
        n_epochs=3, learning_rate=0.05, display_progress=False,
        update_strategy="joint", scan_epochs=True, seed=7, mesh=mesh,
    )
    result_mesh = deco_mesh.run(
        datasets=datasets, components=copy.deepcopy(components)
    )
    assert_allclose(
        result_mesh.components["diffuse"].flux_upsampled_numpy,
        result_plain.components["diffuse"].flux_upsampled_numpy,
        rtol=1e-4, atol=1e-6,
    )
    assert_allclose(
        result_mesh.components["points"].x_pos_numpy,
        result_plain.components["points"].x_pos_numpy,
        rtol=1e-4,
    )
