"""API-surface audit against the reference's public symbol inventory.

The reference (jolideco v0.3.dev0) exposes a fixed set of public
module-level classes/functions (SURVEY.md §2; inventory snapshotted
below from ``jolideco/**/*.py`` excluding tests). A user migrating to
jolideco-tpu must find every one of them either

* under the same name here, or
* under the documented equivalent in ``docs/migration.md`` ("Low-level
  helper mapping"), or
* explicitly recorded as intentionally absent (torch-idiom plumbing
  with a stated jax-native replacement).

This test pins that contract so an accidental rename/removal fails CI
rather than silently breaking migrating scripts.
"""

import importlib

import pytest

# (reference module, symbol) -> ours: either
#   None                       -> same module path (jolideco -> jolideco_tpu) + same name
#   ("module", "name")         -> renamed/moved equivalent
#   "ABSENT: reason"           -> intentionally not provided (documented in docs/migration.md)
REFERENCE_SURFACE = {
    ("jolideco.cli", "print_version"): None,
    ("jolideco.cli", "cli"): None,
    ("jolideco.cli", "test"): None,
    ("jolideco.core", "MAPDeconvolver"): None,
    ("jolideco.core", "MAPDeconvolverResult"): None,
    ("jolideco.core", "optimizer_to_dict"): "ABSENT: optax config is already a dict (MAPDeconvolver.to_dict)",
    ("jolideco.loss", "PoissonLoss"): None,
    ("jolideco.loss", "PriorLoss"): None,
    ("jolideco.loss", "TotalLoss"): None,
    ("jolideco.models.core", "SpatialFluxComponent"): None,
    ("jolideco.models.core", "SparseSpatialFluxComponent"): None,
    ("jolideco.models.core", "FluxComponents"): None,
    ("jolideco.models.core", "parse_flux_tensor"): ("jolideco_tpu.models.core", "parse_flux_array"),
    ("jolideco.models.core", "freeze_mask"): "ABSENT: masks multiply in forward; no backward hooks in JAX",
    ("jolideco.models.npred", "NPredModel"): None,
    ("jolideco.models.npred", "NPredModels"): None,
    ("jolideco.models.npred", "NPredCalibration"): None,
    ("jolideco.models.npred", "NPredCalibrations"): None,
    ("jolideco.data.core", "point_source_gauss_psf"): None,
    ("jolideco.data.core", "disk_source_gauss_psf"): None,
    ("jolideco.data.core", "gauss_and_point_sources_gauss_psf"): None,
    ("jolideco.priors.core", "Prior"): None,
    ("jolideco.priors.core", "Priors"): None,
    ("jolideco.priors.core", "UniformPrior"): None,
    ("jolideco.priors.core", "InverseGammaPrior"): None,
    ("jolideco.priors.core", "ExponentialPrior"): None,
    ("jolideco.priors.core", "ImagePrior"): None,
    ("jolideco.priors.core", "SmoothnessPrior"): None,
    ("jolideco.priors.lira", "LIRAPrior"): None,
    ("jolideco.priors.patches.core", "GMMPatchPrior"): None,
    ("jolideco.priors.patches.core", "MultiScalePrior"): None,
    ("jolideco.priors.patches.gmm", "GaussianMixtureModelMeta"): None,
    ("jolideco.priors.patches.gmm", "GaussianMixtureModel"): None,
    ("jolideco.priors.patches.gmm", "get_gmm_registry"): None,
    ("jolideco.utils.misc", "flatten_dict"): None,
    ("jolideco.utils.misc", "unflatten_dict"): None,
    ("jolideco.utils.misc", "recursive_update"): None,
    ("jolideco.utils.misc", "to_str"): None,
    ("jolideco.utils.misc", "format_class_str"): None,
    ("jolideco.utils.norms", "PatchNorm"): None,
    ("jolideco.utils.norms", "SubtractMeanPatchNorm"): None,
    ("jolideco.utils.norms", "StandardizedSubtractMeanPatchNorm"): None,
    ("jolideco.utils.norms", "ImageNorm"): None,
    ("jolideco.utils.norms", "IdentityImageNorm"): None,
    ("jolideco.utils.norms", "ASinhImageNorm"): None,
    ("jolideco.utils.norms", "MaxImageNorm"): None,
    ("jolideco.utils.norms", "FixedMaxImageNorm"): None,
    ("jolideco.utils.norms", "SigmoidImageNorm"): None,
    ("jolideco.utils.norms", "ATanImageNorm"): None,
    ("jolideco.utils.norms", "InverseCDFImageNorm"): None,
    ("jolideco.utils.norms", "LogImageNorm"): None,
    ("jolideco.utils.norms", "PowerImageNorm"): None,
    ("jolideco.utils.numpy", "compute_precision_cholesky"): ("jolideco_tpu.ops.linalg", "compute_precision_cholesky"),
    ("jolideco.utils.numpy", "evaluate_trapez"): ("jolideco_tpu.ops.patches", "evaluate_trapez"),
    ("jolideco.utils.numpy", "get_pixel_weights"): ("jolideco_tpu.ops.patches", "get_pixel_weights"),
    ("jolideco.utils.numpy", "view_as_overlapping_patches"): ("jolideco_tpu.ops.patches", "view_as_overlapping_patches"),
    ("jolideco.utils.numpy", "reconstruct_from_overlapping_patches"): ("jolideco_tpu.ops.patches", "reconstruct_from_overlapping_patches"),
    ("jolideco.utils.numpy", "split_datasets_validation"): ("jolideco_tpu.utils.datasets", "split_datasets_validation"),
    ("jolideco.utils.plot", "add_cbar"): None,
    ("jolideco.utils.plot", "plot_trace_loss"): None,
    ("jolideco.utils.plot", "plot_example_dataset"): None,
    ("jolideco.utils.sympy", "concrete_expand_log"): None,
    ("jolideco.utils.testing", "requires_device"): None,
    ("jolideco.utils.torch", "transpose"): "ABSENT: one-line jnp.swapaxes; no wrapper",
    ("jolideco.utils.torch", "grid_weights"): ("jolideco_tpu.ops.image", "grid_weights"),
    ("jolideco.utils.torch", "uniform_torch"): "ABSENT: jax.random.uniform with explicit keys",
    ("jolideco.utils.torch", "cycle_spin"): ("jolideco_tpu.ops.image", "cycle_spin"),
    ("jolideco.utils.torch", "cycle_spin_interp"): ("jolideco_tpu.ops.image", "cycle_spin_interp"),
    ("jolideco.utils.torch", "cycle_spin_subpixel"): ("jolideco_tpu.ops.image", "cycle_spin_subpixel"),
    ("jolideco.utils.torch", "interp1d_torch"): ("jolideco_tpu.ops.image", "interp1d"),
    ("jolideco.utils.torch", "rescale_image_torch"): ("jolideco_tpu.ops.image", "rescale_image"),
    ("jolideco.utils.torch", "shift_image_torch"): ("jolideco_tpu.ops.image", "shift_image"),
    ("jolideco.utils.torch", "view_as_windows_torch"): ("jolideco_tpu.ops.patches", "extract_patches_at"),
    ("jolideco.utils.torch", "view_as_overlapping_patches_torch"): ("jolideco_tpu.ops.patches", "view_as_overlapping_patches"),
    ("jolideco.utils.torch", "view_as_random_overlapping_patches_torch"): ("jolideco_tpu.ops.patches", "view_as_random_overlapping_patches"),
    ("jolideco.utils.torch", "convolve_fft_torch"): ("jolideco_tpu.ops.fft", "convolve_fft"),
    ("jolideco.utils.torch", "convolve_fft_fourier_kernel_torch"): ("jolideco_tpu.ops.fft", "convolve_fft_precomputed"),
    ("jolideco.utils.torch", "get_default_generator"): "ABSENT: no global generator; PRNG keys threaded explicitly",
    ("jolideco.utils.io", "document_io_formats"): None,
    ("jolideco.utils.io", "guess_format_from_filename"): None,
    ("jolideco.utils.io", "get_writer"): None,
    ("jolideco.utils.io", "get_reader"): None,
    ("jolideco.utils.io.asdf", "write_flux_component_to_asdf"): None,
    ("jolideco.utils.io.asdf", "read_flux_component_from_asdf"): None,
    ("jolideco.utils.io.asdf", "write_flux_components_to_asdf"): None,
    ("jolideco.utils.io.asdf", "read_flux_components_from_asdf"): None,
    ("jolideco.utils.io.asdf", "write_map_result_to_asdf"): None,
    ("jolideco.utils.io.asdf", "read_map_result_from_asdf"): None,
    ("jolideco.utils.io.fits", "sparse_flux_component_to_table_hdu"): None,
    ("jolideco.utils.io.fits", "sparse_flux_component_from_table_hdu"): None,
    ("jolideco.utils.io.fits", "flux_component_to_image_hdu"): None,
    ("jolideco.utils.io.fits", "flux_component_from_image_hdu"): None,
    ("jolideco.utils.io.fits", "flux_components_to_hdulist"): None,
    ("jolideco.utils.io.fits", "flux_components_from_hdulist"): None,
    ("jolideco.utils.io.fits", "npred_calibrations_to_table"): ("jolideco_tpu.utils.io.fits", "npred_calibrations_to_table_hdu"),
    ("jolideco.utils.io.fits", "npred_calibrations_from_table"): ("jolideco_tpu.utils.io.fits", "npred_calibrations_from_table_hdu"),
    ("jolideco.utils.io.fits", "write_flux_components_to_fits"): None,
    ("jolideco.utils.io.fits", "read_flux_components_from_fits"): None,
    ("jolideco.utils.io.fits", "write_flux_component_to_fits"): None,
    ("jolideco.utils.io.fits", "read_flux_component_from_fits"): None,
    ("jolideco.utils.io.fits", "read_npred_calibrations_from_fits"): None,
    ("jolideco.utils.io.fits", "write_npred_calibrations_to_fits"): None,
    ("jolideco.utils.io.fits", "write_map_result_to_fits"): None,
    ("jolideco.utils.io.fits", "read_map_result_from_fits"): None,
    ("jolideco.utils.io.yaml", "to_yaml_str"): None,
    ("jolideco.utils.io.yaml", "from_yaml_str"): None,
    ("jolideco.utils.io.yaml", "write_yaml"): None,
    ("jolideco.utils.io.yaml", "load_yaml"): None,
    ("jolideco.utils.io.yaml", "flux_component_to_yaml_dict"): None,
    ("jolideco.utils.io.yaml", "write_flux_component_to_yaml"): None,
    ("jolideco.utils.io.yaml", "write_flux_components_to_yaml"): None,
    ("jolideco.utils.io.yaml", "read_flux_component_from_yaml"): None,
    ("jolideco.utils.io.yaml", "read_flux_components_from_yaml"): None,
    ("jolideco.utils.io.yaml", "read_npred_calibrations_from_yaml"): None,
    ("jolideco.utils.io.yaml", "write_npred_calibrations_to_yaml"): None,
}


def _resolve(module_name, symbol):
    mod = importlib.import_module(module_name)
    return getattr(mod, symbol)


@pytest.mark.parametrize(
    "ref_module,symbol",
    list(REFERENCE_SURFACE),
    ids=[f"{m}.{s}" for m, s in REFERENCE_SURFACE],
)
def test_reference_symbol_has_equivalent(ref_module, symbol):
    spec = REFERENCE_SURFACE[(ref_module, symbol)]
    if isinstance(spec, str):
        assert spec.startswith("ABSENT: "), spec
        return  # intentionally absent; reason documented in docs/migration.md
    if spec is None:
        module_name = ref_module.replace("jolideco", "jolideco_tpu", 1)
        _resolve(module_name, symbol)
    else:
        _resolve(*spec)


def test_intentional_absences_are_documented():
    """Every ABSENT entry must appear in docs/migration.md."""
    import pathlib

    doc = (
        pathlib.Path(__file__).resolve().parents[1] / "docs" / "migration.md"
    ).read_text()
    absent = [
        s for (_, s), spec in REFERENCE_SURFACE.items()
        if isinstance(spec, str)
    ]
    assert absent, "expected some intentional absences"
    for symbol in absent:
        assert symbol in doc, (
            f"{symbol} intentionally absent but not documented in "
            "docs/migration.md"
        )
