"""Command line interface (reference ``jolideco/cli.py``).

The reference's ``test`` subcommand imports a nonexistent
``jolideco.test`` function (reference ``cli.py:54-58``); here it
actually runs the test suite via pytest.
"""

import logging
import warnings

import click

from jolideco_tpu import __version__


def print_version(ctx, param, value):
    """Eager ``--version`` callback."""
    if not value or ctx.resilient_parsing:
        return
    print(f"Jolideco-TPU version {__version__}")
    ctx.exit()


CONTEXT_SETTINGS = dict(help_option_names=["-h", "--help"])


@click.group("jolideco-tpu", context_settings=CONTEXT_SETTINGS)
@click.option(
    "--log-level",
    default="info",
    help="Logging verbosity level.",
    type=click.Choice(["debug", "info", "warning", "error"]),
)
@click.option("--ignore-warnings", is_flag=True, help="Ignore warnings?")
@click.option(
    "--version",
    is_flag=True,
    callback=print_version,
    expose_value=False,
    is_eager=True,
    help="Print version and exit.",
)
def cli(log_level, ignore_warnings):
    """Jolideco-TPU command line interface (CLI).

    TPU-native joint likelihood deconvolution of low-count data. Use
    ``--help`` on sub-commands for arguments and options.
    """
    logging.basicConfig(level=log_level.upper())
    if ignore_warnings:
        warnings.simplefilter("ignore")


@cli.command("test")
@click.option("--args", "pytest_args", default="", help="Extra pytest args")
def test(pytest_args):
    """Run the package test suite."""
    import sys
    from pathlib import Path

    import pytest

    tests_dir = Path(__file__).parent.parent / "tests"
    if not tests_dir.is_dir():
        # installed environments don't ship tests/ (pyproject packages
        # jolideco_tpu* only) — say so instead of pytest usage-error 4
        click.echo(
            "The test suite is not installed with the package; run "
            "'python -m pytest tests/' from a source checkout of "
            "jolideco-tpu.",
            err=True,
        )
        sys.exit(1)
    code = pytest.main([str(tests_dir), "-q", *pytest_args.split()])
    sys.exit(code)


@cli.command("run")
@click.argument("config", type=click.Path(exists=True))
@click.option("--output", default="result.fits", help="Output result file")
@click.option("--overwrite", is_flag=True)
def run(config, output, overwrite):
    """Run a MAP deconvolution from a YAML run configuration.

    The config lists datasets (npz/FITS file paths with counts, psf,
    exposure, background arrays), component definitions and deconvolver
    settings — a CLI surface the reference does not offer.
    """
    import numpy as np

    from jolideco_tpu import FluxComponents, MAPDeconvolver
    from jolideco_tpu.utils.io.yaml import load_yaml

    run_config = load_yaml(config)

    datasets = {}
    for name, spec in run_config["datasets"].items():
        filename = str(spec["filename"])
        if filename.endswith((".fits", ".fits.gz")):
            from jolideco_tpu.utils.io.minifits import read_hdulist

            datasets[name] = {
                hdu.name.lower(): np.asarray(hdu.data)
                for hdu in read_hdulist(filename)
                if hdu.data is not None and hdu.name
            }
        else:
            with np.load(filename) as data:
                datasets[name] = {key: data[key] for key in data.files}

    # FluxComponents.from_dict dispatches dense vs sparse entries
    components = FluxComponents.from_dict(run_config["components"])

    deco = MAPDeconvolver(**run_config.get("deconvolver", {}))
    result = deco.run(datasets=datasets, components=components)
    result.write(output, overwrite=overwrite)
    click.echo(f"wrote {output}")


if __name__ == "__main__":
    cli()
