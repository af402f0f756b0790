"""Generate the checked-in foreign-convention interop fixtures.

Two small binary files that exercise the *read-their-bytes* direction
of the FITS/ASDF interop suite in every environment (the library-gated
round-trip tests additionally run when astropy / asdf are installed):

- ``astropy_conventions.fits`` — primary float32 image with a TAN WCS
  plus one BINTABLE extension, laid out exactly as
  ``astropy.io.fits.HDUList.writeto`` emits it (mandatory-card
  comments, EXTEND card, 2880-byte blocks, big-endian payloads,
  blank-padded 8-char strings).
- ``asdf_conventions.asdf`` — a tree with one block-backed ndarray,
  laid out as ``asdf.AsdfFile.write_to`` (asdf 3.x) emits it:
  ``%TAG`` directive, tagged top document, ``asdf_library`` /
  ``history`` metadata with tagged flow mappings and extension
  entries, 48-byte block headers with md5 checksums, and the trailing
  ``#ASDF BLOCK INDEX`` document.

Run with the real libraries installed to regenerate the fixtures with
genuine foreign writers (preferred — the bytes then carry real
provenance); without them, the fallback crafts the same layouts from
the FITS standard / ASDF 1.5 spec following the two libraries'
published conventions. Either way the fixture *contents* (array
values, header cards, tree) are identical, and
``tests/test_interop.py`` asserts both files parse to those contents.
"""

import hashlib
import struct
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent

WCS_HEADER = {
    "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
    "CRVAL1": 83.633, "CRVAL2": 22.0145,
    "CRPIX1": 16.5, "CRPIX2": 16.5,
    "CDELT1": -0.0002777, "CDELT2": 0.0002777,
}


def fits_image():
    """The image payload baked into the FITS fixture (seeded)."""
    return np.random.RandomState(1).rand(16, 16).astype(np.float32)


def fits_flux_column():
    return np.array([1.0, 2.0])


def asdf_tree_arrays():
    """The ndarray baked into the ASDF fixture."""
    return np.arange(12, dtype=np.float64).reshape(3, 4)


# ----------------------------------------------------------------------
# preferred path: the real foreign writers


def write_fits_with_astropy(path):
    from astropy.io import fits

    hdu = fits.PrimaryHDU(data=fits_image())
    for key, value in WCS_HEADER.items():
        hdu.header[key] = value
    tbl = fits.BinTableHDU.from_columns(
        [fits.Column(name="flux", format="D", array=fits_flux_column())],
        name="SRC",
    )
    fits.HDUList([hdu, tbl]).writeto(path, overwrite=True)


def write_asdf_with_asdf(path):
    import asdf

    asdf.AsdfFile(
        {"flux": asdf_tree_arrays(), "meta": {"beta": 3.0}}
    ).write_to(path)


# ----------------------------------------------------------------------
# fallback: craft the same byte layouts from the specs


def _card(key, value, comment=None):
    """One 80-char card, astropy's fixed-format conventions."""
    if isinstance(value, bool):
        body = f"{key:<8}= {'T' if value else 'F':>20}"
    elif isinstance(value, int):
        body = f"{key:<8}= {value:>20}"
    elif isinstance(value, float):
        body = f"{key:<8}= {value!r:>20}"
    else:
        body = f"{key:<8}= '{value:<8}'"
        body = body.ljust(30)
    if comment:
        body += f" / {comment}"
    return body[:80].ljust(80).encode("ascii")


def _header_block(cards):
    raw = b"".join(cards) + b"END".ljust(80)
    return raw + b" " * ((-len(raw)) % 2880)


def _data_block(raw):
    return raw + b"\x00" * ((-len(raw)) % 2880)


def craft_fits_astropy_conventions(path):
    image = fits_image().astype(">f4")
    cards = [
        _card("SIMPLE", True, "conforms to FITS standard"),
        _card("BITPIX", -32, "array data type"),
        _card("NAXIS", 2, "number of array dimensions"),
        _card("NAXIS1", 16),
        _card("NAXIS2", 16),
        _card("EXTEND", True),
    ]
    cards += [_card(k, v) for k, v in WCS_HEADER.items()]
    primary = _header_block(cards) + _data_block(image.tobytes())

    col = fits_flux_column().astype(">f8")
    table = _header_block([
        _card("XTENSION", "BINTABLE", "binary table extension"),
        _card("BITPIX", 8, "array data type"),
        _card("NAXIS", 2, "number of array dimensions"),
        _card("NAXIS1", 8, "length of dimension 1"),
        _card("NAXIS2", 2, "length of dimension 2"),
        _card("PCOUNT", 0, "number of group parameters"),
        _card("GCOUNT", 1, "number of groups"),
        _card("TFIELDS", 1, "number of table fields"),
        _card("TTYPE1", "flux"),
        _card("TFORM1", "D"),
        _card("EXTNAME", "SRC", "extension name"),
    ]) + _data_block(col.tobytes())
    Path(path).write_bytes(primary + table)


def craft_asdf_asdf_conventions(path):
    arr = asdf_tree_arrays()
    data = arr.astype("<f8").tobytes()
    yaml_text = (
        "#ASDF 1.0.0\n"
        "#ASDF_STANDARD 1.5.0\n"
        "%YAML 1.1\n"
        "%TAG ! tag:stsci.edu:asdf/\n"
        "--- !core/asdf-1.1.0\n"
        "asdf_library: !core/software-1.0.0 {author: The ASDF Developers,"
        " homepage: 'http://github.com/asdf-format/asdf',\n"
        "  name: asdf, version: 3.1.0}\n"
        "history:\n"
        "  extensions:\n"
        "  - !core/extension_metadata-1.0.0\n"
        "    extension_class: asdf.extension._manifest.ManifestExtension\n"
        "    extension_uri: asdf://asdf-format.org/core/extensions/core-1.5.0\n"
        "    software: !core/software-1.0.0 {name: asdf, version: 3.1.0}\n"
        "flux: !core/ndarray-1.0.0\n"
        "  source: 0\n"
        "  datatype: float64\n"
        "  byteorder: little\n"
        "  shape: [3, 4]\n"
        "meta: {beta: 3.0}\n"
        "...\n"
    ).encode("utf-8")

    block_header = struct.pack(
        ">I4sQQQ16s", 0, b"\x00" * 4, len(data), len(data), len(data),
        hashlib.md5(data).digest(),
    )
    block_offset = len(yaml_text)
    block = b"\xd3BLK" + struct.pack(">H", len(block_header)) \
        + block_header + data
    index = (
        "#ASDF BLOCK INDEX\n"
        "%YAML 1.1\n"
        "---\n"
        f"- {block_offset}\n"
        "...\n"
    ).encode("utf-8")
    Path(path).write_bytes(yaml_text + block + index)


def main():
    fits_path = HERE / "astropy_conventions.fits"
    asdf_path = HERE / "asdf_conventions.asdf"

    try:
        write_fits_with_astropy(fits_path)
        fits_how = "astropy"
    except ImportError:
        craft_fits_astropy_conventions(fits_path)
        fits_how = "crafted (astropy not installed)"

    try:
        write_asdf_with_asdf(asdf_path)
        asdf_how = "asdf"
    except ImportError:
        craft_asdf_asdf_conventions(asdf_path)
        asdf_how = "crafted (asdf not installed)"

    print(f"{fits_path.name}: {fits_how}, {fits_path.stat().st_size} bytes")
    print(f"{asdf_path.name}: {asdf_how}, {asdf_path.stat().st_size} bytes")


if __name__ == "__main__":
    sys.exit(main())
