"""Adversarial round-trips of the hand-written binary IO layer.

minifits implements the FITS subset from spec; these tests push the
edges a polite caller never hits: every integer/float dtype (with the
value-preserving promotions for types FITS images don't encode
natively), long header strings through the OGIP 1.0 CONTINUE
convention, quote-dense values, strings that legitimately end with the
continuation marker, empty tables and zero-length image axes.
"""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from jolideco_tpu.utils.io.minifits import (
    BinTableHDU,
    ImageHDU,
    read_hdulist,
    write_hdulist,
)


def roundtrip(hdus, tmp_path, name="fuzz.fits"):
    path = tmp_path / name
    write_hdulist(hdus, path, overwrite=True)
    return read_hdulist(path)


@pytest.mark.parametrize(
    "dtype,promoted",
    [
        (np.uint8, np.uint8),
        (np.int16, np.int16),
        (np.int32, np.int32),
        (np.int64, np.int64),
        (np.float32, np.float32),
        (np.float64, np.float64),
        # value-preserving promotions onto FITS-native types
        (np.bool_, np.uint8),
        (np.int8, np.int16),
        (np.uint16, np.int32),
        (np.uint32, np.int64),
        (np.uint64, np.int64),
        (np.float16, np.float32),
    ],
)
def test_image_dtype_roundtrip(dtype, promoted, tmp_path):
    rng = np.random.RandomState(0)
    if np.dtype(dtype).kind == "b":
        data = rng.rand(7, 5) > 0.5
    elif np.dtype(dtype).kind in "iu":
        info = np.iinfo(np.int8 if dtype is np.int8 else dtype)
        high = min(info.max, np.iinfo(np.int64).max)
        data = rng.randint(
            max(info.min, -(2**31)), min(high, 2**31 - 1), (7, 5)
        ).astype(dtype)
        data.flat[0] = max(info.min, -(2**31))
    else:
        data = rng.randn(7, 5).astype(dtype)
    hdus = roundtrip([ImageHDU(data=data, name="X")], tmp_path)
    got = hdus[0].data
    assert got.dtype.newbyteorder("=") == np.dtype(promoted)
    assert_array_equal(got.astype(np.float64), data.astype(np.float64))


def test_image_uint64_overflow_raises(tmp_path):
    data = np.array([[np.iinfo(np.uint64).max]], np.uint64)
    with pytest.raises(ValueError, match="int64 range"):
        write_hdulist([ImageHDU(data=data)], tmp_path / "x.fits")


def test_image_complex_raises(tmp_path):
    data = np.ones((2, 2), np.complex64)
    with pytest.raises(ValueError, match="no FITS image"):
        write_hdulist([ImageHDU(data=data)], tmp_path / "x.fits")


@pytest.mark.parametrize("shape", [(4,), (3, 4, 5), (0, 5), (1, 1)])
def test_image_shapes_roundtrip(shape, tmp_path):
    data = np.arange(int(np.prod(shape)), dtype=np.float32).reshape(shape)
    hdus = roundtrip([ImageHDU(data=data)], tmp_path)
    assert hdus[0].data.shape == shape
    assert_array_equal(hdus[0].data, data)


def test_noncontiguous_image_roundtrip(tmp_path):
    base = np.arange(100, dtype=np.float32).reshape(10, 10)
    view = base[::2, ::3]
    hdus = roundtrip([ImageHDU(data=view)], tmp_path)
    assert_array_equal(hdus[0].data, view)


LONG_STRINGS = [
    "x" * 200,
    "path/" * 40 + "checkpoint-epoch-123.asdf",
    # quote-dense: escaping doubles every character
    "'" * 150,
    "it's " * 30 + "o'clock",
    # exactly at and around the single-card boundary (68 escaped chars)
    "y" * 67,
    "y" * 68,
    "y" * 69,
    # trailing continuation marker must survive, long and short
    "z" * 100 + "&",
    "short&",
    "&",
]


@pytest.mark.parametrize("value", LONG_STRINGS)
def test_long_header_string_roundtrip(value, tmp_path):
    hdu = ImageHDU(
        data=np.zeros((2, 2), np.float32), header={"LONGVAL": value}
    )
    hdus = roundtrip([hdu], tmp_path)
    assert hdus[0].header["LONGVAL"] == value


def test_many_long_strings_one_header(tmp_path):
    header = {f"KEY{i}": f"value-{i}-" + "ab'cd" * (10 + 7 * i)
              for i in range(6)}
    header["AFTER"] = 42  # a plain card following the CONTINUE runs
    hdus = roundtrip(
        [ImageHDU(data=np.zeros((2, 2), np.float32), header=header)],
        tmp_path,
    )
    for key, value in header.items():
        assert hdus[0].header[key] == value


def test_table_column_dtypes_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    columns = {
        "flag": rng.rand(9) > 0.5,
        "i16": rng.randint(-1000, 1000, 9).astype(np.int16),
        "i32": rng.randint(-(2**30), 2**30, 9).astype(np.int32),
        "i64": rng.randint(-(2**31), 2**31, 9).astype(np.int64),
        "f32": rng.randn(9).astype(np.float32),
        "f64": rng.randn(9),
        "name": np.array([f"source-{i}" for i in range(9)]),
    }
    table = BinTableHDU(columns=columns, name="CAT")
    hdus = roundtrip([ImageHDU(), table], tmp_path)
    got = next(h for h in hdus if getattr(h, "name", "") == "CAT")
    for key, expected in columns.items():
        values = got.columns[key]
        if expected.dtype.kind == "U":
            assert [
                v.decode() if isinstance(v, bytes) else str(v)
                for v in values
            ] == list(expected)
        elif expected.dtype.kind == "b":
            assert_array_equal(values.astype(bool), expected)
        else:
            assert_array_equal(
                values.astype(expected.dtype), expected
            )


def test_empty_table_roundtrip(tmp_path):
    table = BinTableHDU.from_rows([], name="EMPTY")
    hdus = roundtrip([ImageHDU(), table], tmp_path)
    got = next(h for h in hdus if getattr(h, "name", "") == "EMPTY")
    assert dict(got.columns) == {}


def test_header_scalar_types_roundtrip(tmp_path):
    header = {
        "BOOLT": True,
        "BOOLF": False,
        "INTV": -123456789,
        "FLOATV": 2.5e-17,
        "STRV": "plain",
        "QUOTED": "it's quoted",
    }
    hdus = roundtrip(
        [ImageHDU(data=np.zeros((2, 2), np.float32), header=header)],
        tmp_path,
    )
    for key, value in header.items():
        got = hdus[0].header[key]
        assert got == value and type(got) is type(value)


# ---------------------------------------------------------------------
# asdf_lite


from jolideco_tpu.utils.io.asdf_lite import read_asdf, write_asdf  # noqa: E402


def asdf_roundtrip(tree, tmp_path, name="fuzz.asdf"):
    path = tmp_path / name
    write_asdf(tree, path, overwrite=True)
    return read_asdf(path)


@pytest.mark.parametrize(
    "dtype,promoted",
    [
        (np.float64, np.float64),
        (np.float32, np.float32),
        (np.int64, np.int64),
        (np.int32, np.int32),
        (np.int16, np.int16),
        (np.uint8, np.uint8),
        (np.bool_, np.bool_),
        # value-preserving promotions
        (np.int8, np.int16),
        (np.uint16, np.int32),
        (np.uint32, np.int64),
        (np.uint64, np.int64),
        (np.float16, np.float32),
    ],
)
def test_asdf_array_dtype_roundtrip(dtype, promoted, tmp_path):
    rng = np.random.RandomState(2)
    if np.dtype(dtype).kind == "b":
        data = rng.rand(4, 3) > 0.5
    elif np.dtype(dtype).kind in "iu":
        data = rng.randint(0, 100, (4, 3)).astype(dtype)
    else:
        data = rng.randn(4, 3).astype(dtype)
    tree = asdf_roundtrip({"arr": data}, tmp_path)
    got = tree["arr"]
    assert got.dtype == np.dtype(promoted)
    assert_array_equal(got.astype(np.float64), data.astype(np.float64))


def test_asdf_complex_raises(tmp_path):
    with pytest.raises(ValueError, match="no ASDF block"):
        write_asdf({"z": np.ones((2, 2), np.complex64)},
                   tmp_path / "z.asdf")


def test_asdf_uint64_overflow_raises(tmp_path):
    data = np.array([np.iinfo(np.uint64).max], np.uint64)
    with pytest.raises(ValueError, match="int64 range"):
        write_asdf({"u": data}, tmp_path / "u.asdf")


@pytest.mark.parametrize("shape", [(), (5,), (2, 3, 4), (0, 3)])
def test_asdf_array_shapes(shape, tmp_path):
    data = np.arange(int(np.prod(shape)), dtype=np.float32).reshape(shape)
    tree = asdf_roundtrip({"arr": data}, tmp_path)
    assert tree["arr"].shape == shape
    assert_array_equal(tree["arr"], data)


def test_asdf_big_endian_input(tmp_path):
    data = np.arange(12, dtype=">f4").reshape(3, 4)
    tree = asdf_roundtrip({"arr": data}, tmp_path)
    assert_array_equal(tree["arr"], data)


def test_asdf_special_floats_and_nested_tree(tmp_path):
    tree_in = {
        "special": np.array([np.nan, np.inf, -np.inf, 0.0]),
        "nested": {
            "list": [1, 2.5, "three", True, None],
            "scalars": {
                "f16": np.float16(1.5),
                "u8": np.uint8(7),
                "i16": np.int16(-3),
                "np_bool": np.bool_(True),
                "np_str": np.str_("hello"),
            },
            "deeper": {"arrays": [np.ones(3, np.float32),
                                  np.zeros((2, 2))]},
        },
        "unicode": "π ≈ 3.14159 — ünïcødé",
    }
    tree = asdf_roundtrip(tree_in, tmp_path)
    got = np.asarray(tree["special"])
    assert np.isnan(got[0]) and np.isposinf(got[1]) and np.isneginf(got[2])
    assert tree["nested"]["list"] == [1, 2.5, "three", True, None]
    sc = tree["nested"]["scalars"]
    assert sc["f16"] == 1.5 and sc["u8"] == 7 and sc["i16"] == -3
    assert sc["np_bool"] is True and sc["np_str"] == "hello"
    assert_array_equal(tree["nested"]["deeper"]["arrays"][0],
                       np.ones(3, np.float32))
    assert tree["unicode"] == tree_in["unicode"]


def test_asdf_many_blocks(tmp_path):
    tree_in = {f"a{i}": np.full((3, 3), i, np.float32) for i in range(40)}
    tree = asdf_roundtrip(tree_in, tmp_path)
    for i in range(40):
        assert_array_equal(tree[f"a{i}"], tree_in[f"a{i}"])


def _craft_fits_image(tmp_path, raw, bitpix, extra_cards):
    """Byte-craft a minimal foreign FITS primary HDU."""
    cards = [
        ("SIMPLE", "T"),
        ("BITPIX", str(bitpix)),
        ("NAXIS", "2"),
        ("NAXIS1", str(raw.shape[1])),
        ("NAXIS2", str(raw.shape[0])),
    ] + extra_cards
    header = "".join(
        f"{key:<8s}= {value:>20s}".ljust(80) for key, value in cards
    )
    header += "END".ljust(80)
    header = header.ljust(-(-len(header) // 2880) * 2880)
    data = raw.tobytes()
    data += b"\x00" * ((-len(data)) % 2880)
    path = tmp_path / "foreign.fits"
    path.write_bytes(header.encode("ascii") + data)
    return path


@pytest.mark.parametrize(
    "bitpix,raw_dtype,bzero,expected_dtype",
    [
        (16, ">i2", 32768, np.uint16),
        (32, ">i4", 2**31, np.uint32),
        (64, ">i8", 2**63, np.uint64),
        (8, ">u1", -128, np.int8),
    ],
)
def test_foreign_bzero_unsigned_read(
    tmp_path, bitpix, raw_dtype, bzero, expected_dtype
):
    """astropy writes unsigned images through the standard BZERO
    offset; reading one back must recover the physical values."""
    info = np.iinfo(expected_dtype)
    physical = np.array(
        [[info.min, info.min + 3], [info.max - 3, info.max]],
        dtype=np.dtype(expected_dtype).newbyteorder(">")
        if np.dtype(expected_dtype).kind == "u" else expected_dtype,
    )
    if bitpix == 64:
        # float64 cannot hold 64-bit extremes; craft via modular uint64
        raw = (
            physical.astype(np.uint64) - np.uint64(bzero)
        ).astype(np.int64).astype(">i8")
    else:
        raw = (physical.astype(np.float64) - bzero).astype(raw_dtype)
    path = _craft_fits_image(
        tmp_path, raw, bitpix, [("BZERO", str(bzero)), ("BSCALE", "1")]
    )
    hdus = read_hdulist(path)
    got = hdus[0].data
    assert got.dtype == np.dtype(expected_dtype)
    assert_array_equal(got, physical.astype(expected_dtype))


def test_foreign_bscale_read(tmp_path):
    raw = np.array([[0, 1], [2, 3]], ">i2")
    path = _craft_fits_image(
        tmp_path, raw, 16, [("BZERO", "100.5"), ("BSCALE", "0.25")]
    )
    hdus = read_hdulist(path)
    assert_array_equal(
        hdus[0].data, 100.5 + 0.25 * raw.astype(np.float64)
    )


def test_no_bzero_reads_raw(tmp_path):
    raw = np.array([[-5, 6], [7, -8]], ">i2")
    path = _craft_fits_image(tmp_path, raw, 16, [])
    hdus = read_hdulist(path)
    assert_array_equal(hdus[0].data, raw.astype(np.int16))
