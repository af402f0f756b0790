"""WCS persistence and TAN projection (VERDICT round-1 task #5).

Reference behaviour: component WCS serialised into FITS headers and
restored (`/root/reference/jolideco/utils/io/fits.py:58-59,131-132,165`).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from jolideco_tpu import FluxComponents, SpatialFluxComponent, UniformPrior
from jolideco_tpu.models import SparseSpatialFluxComponent
from jolideco_tpu.utils.wcs import SimpleWCS, wcs_from_header, wcs_to_header

HEADER = {
    "CTYPE1": "RA---TAN",
    "CTYPE2": "DEC--TAN",
    "CRVAL1": 83.633,
    "CRVAL2": 22.0145,
    "CRPIX1": 16.5,
    "CRPIX2": 16.5,
    "CDELT1": -0.0002777,
    "CDELT2": 0.0002777,
    "CUNIT1": "deg",
    "CUNIT2": "deg",
    "RADESYS": "ICRS",
}


def make_component(wcs):
    return SpatialFluxComponent.from_numpy(
        flux=np.random.RandomState(0).gamma(2, size=(32, 32)),
        prior=UniformPrior(),
        wcs=wcs,
    )


def test_tan_projection_reference_point():
    wcs = SimpleWCS(HEADER)
    # the reference pixel maps to CRVAL (CRPIX is 1-based)
    lon, lat = wcs.pixel_to_world(HEADER["CRPIX1"] - 1, HEADER["CRPIX2"] - 1)
    assert_allclose([lon, lat], [HEADER["CRVAL1"], HEADER["CRVAL2"]],
                    atol=1e-12)
    x, y = wcs.world_to_pixel(HEADER["CRVAL1"], HEADER["CRVAL2"])
    assert_allclose([x, y], [15.5, 15.5], atol=1e-9)


def test_tan_projection_local_scale_and_roundtrip():
    wcs = SimpleWCS(HEADER)
    # one pixel along y at the reference point ~ CDELT2 deg of dec
    _, lat = wcs.pixel_to_world(15.5, 16.5)
    assert_allclose(lat - HEADER["CRVAL2"], HEADER["CDELT2"], rtol=1e-6)

    xs = np.array([0.0, 5.0, 31.0, 12.3])
    ys = np.array([0.0, 30.0, 2.0, 27.9])
    lon, lat = wcs.pixel_to_world(xs, ys)
    x2, y2 = wcs.world_to_pixel(lon, lat)
    assert_allclose(x2, xs, atol=1e-7)
    assert_allclose(y2, ys, atol=1e-7)


@pytest.mark.parametrize("fmt,suffix", [("fits", ".fits"), ("asdf", ".asdf"),
                                        ("yaml", ".yaml")])
def test_component_wcs_roundtrip(tmp_path, fmt, suffix):
    """CRVAL/CRPIX/CDELT/CTYPE survive a write/read cycle in every
    format (round 1 dropped the WCS on write)."""
    component = make_component(SimpleWCS(HEADER))
    path = tmp_path / f"component{suffix}"
    component.write(path, format=fmt)
    back = SpatialFluxComponent.read(path, format=fmt)
    assert back.wcs is not None
    cards = back.wcs.to_header()
    for key in ("CRVAL1", "CRVAL2", "CRPIX1", "CRPIX2", "CDELT1", "CDELT2"):
        assert_allclose(cards[key], HEADER[key], rtol=1e-10)
    for key in ("CTYPE1", "CTYPE2"):
        assert cards[key] == HEADER[key]


def test_sparse_component_wcs_roundtrip(tmp_path):
    component = SparseSpatialFluxComponent.from_numpy(
        flux=np.array([1.0, 2.0]),
        x_pos=np.array([3.0, 9.0]),
        y_pos=np.array([5.0, 11.0]),
        shape=(32, 32),
        wcs=SimpleWCS(HEADER),
    )
    path = tmp_path / "sparse.fits"
    component.write(path)
    back = SparseSpatialFluxComponent.read(path)
    assert back.wcs is not None
    assert_allclose(back.wcs.to_header()["CRVAL1"], HEADER["CRVAL1"])


def test_result_wcs_populated_and_persisted(tmp_path):
    """MAPDeconvolverResult carries the component WCS and the result
    file round-trips it (round 1 built results with wcs=None)."""
    from jolideco_tpu import MAPDeconvolver, MAPDeconvolverResult
    from jolideco_tpu.data import point_source_gauss_psf

    dataset = point_source_gauss_psf(
        random_state=np.random.RandomState(642020)
    )
    components = FluxComponents()
    components["flux"] = make_component(SimpleWCS(HEADER))
    deco = MAPDeconvolver(n_epochs=3, display_progress=False)
    result = deco.run(datasets={"obs": dataset}, components=components)
    assert result.wcs is not None
    assert_allclose(result.wcs.to_header()["CRVAL1"], HEADER["CRVAL1"])

    path = tmp_path / "result.fits"
    result.write(path)
    back = MAPDeconvolverResult.read(path)
    assert back.wcs is not None
    assert_allclose(back.wcs.to_header()["CRVAL1"], HEADER["CRVAL1"])


def test_duck_typed_astropy_like():
    """Anything exposing to_header() (e.g. astropy.wcs.WCS) works."""
    class FakeAstropyWCS:
        def to_header(self):
            return dict(HEADER)

    cards = wcs_to_header(FakeAstropyWCS())
    wcs = wcs_from_header(cards)
    assert isinstance(wcs, SimpleWCS)
    assert cards["CTYPE1"] == "RA---TAN"


def test_tan_great_circle_invariant():
    """TAN exactness at large offsets: the angular separation from the
    reference point equals arctan(r) for tangent-plane radius r, for
    any CD rotation — an invariant independent of the implementation's
    own spherical-rotation algebra."""
    for rot_deg in (0.0, 30.0, 137.0):
        rot = np.deg2rad(rot_deg)
        scale = 0.05  # deg/pix: large offsets in a 32-pixel span
        cd = scale * np.array(
            [[-np.cos(rot), np.sin(rot)], [np.sin(rot), np.cos(rot)]]
        )
        header = dict(HEADER)
        header.pop("CDELT1"), header.pop("CDELT2")
        header.update(
            CD1_1=cd[0, 0], CD1_2=cd[0, 1],
            CD2_1=cd[1, 0], CD2_2=cd[1, 1],
        )
        wcs = SimpleWCS(header)
        lon0, lat0 = np.deg2rad([HEADER["CRVAL1"], HEADER["CRVAL2"]])
        for dx, dy in [(10.0, 0.0), (0.0, 14.0), (-9.0, 12.0),
                       (300.0, -200.0)]:
            x = HEADER["CRPIX1"] - 1 + dx
            y = HEADER["CRPIX2"] - 1 + dy
            lon, lat = wcs.pixel_to_world(x, y)
            lon, lat = np.deg2rad([lon, lat])
            # great-circle separation (vincenty form, stable everywhere)
            dlon = lon - lon0
            sep = np.arctan2(
                np.hypot(
                    np.cos(lat) * np.sin(dlon),
                    np.cos(lat0) * np.sin(lat)
                    - np.sin(lat0) * np.cos(lat) * np.cos(dlon),
                ),
                np.sin(lat0) * np.sin(lat)
                + np.cos(lat0) * np.cos(lat) * np.cos(dlon),
            )
            r = np.deg2rad(scale) * np.hypot(dx, dy)
            assert_allclose(sep, np.arctan(r), rtol=1e-10, atol=1e-12)
            # and the inverse recovers the pixel
            x2, y2 = wcs.world_to_pixel(*np.rad2deg([lon, lat]))
            assert_allclose([x2, y2], [x, y], atol=1e-6)
