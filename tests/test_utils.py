"""Unit tests for the small utility modules."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from jolideco_tpu.utils.misc import (
    flatten_dict,
    format_class_str,
    recursive_update,
    to_str,
    unflatten_dict,
)
from jolideco_tpu.utils.table import Table


def test_flatten_unflatten_roundtrip():
    data = {"a": 1, "b": {"c": 2.5, "d": {"e": "x"}}}
    flat = flatten_dict(data)
    assert flat == {"a": 1, "b.c": 2.5, "b.d.e": "x"}
    assert unflatten_dict(flat) == data


def test_recursive_update():
    base = {"a": {"b": 1}, "c": 2}
    update = {"a": {"d": 3}, "asdf_library": {"skip": True}}
    out = recursive_update(base, update)
    assert out["a"] == {"b": 1, "d": 3}
    assert "asdf_library" not in out


def test_to_str_and_format():
    class Obj:
        def to_dict(self):
            return {"x": 1.23456, "nested": {"y": "z"}}

    text = format_class_str(Obj())
    assert "Obj" in text
    assert "1.235" in text
    assert "y" in text


def test_table_basics():
    table = Table(names=["a", "b", "filename"], dtype=[float, float, str])
    table.add_row({"a": 1.0, "b": 2.0, "filename": "f0"})
    table.add_row({"a": 3.0, "filename": ""})

    assert len(table) == 2
    assert_allclose(table["a"], [1.0, 3.0])
    assert np.isnan(table["b"][1])
    assert table[-1]["a"] == 3.0
    assert table[0]["filename"] == "f0"

    round_trip = Table.from_dict(table.to_dict())
    assert round_trip.colnames == table.colnames
    assert_allclose(round_trip["a"], table["a"])

    with pytest.raises(KeyError):
        table[object()]


def test_kernels_normalisation():
    from jolideco_tpu.utils.kernels import gaussian_kernel_2d, tophat_kernel_2d

    g = gaussian_kernel_2d(2.0)
    assert g.shape[0] % 2 == 1
    assert_allclose(g.sum(), 1.0, rtol=1e-10)
    # symmetric
    assert_allclose(g, g.T, rtol=1e-12)
    assert_allclose(g, g[::-1, ::-1], rtol=1e-12)

    t = tophat_kernel_2d(3.0, x_size=11, y_size=11)
    assert_allclose(t.sum(), 1.0, rtol=1e-10)
    # anti-aliased edge: values strictly between 0 and max exist
    interior = t[5, 5]
    assert ((t > 0) & (t < interior)).any()


def test_sympy_helper():
    sympy = pytest.importorskip("sympy")
    from jolideco_tpu.utils.sympy import concrete_expand_log

    import sympy as sp

    x = sp.IndexedBase("x")
    i = sp.Symbol("i", integer=True, positive=True)
    n = sp.Symbol("N", integer=True, positive=True)
    alpha = sp.Symbol("alpha", positive=True)

    like = sp.Product(alpha * sp.exp(-x[i] * alpha), (i, 1, n))
    expanded = concrete_expand_log(sp.log(like))
    assert isinstance(expanded, sp.Sum)


def test_enable_persistent_cache(tmp_path):
    import jax

    from jolideco_tpu import config as jt_config

    saved = jax.config.jax_compilation_cache_dir
    try:
        path = jt_config.enable_persistent_cache(tmp_path / "xla-cache")
        assert path.exists()
        assert jax.config.jax_compilation_cache_dir == str(path)
    finally:
        jax.config.update("jax_compilation_cache_dir", saved or "")


def test_inverse_cdf_norm_roundtrip():
    """InverseCDFImageNorm serialises its tabulated CDF (the reference
    raises NotImplementedError)."""
    import numpy as np
    from numpy.testing import assert_allclose

    from jolideco_tpu.utils.norms import ImageNorm, InverseCDFImageNorm

    rs = np.random.RandomState(0)
    norm = InverseCDFImageNorm.from_image(rs.gamma(2, size=(32, 32)),
                                          bins=50)
    data = norm.to_dict()
    assert data["type"] == "inverse-cdf"
    rebuilt = ImageNorm.from_dict(data)
    x = rs.gamma(2, size=(8, 8)).astype(np.float32)
    assert_allclose(np.asarray(norm(x)), np.asarray(rebuilt(x)), rtol=1e-6)


def test_image_norm_inverse_roundtrips():
    """inverse(call(x)) == x for every norm implementing inverse.

    Pins the corrected ATan inverse (the reference's is
    (pi/2)*tan(y), wrong for every input except ~0 and ignoring
    alpha — reference utils/norms.py:331; docs/migration.md note).
    """
    import jax.numpy as jnp
    from numpy.testing import assert_allclose

    from jolideco_tpu.utils.norms import (
        ASinhImageNorm,
        ATanImageNorm,
        FixedMaxImageNorm,
        IdentityImageNorm,
        LogImageNorm,
        PowerImageNorm,
        SigmoidImageNorm,
    )

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.gamma(2, size=(16, 16)), jnp.float32)
    norms = [
        IdentityImageNorm(),
        ASinhImageNorm(alpha=0.7, beta=1.3),
        FixedMaxImageNorm(max_value=7.0),
        SigmoidImageNorm(alpha=2.0),
        ATanImageNorm(alpha=1.0),
        ATanImageNorm(alpha=2.5),
        LogImageNorm(alpha=0.5),
        PowerImageNorm(alpha=2.0),
    ]
    for norm in norms:
        back = np.asarray(norm.inverse(norm(x)))
        assert_allclose(
            back, np.asarray(x), rtol=2e-3,
            err_msg=type(norm).__name__,
        )


def test_table_from_dict_ragged_columns():
    from jolideco_tpu.utils.table import Table

    table = Table.from_dict({"a": [1.0, 2.0], "b": [3.0]})
    assert len(table) == 2
    assert table["a"][1] == 2.0
    assert np.isnan(table["b"][1])


def test_gmm_from_registry_caller_kwargs_win():
    from jolideco_tpu.priors.patches.gmm import (
        GMM_REGISTRY,
        GaussianMixtureModel,
    )

    entry = dict(GMM_REGISTRY["builtin-8x8-v1"])
    # caller-supplied kwargs override the registry defaults
    gmm = GaussianMixtureModel.from_registry(
        "builtin-8x8-v1", **{k: v for k, v in entry.items() if False}
    )
    assert gmm.n_components > 0


def test_gmm_plot_grids_cover_all_components():
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    from jolideco_tpu.priors.patches.gmm import GaussianMixtureModel

    gmm = GaussianMixtureModel.from_registry("builtin-8x8-v1")
    k = gmm.n_components
    gmm.plot_mean_images(ncols=max(2, k - 1))  # forces a ragged grid
    fig = plt.gcf()
    visible = [ax for ax in fig.axes if ax.get_visible()]
    assert len(visible) == k
    plt.close("all")
