"""Kernel cross-checks against scipy / torch / sklearn.

Mirrors the reference's kernel test strategy (SURVEY.md §4): FFT
convolution vs scipy, resampling vs torch's F.interpolate / avg_pool2d /
grid_sample, patches vs manual numpy, GMM log-prob vs sklearn.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from jolideco_tpu.ops import (
    avg_pool,
    compute_precision_cholesky,
    convolve_fft,
    convolve_fft_precomputed,
    cycle_spin,
    cycle_spin_subpixel,
    extract_patches_at,
    fft_conv_shape,
    get_pixel_weights,
    gmm_log_prob_matrix,
    gmm_score,
    grid_weights,
    interp1d,
    kernel_fft,
    reconstruct_from_overlapping_patches,
    rescale_image,
    shift_image,
    sum_pool,
    upsample_bilinear,
    view_as_overlapping_patches,
    view_as_random_overlapping_patches,
)


@pytest.fixture
def rng():
    return np.random.RandomState(642020)


class TestConvolveFFT:
    def test_vs_scipy_odd_kernel(self, rng):
        from scipy.signal import fftconvolve

        image = rng.rand(32, 32).astype(np.float32)
        kernel = rng.rand(17, 17).astype(np.float32)
        expected = fftconvolve(image, kernel, mode="same")
        result = convolve_fft(jnp.asarray(image), jnp.asarray(kernel))
        assert_allclose(np.asarray(result), expected, atol=1e-4)

    def test_vs_scipy_even_kernel(self, rng):
        # Even kernels exercise the (kh-1)//2 center convention that the
        # reference's _centered crop uses (utils/torch.py:337-344).
        from scipy.signal import fftconvolve

        image = rng.rand(32, 32).astype(np.float32)
        kernel = rng.rand(8, 8).astype(np.float32)
        full = fftconvolve(image, kernel, mode="full")
        # centered crop as the reference does it
        start = (np.array(full.shape) - 32) // 2
        expected = full[start[0] : start[0] + 32, start[1] : start[1] + 32]
        result = convolve_fft(jnp.asarray(image), jnp.asarray(kernel))
        assert_allclose(np.asarray(result), expected, atol=1e-4)

    def test_vs_torch_reference_semantics(self, rng):
        # direct check against the torch implementation the reference uses
        import torch

        image = rng.rand(24, 28).astype(np.float32)
        kernel = rng.rand(9, 11).astype(np.float32)

        im_t = torch.from_numpy(image[None, None])
        k_t = torch.from_numpy(kernel[None, None])
        shape = [24 + 9 - 1, 28 + 11 - 1]
        image_ft = torch.fft.rfft2(im_t, s=shape)
        kernel_ft = torch.fft.rfft2(k_t, s=shape)
        res = torch.fft.irfft2(image_ft * kernel_ft, s=shape)
        # centered crop
        start = [(shape[0] - 24) // 2, (shape[1] - 28) // 2]
        expected = res[0, 0, start[0] : start[0] + 24, start[1] : start[1] + 28]

        result = convolve_fft(jnp.asarray(image), jnp.asarray(kernel))
        assert_allclose(np.asarray(result), expected.numpy(), atol=1e-4)

    def test_precomputed_padded_shape(self, rng):
        # padding the FFT shape beyond the minimum must not change results
        # (needed for ragged multi-observation PSF stacks)
        image = rng.rand(32, 32).astype(np.float32)
        kernel = rng.rand(17, 17).astype(np.float32)
        base = convolve_fft(jnp.asarray(image), jnp.asarray(kernel))

        fft_shape = (64, 72)
        kft = kernel_fft(jnp.asarray(kernel), (32, 32), fft_shape)
        padded = convolve_fft_precomputed(jnp.asarray(image), kft, fft_shape)
        assert_allclose(np.asarray(padded), np.asarray(base), atol=1e-4)

    def test_flux_conservation(self, rng):
        image = np.zeros((32, 32), dtype=np.float32)
        image[16, 16] = 1.0
        kernel = rng.rand(13, 13).astype(np.float32)
        kernel /= kernel.sum()
        result = convolve_fft(jnp.asarray(image), jnp.asarray(kernel))
        assert_allclose(np.asarray(result).sum(), 1.0, rtol=1e-5)


class TestResampling:
    def test_upsample_vs_torch(self, rng):
        import torch
        import torch.nn.functional as F

        image = rng.rand(1, 1, 16, 16).astype(np.float32)
        expected = F.interpolate(
            torch.from_numpy(image), scale_factor=2, mode="bilinear"
        ).numpy()
        result = upsample_bilinear(jnp.asarray(image), 2)
        assert_allclose(np.asarray(result), expected, atol=1e-5)

    def test_upsample_factor3_vs_torch(self, rng):
        import torch
        import torch.nn.functional as F

        image = rng.rand(1, 1, 8, 8).astype(np.float32)
        expected = F.interpolate(
            torch.from_numpy(image), scale_factor=3, mode="bilinear"
        ).numpy()
        result = upsample_bilinear(jnp.asarray(image), 3)
        assert_allclose(np.asarray(result), expected, atol=1e-5)

    def test_sum_pool_vs_torch(self, rng):
        import torch
        import torch.nn.functional as F

        image = rng.rand(1, 1, 16, 16).astype(np.float32)
        expected = F.avg_pool2d(
            torch.from_numpy(image), kernel_size=2, divisor_override=1
        ).numpy()
        result = sum_pool(jnp.asarray(image), 2)
        assert_allclose(np.asarray(result), expected, atol=1e-5)

    def test_avg_pool(self, rng):
        image = rng.rand(8, 8).astype(np.float32)
        result = avg_pool(jnp.asarray(image), 2)
        assert_allclose(np.asarray(result)[0, 0], image[:2, :2].mean(), rtol=1e-6)

    def test_shift_vs_torch_grid_sample(self, rng):
        import torch
        import torch.nn.functional as F

        image = rng.rand(1, 1, 16, 16).astype(np.float32)
        shift_xy = np.array([[0.7, -1.3]], dtype=np.float32)

        im_t = torch.from_numpy(image)
        s_t = torch.from_numpy(shift_xy)
        size = im_t.size()
        scale = 2 * 1.0 / torch.tensor([[size[-1]], [size[-2]]])
        diag = torch.eye(2)
        theta = torch.cat([diag, scale * s_t.T], dim=1)[None]
        grid = F.affine_grid(theta=theta, size=size, align_corners=False)
        expected = F.grid_sample(im_t, grid=grid, align_corners=False).numpy()

        result = shift_image(jnp.asarray(image), jnp.asarray(shift_xy), scale=1.0)
        assert_allclose(np.asarray(result), expected, atol=1e-5)

    def test_shift_with_scale_vs_torch(self, rng):
        import torch
        import torch.nn.functional as F

        image = rng.rand(1, 1, 20, 12).astype(np.float32)
        shift_xy = np.array([[0.25, 0.5]], dtype=np.float32)
        upsampling = 2.0

        im_t = torch.from_numpy(image)
        s_t = torch.from_numpy(shift_xy)
        size = im_t.size()
        scale = 2 * upsampling / torch.tensor([[size[-1]], [size[-2]]])
        diag = torch.eye(2)
        theta = torch.cat([diag, scale * s_t.T], dim=1)[None]
        grid = F.affine_grid(theta=theta, size=size, align_corners=False)
        expected = F.grid_sample(im_t, grid=grid, align_corners=False).numpy()

        result = shift_image(
            jnp.asarray(image), jnp.asarray(shift_xy), scale=upsampling
        )
        assert_allclose(np.asarray(result), expected, atol=1e-5)

    def test_rescale_vs_torch_grid_sample(self, rng):
        import torch
        import torch.nn.functional as F

        image = rng.rand(1, 1, 17, 17).astype(np.float32)
        factor = 1.3

        im_t = torch.from_numpy(image)
        diag = torch.eye(2)
        theta = torch.cat([diag / factor, torch.tensor([[0.0], [0.0]])], dim=1)[
            None
        ]
        grid = F.affine_grid(theta=theta, size=im_t.size(), align_corners=False)
        expected = F.grid_sample(im_t, grid=grid, align_corners=False).numpy()

        result = rescale_image(jnp.asarray(image), factor)
        assert_allclose(np.asarray(result), expected, atol=1e-5)


class TestPatches:
    def test_view_as_overlapping_patches_vs_manual(self, rng):
        image = rng.rand(16, 16).astype(np.float32)
        patches = view_as_overlapping_patches(jnp.asarray(image), (4, 4), stride=2)
        # manual
        expected = []
        for i in range(0, 13, 2):
            for j in range(0, 13, 2):
                expected.append(image[i : i + 4, j : j + 4].ravel())
        assert_allclose(np.asarray(patches), np.stack(expected), rtol=1e-6)

    def test_view_as_overlapping_patches_vs_torch_unfold(self, rng):
        import torch

        image = rng.rand(1, 1, 16, 16).astype(np.float32)
        im_t = torch.from_numpy(image)
        windows = im_t.unfold(2, 8, 4).unfold(3, 8, 4)
        expected = torch.reshape(windows, (-1, 64)).numpy()

        patches = view_as_overlapping_patches(jnp.asarray(image), (8, 8), stride=4)
        assert_allclose(np.asarray(patches), expected, rtol=1e-6)

    def test_jittered_patches_shapes(self, rng):
        image = jnp.asarray(rng.rand(32, 32).astype(np.float32))
        key = jax.random.PRNGKey(0)
        patches = view_as_random_overlapping_patches(key, image, (8, 8), 4)
        assert patches.shape[1] == 64
        # all patches must come from within the image (gather never OOB)
        assert np.isfinite(np.asarray(patches)).all()

    def test_extract_patches_at(self, rng):
        image = rng.rand(16, 16).astype(np.float32)
        patches = extract_patches_at(
            jnp.asarray(image), jnp.array([0, 5]), jnp.array([2, 7]), (3, 3)
        )
        assert_allclose(np.asarray(patches)[0], image[0:3, 2:5].ravel(), rtol=1e-6)
        assert_allclose(np.asarray(patches)[1], image[5:8, 7:10].ravel(), rtol=1e-6)

    def test_pixel_weights_sum(self):
        weights = get_pixel_weights((8, 8), stride=4)
        assert weights.shape == (8, 8)
        assert_allclose(weights.sum(), 16.0, rtol=1e-6)

    def test_reconstruct_round_trip(self, rng):
        # reconstructing from non-overlapping patches recovers the image
        image = rng.rand(16, 16).astype(np.float64)
        patches = np.asarray(
            view_as_overlapping_patches(jnp.asarray(image), (4, 4), stride=4)
        ).reshape(-1, 4, 4)
        # weights with stride=patch sum to stride² and are uniform
        reco = reconstruct_from_overlapping_patches(patches, (16, 16), stride=4)
        assert_allclose(reco, image, rtol=1e-5)


class TestWarps:
    def test_grid_weights_centroid(self):
        x = jnp.arange(5.0)[None, :]
        y = jnp.arange(5.0)[:, None]
        w = grid_weights(x, y, 2.3, 1.7)
        w = np.asarray(w)
        assert_allclose(w.sum(), 1.0, rtol=1e-6)
        assert_allclose((w * np.arange(5.0)[None, :]).sum(), 2.3, rtol=1e-6)
        assert_allclose((w * np.arange(5.0)[:, None]).sum(), 1.7, rtol=1e-6)

    def test_cycle_spin_deterministic(self, rng):
        image = jnp.asarray(rng.rand(1, 1, 16, 16).astype(np.float32))
        key = jax.random.PRNGKey(42)
        rolled, shifts = cycle_spin(key, image, (8, 8))
        unrolled = jnp.roll(rolled, shift=(-shifts[0], -shifts[1]), axis=(-2, -1))
        assert_allclose(np.asarray(unrolled), np.asarray(image), rtol=1e-6)

    def test_cycle_spin_subpixel_conserves_interior(self, rng):
        image = jnp.asarray(np.ones((1, 1, 16, 16), np.float32))
        key = jax.random.PRNGKey(3)
        spun = cycle_spin_subpixel(key, image)
        # interior pixels of a constant image stay constant
        assert_allclose(np.asarray(spun)[0, 0, 2:-2, 2:-2], 1.0, rtol=1e-5)

    def test_interp1d_vs_torch(self, rng):
        import torch

        xp = np.linspace(0, 1, 11).astype(np.float32)
        fp = (xp**2).astype(np.float32)
        x = rng.rand(20).astype(np.float32)

        idx = torch.clip(
            torch.searchsorted(torch.from_numpy(xp), torch.from_numpy(x)), 0, 9
        )
        y0, y1 = torch.from_numpy(fp)[idx - 1], torch.from_numpy(fp)[idx]
        x0, x1 = torch.from_numpy(xp)[idx - 1], torch.from_numpy(xp)[idx]
        weights = (torch.from_numpy(x) - x0) / (x1 - x0)
        expected = torch.lerp(y0, y1, weights).numpy()

        result = interp1d(jnp.asarray(x), jnp.asarray(xp), jnp.asarray(fp))
        assert_allclose(np.asarray(result), expected, atol=1e-6)


class TestGMMScore:
    @pytest.fixture
    def gmm_arrays(self, rng):
        from sklearn.datasets import make_spd_matrix

        k, d = 5, 16
        means = rng.rand(k, d).astype(np.float64)
        covariances = np.stack(
            [make_spd_matrix(d, random_state=i) for i in range(k)]
        )
        weights = rng.dirichlet(np.ones(k))
        return means, covariances, weights

    def _prepare(self, means, covariances, weights, pixel_weights=None):
        prec_chol = compute_precision_cholesky(covariances)
        means_prec = np.einsum("kd,kde->ke", means, prec_chol)
        log_det = np.array(
            [np.sum(np.log(np.diag(pc))) for pc in prec_chol]
        )
        log_weights = np.log(weights)
        d = means.shape[1]
        if pixel_weights is None:
            pixel_weights = np.ones(d)
        return tuple(
            jnp.asarray(a, jnp.float32)
            for a in (means_prec, prec_chol, log_det, log_weights, pixel_weights)
        )

    def test_log_prob_vs_sklearn(self, rng, gmm_arrays):
        from sklearn.mixture import GaussianMixture

        means, covariances, weights = gmm_arrays
        k, d = means.shape

        gmm = GaussianMixture(n_components=k, covariance_type="full")
        gmm.means_ = means
        gmm.covariances_ = covariances
        gmm.weights_ = weights
        gmm.precisions_cholesky_ = compute_precision_cholesky(covariances)

        x = rng.rand(40, d).astype(np.float64)
        expected = gmm._estimate_weighted_log_prob(x)

        arrays = self._prepare(means, covariances, weights)
        result = gmm_log_prob_matrix(jnp.asarray(x, jnp.float32), *arrays)
        assert_allclose(np.asarray(result), expected, rtol=2e-3, atol=1e-3)

    def test_score_matches_matrix_max(self, rng, gmm_arrays):
        means, covariances, weights = gmm_arrays
        d = means.shape[1]
        pixel_weights = rng.rand(d).astype(np.float64) + 0.5
        arrays = self._prepare(means, covariances, weights, pixel_weights)
        x = jnp.asarray(rng.rand(40, d), jnp.float32)

        matrix = gmm_log_prob_matrix(x, *arrays)
        values, argmax = gmm_score(x, *arrays)
        assert_allclose(
            np.asarray(values), np.asarray(matrix).max(axis=1), rtol=1e-5
        )
        assert (np.asarray(argmax) == np.asarray(matrix).argmax(axis=1)).all()

    def test_score_marginalize_matches_logsumexp(self, rng, gmm_arrays):
        from scipy.special import logsumexp

        means, covariances, weights = gmm_arrays
        d = means.shape[1]
        arrays = self._prepare(means, covariances, weights)
        x = jnp.asarray(rng.rand(40, d), jnp.float32)

        matrix = np.asarray(gmm_log_prob_matrix(x, *arrays))
        values, _ = gmm_score(x, *arrays, marginalize=True)
        assert_allclose(np.asarray(values), logsumexp(matrix, axis=1), rtol=1e-5)

    def test_score_gradient_vs_autodiff_of_matrix(self, rng, gmm_arrays):
        means, covariances, weights = gmm_arrays
        d = means.shape[1]
        pixel_weights = rng.rand(d).astype(np.float64) + 0.5
        arrays = self._prepare(means, covariances, weights, pixel_weights)
        x = jnp.asarray(rng.rand(20, d), jnp.float32)

        def loss_custom(x):
            values, _ = gmm_score(x, *arrays)
            return jnp.sum(values)

        def loss_matrix(x):
            return jnp.sum(jnp.max(gmm_log_prob_matrix(x, *arrays), axis=1))

        g_custom = jax.grad(loss_custom)(x)
        g_matrix = jax.grad(loss_matrix)(x)
        assert_allclose(np.asarray(g_custom), np.asarray(g_matrix), atol=1e-4)

    def test_score_gradient_marginalize(self, rng, gmm_arrays):
        means, covariances, weights = gmm_arrays
        d = means.shape[1]
        arrays = self._prepare(means, covariances, weights)
        x = jnp.asarray(rng.rand(20, d), jnp.float32)

        def loss_custom(x):
            values, _ = gmm_score(x, *arrays, marginalize=True)
            return jnp.sum(values)

        def loss_matrix(x):
            return jnp.sum(
                jax.scipy.special.logsumexp(gmm_log_prob_matrix(x, *arrays), axis=1)
            )

        g_custom = jax.grad(loss_custom)(x)
        g_matrix = jax.grad(loss_matrix)(x)
        assert_allclose(np.asarray(g_custom), np.asarray(g_matrix), atol=1e-4)


class TestPrecisionCholesky:
    def test_vs_sklearn(self, rng):
        from sklearn.datasets import make_spd_matrix
        from sklearn.mixture._gaussian_mixture import _compute_precision_cholesky

        covariances = np.stack(
            [make_spd_matrix(8, random_state=i) for i in range(3)]
        )
        expected = _compute_precision_cholesky(covariances, "full")
        result = compute_precision_cholesky(covariances)
        assert_allclose(result, expected, rtol=1e-10)


def test_grouped_patches_same_set_as_row_major():
    """Grouped extraction yields the same patch SET (different order)
    as the row-major view, with matching corners, and a scatter-free
    transpose (overlap-add equals the row-major adjoint)."""
    from jolideco_tpu.ops.patches import (
        grouped_patch_corners,
        view_as_overlapping_patches,
        view_as_overlapping_patches_grouped,
    )

    rs = np.random.RandomState(0)
    for h, w in [(32, 32), (33, 41)]:
        img = jnp.asarray(rs.rand(h, w).astype(np.float32))
        row = np.asarray(view_as_overlapping_patches(img, (8, 8), stride=4))
        grp = np.asarray(
            view_as_overlapping_patches_grouped(img, (8, 8), stride=4)
        )
        corners = grouped_patch_corners((h, w), (8, 8), 4)
        assert grp.shape == row.shape
        # map grouped rows to row-major positions via corners
        n_x = (w - 8) // 4 + 1
        pos = (corners[:, 0] // 4) * n_x + corners[:, 1] // 4
        assert len(np.unique(pos)) == len(pos)
        reordered = np.empty_like(grp)
        reordered[pos] = grp
        np.testing.assert_array_equal(reordered, row)

    # adjoint equality: grad of sum(w * patches) matches both paths
    img = jnp.asarray(rs.rand(32, 32).astype(np.float32))
    wvec = jnp.asarray(rs.rand(64).astype(np.float32))
    g_row = jax.grad(
        lambda x: (view_as_overlapping_patches(x, (8, 8), 4) * wvec).sum()
    )(img)
    g_grp = jax.grad(
        lambda x: (
            view_as_overlapping_patches_grouped(x, (8, 8), 4) * wvec
        ).sum()
    )(img)
    np.testing.assert_allclose(np.asarray(g_grp), np.asarray(g_row),
                               rtol=1e-6)


def test_convolve_fft_precomputed_custom_vjp_matches_autodiff():
    """The conjugate-spectrum custom VJP equals XLA's mechanical
    transpose of the FFT graph (correlation == adjoint of conv)."""
    from jolideco_tpu.ops.fft import (
        _convolve_fft_precomputed_impl,
        convolve_fft_precomputed,
        kernel_fft,
    )

    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.rand(24, 24).astype(np.float32))
    kernel = rs.rand(9, 9).astype(np.float32)
    fft_shape = (32, 32)
    kft = kernel_fft(kernel, image.shape, fft_shape)
    g = jnp.asarray(rs.rand(24, 24).astype(np.float32))

    def loss_custom(x):
        return jnp.sum(convolve_fft_precomputed(x, kft, fft_shape) * g)

    def loss_auto(x):
        return jnp.sum(_convolve_fft_precomputed_impl(x, kft, fft_shape) * g)

    assert_allclose(
        np.asarray(jax.grad(loss_custom)(image)),
        np.asarray(jax.grad(loss_auto)(image)),
        rtol=1e-5, atol=1e-6,
    )


def test_convolve_fft_packed_pair_custom_vjp_matches_autodiff():
    from jolideco_tpu.ops.fft import (
        _convolve_fft_packed_pair_impl,
        convolve_fft_packed_pair,
        kernel_fft_pair,
    )

    rs = np.random.RandomState(1)
    shape = (20, 20)
    x0 = jnp.asarray(rs.rand(*shape).astype(np.float32))
    x1 = jnp.asarray(rs.rand(*shape).astype(np.float32))
    k0 = rs.rand(7, 7).astype(np.float32)
    k1 = rs.rand(5, 5).astype(np.float32)
    fft_shape = (27, 27)  # odd size exercises the spectrum flip+roll
    a, b = kernel_fft_pair(k0, k1, shape, fft_shape)
    g0 = jnp.asarray(rs.rand(*shape).astype(np.float32))
    g1 = jnp.asarray(rs.rand(*shape).astype(np.float32))

    def loss_custom(x0, x1):
        y0, y1 = convolve_fft_packed_pair(x0, x1, a, b, fft_shape)
        return jnp.sum(y0 * g0) + jnp.sum(y1 * g1)

    def loss_auto(x0, x1):
        y0, y1 = _convolve_fft_packed_pair_impl(x0, x1, a, b, fft_shape)
        return jnp.sum(y0 * g0) + jnp.sum(y1 * g1)

    gc = jax.grad(loss_custom, argnums=(0, 1))(x0, x1)
    ga = jax.grad(loss_auto, argnums=(0, 1))(x0, x1)
    for c, r in zip(gc, ga):
        assert_allclose(np.asarray(c), np.asarray(r), rtol=1e-4, atol=1e-5)

    # forward-over-reverse (the Hessian probe) stays differentiable
    ones = (jnp.ones_like(x0), jnp.ones_like(x1))
    _, hvp = jax.jvp(
        jax.grad(loss_custom, argnums=(0, 1)), (x0, x1), ones
    )
    assert np.isfinite(np.asarray(hvp[0])).all()


def test_jittered_patches_stay_in_bounds():
    """Jittered corners clip into [0, n - p]: image sizes where the
    raw grid jitters past the edge (the reference xfails these as
    known-broken) must produce real patches, not JAX's silent
    OOB-clamped duplicated-edge gathers."""
    import jax

    from jolideco_tpu.ops.patches import (
        random_patch_indices,
        view_as_random_overlapping_patches,
    )

    for n in (101, 130, 128):
        idy, idx = random_patch_indices(
            jax.random.PRNGKey(0), (n, n), shape=(8, 8), stride=4
        )
        assert int(idy.min()) >= 0 and int(idx.min()) >= 0
        assert int(idy.max()) <= n - 8 and int(idx.max()) <= n - 8

        image = jnp.arange(n * n, dtype=jnp.float32).reshape(n, n)
        patches = view_as_random_overlapping_patches(
            jax.random.PRNGKey(1), image, shape=(8, 8), stride=4
        )
        assert np.isfinite(np.asarray(patches)).all()


def test_kernel_mode_validation_and_tophat_sizing():
    from jolideco_tpu.utils.kernels import (
        gaussian_kernel_2d,
        tophat_kernel_2d,
    )

    with pytest.raises(ValueError, match="mode"):
        gaussian_kernel_2d(2.0, x_size=9, mode="integrate")
    with pytest.raises(ValueError, match="mode"):
        tophat_kernel_2d(2.0, mode="oversampled")

    # astropy sizing: 2*2.6 = 5.2 rounds up to 7, not down to 5
    kernel = tophat_kernel_2d(2.6)
    assert kernel.shape == (7, 7)
    # the outer ring is present (corner-adjacent ring pixels nonzero)
    assert kernel[0, 3] > 0


def test_dist_convolve_fft_rejects_2d_input():
    import jax

    from jolideco_tpu.ops.dist_fft import dist_convolve_fft

    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = jax.sharding.Mesh(devices, ("obs", "row"))
    x = jnp.ones((16, 16))
    kft = jnp.ones((20, 12), jnp.complex64)
    with pytest.raises(ValueError, match="ndim >= 3"):
        dist_convolve_fft(x, kft, (20, 22), mesh)
