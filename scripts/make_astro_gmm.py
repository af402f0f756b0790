"""Fit the flagship-shaped K=200 8x8 patch GMM on astro-style patches.

The reference's flagship priors are EPLL GMMs fitted on real images
(``zoran-weiss``, ``jwst-cas-a-v0.1`` — reference
``priors/patches/gmm.py:310-389,493-508``). This environment has no
network access to the published weights, so this script fits a GMM of
the same shape (K=200 components, 64-d patches, Zoran-Weiss
subtract-mean normalisation) on a physically-motivated synthetic
corpus whose statistics match astronomical imagery:

- **power-law Gaussian random fields** (log-intensity with P(k) ~
  k^-beta, beta in 2.5-3.5) — the dominant second-order statistic of
  diffuse astrophysical emission;
- **supernova-remnant morphology**: thin shells, curved filaments and
  partial arcs over varying radii/widths;
- **PSF-convolved point-source fields** at varying density and PSF
  width (the morphology MAP deconvolution actually meets);
- **blob clusters / extended sources** with gradients.

Each scene is max-normalised before patch extraction (matching the
reference's image-norm stage), and patches are mean-subtracted.

Run from the repo root (takes ~10-20 min on CPU):

    python scripts/make_astro_gmm.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SIZE = 128
PATCH = 8
K = 200
N_PATCHES = 160_000


def power_law_field(rng, size, beta):
    """Positive random field with a power-law spatial spectrum."""
    white = rng.normal(size=(size, size))
    ky = np.fft.fftfreq(size)[:, None]
    kx = np.fft.rfftfreq(size)[None, :]
    k = np.hypot(ky, kx)
    k[0, 0] = 1.0
    amp = k ** (-beta / 2.0)
    amp[0, 0] = 0.0
    field = np.fft.irfft2(np.fft.rfft2(white) * amp, s=(size, size))
    field = (field - field.mean()) / (field.std() + 1e-12)
    return np.exp(rng.uniform(0.5, 1.5) * field)


def gaussian_psf(size, sigma):
    half = size // 2
    yy, xx = np.mgrid[-half:half + 1, -half:half + 1]
    psf = np.exp(-(xx**2 + yy**2) / (2 * sigma**2))
    return psf / psf.sum()


def convolve(image, psf):
    from jolideco_tpu.ops.fft import convolve_fft_numpy

    return convolve_fft_numpy(image[None, None], psf[None, None])[0, 0]


def snr_scene(rng, size):
    """Shells, arcs and filaments (supernova-remnant morphology)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    image = np.zeros((size, size))
    for _ in range(rng.poisson(2) + 1):
        cx, cy = rng.uniform(0.2 * size, 0.8 * size, 2)
        radius = rng.uniform(0.1, 0.4) * size
        width = rng.uniform(0.01, 0.05) * size
        r = np.hypot(xx - cx, yy - cy)
        phi = np.arctan2(yy - cy, xx - cx)
        arc = np.exp(-0.5 * ((r - radius) / width) ** 2)
        phi0 = rng.uniform(-np.pi, np.pi)
        extent = rng.uniform(0.5, np.pi)
        arc *= np.exp(
            -0.5 * (np.angle(np.exp(1j * (phi - phi0))) / extent) ** 2
        )
        image += rng.uniform(0.3, 1.0) * arc
    # a few embedded knots
    for _ in range(rng.poisson(4)):
        x0, y0 = rng.uniform(0, size, 2)
        s = rng.uniform(0.8, 2.5)
        image += rng.uniform(0.2, 1.5) * np.exp(
            -((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * s**2)
        )
    return image


def point_field(rng, size):
    image = np.zeros((size, size))
    n = rng.poisson(rng.uniform(5, 60))
    for _ in range(n):
        x0, y0 = rng.randint(0, size, 2)
        image[y0, x0] += rng.lognormal(0.0, 1.0)
    return image


def blob_scene(rng, size):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    gx, gy = rng.uniform(-1, 1, 2)
    image = 0.2 + 0.2 * (gx * xx + gy * yy) / size - min(0.0, gx + gy) * 0.2
    for _ in range(rng.poisson(5) + 1):
        x0, y0 = rng.uniform(0, size, 2)
        sx, sy = rng.uniform(1.5, 12.0, 2)
        angle = rng.uniform(0, np.pi)
        c, s = np.cos(angle), np.sin(angle)
        u = c * (xx - x0) + s * (yy - y0)
        v = -s * (xx - x0) + c * (yy - y0)
        image += rng.uniform(0.2, 1.2) * np.exp(
            -0.5 * ((u / sx) ** 2 + (v / sy) ** 2)
        )
    return image


def make_scenes(rng, n_scenes=400):
    scenes = []
    makers = [
        lambda: power_law_field(rng, SIZE, rng.uniform(2.5, 3.5)),
        lambda: snr_scene(rng, SIZE),
        lambda: point_field(rng, SIZE),
        lambda: blob_scene(rng, SIZE),
    ]
    for i in range(n_scenes):
        scene = makers[i % len(makers)]()
        # instrument blur at varying resolution
        sigma = rng.uniform(0.8, 3.0)
        scene = convolve(scene, gaussian_psf(17, sigma))
        scene = np.clip(scene, 0, None)
        scenes.append(scene / (scene.max() + 1e-12))
    return scenes


def extract_patches(scenes, rng, n_patches):
    per_scene = n_patches // len(scenes) + 1
    patches = []
    for scene in scenes:
        h, w = scene.shape
        ys = rng.randint(0, h - PATCH, per_scene)
        xs = rng.randint(0, w - PATCH, per_scene)
        for y, x in zip(ys, xs):
            patches.append(scene[y:y + PATCH, x:x + PATCH].ravel())
    patches = np.stack(patches[:n_patches])
    # Zoran-Weiss: remove the DC component per patch
    return patches - patches.mean(axis=1, keepdims=True)


def main():
    from sklearn.mixture import GaussianMixture

    rng = np.random.RandomState(20260816)
    scenes = make_scenes(rng)
    patches = extract_patches(scenes, rng, N_PATCHES)
    print(f"fitting K={K} GMM on {patches.shape} patches")

    gmm = GaussianMixture(
        n_components=K,
        covariance_type="full",
        reg_covar=1e-8,
        max_iter=40,  # ll change < 1/sample by iteration ~10 already
        init_params="k-means++",
        random_state=0,
        verbose=2,
        verbose_interval=5,
    )
    gmm.fit(patches)
    print(f"converged={gmm.converged_} lower_bound={gmm.lower_bound_:.4f}")

    out = Path(__file__).parent.parent / "jolideco_tpu" / "assets"
    # regularise so the float32-cast covariances stay positive
    # definite under f32 Cholesky (sklearn's reg_covar=1e-8 is below
    # f32 resolution for the large-variance components)
    covariances = gmm.covariances_.astype(np.float64)
    scale = np.einsum("kii->k", covariances) / covariances.shape[-1]
    covariances += (1e-5 * scale)[:, None, None] * np.eye(
        covariances.shape[-1]
    )
    np.savez_compressed(
        out / "gmm-astro-snr-8x8.npz",
        means=gmm.means_.astype(np.float32),
        covariances=covariances.astype(np.float32),
        weights=gmm.weights_.astype(np.float32),
        stride=np.int64(4),
        patch_norm=np.str_("subtract-mean"),
    )
    print(f"wrote {out / 'gmm-astro-snr-8x8.npz'}")


if __name__ == "__main__":
    main()
