"""Generate the built-in 8x8 patch GMM asset.

The reference depends on an external GMM library repo
(``$JOLIDECO_GMM_LIBRARY``); to keep this package self-contained we ship
a small GMM fitted on patches drawn from synthetic astronomical-style
images (point sources, extended Gaussian blobs, gradients, edges) with
the Zoran-Weiss subtract-mean normalisation. Run from the repo root:

    python scripts/make_builtin_gmm.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def synthetic_images(rng, n_images=300, size=64):
    """Images with astro-like structure: blobs, point sources, ridges."""
    images = []
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(n_images):
        image = np.zeros((size, size))
        # smooth background gradient
        gx, gy = rng.uniform(-1, 1, 2)
        image += 0.2 * (gx * xx + gy * yy) / size
        # gaussian blobs
        for _ in range(rng.poisson(4)):
            x0, y0 = rng.uniform(0, size, 2)
            sigma = rng.uniform(1.0, 8.0)
            amp = rng.uniform(0.2, 1.0)
            image += amp * np.exp(
                -((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * sigma**2)
            )
        # point sources convolved with a narrow psf
        for _ in range(rng.poisson(6)):
            x0, y0 = rng.randint(0, size, 2)
            image[y0, x0] += rng.uniform(0.5, 3.0)
        # occasional sharp ridge
        if rng.rand() < 0.3:
            angle = rng.uniform(0, np.pi)
            c = np.cos(angle) * (xx - size / 2) + np.sin(angle) * (yy - size / 2)
            image += 0.5 * np.exp(-np.abs(c) / rng.uniform(0.5, 2.0))
        images.append(image / image.max())
    return images


def extract_patches(images, rng, patch=8, n_patches=60_000):
    patches = []
    per_image = n_patches // len(images) + 1
    for image in images:
        h, w = image.shape
        ys = rng.randint(0, h - patch, per_image)
        xs = rng.randint(0, w - patch, per_image)
        for y, x in zip(ys, xs):
            patches.append(image[y : y + patch, x : x + patch].ravel())
    patches = np.stack(patches[:n_patches])
    # Zoran-Weiss: subtract per-patch mean
    patches = patches - patches.mean(axis=1, keepdims=True)
    return patches


def main():
    from sklearn.mixture import GaussianMixture

    rng = np.random.RandomState(20260816)
    images = synthetic_images(rng)
    patches = extract_patches(images, rng)
    print(f"fitting GMM on {patches.shape} patches")

    gmm = GaussianMixture(
        n_components=64,
        covariance_type="full",
        reg_covar=1e-8,
        max_iter=60,
        random_state=0,
        verbose=1,
    )
    gmm.fit(patches)

    out = Path(__file__).parent.parent / "jolideco_tpu" / "assets"
    out.mkdir(exist_ok=True)
    np.savez_compressed(
        out / "gmm-builtin-8x8.npz",
        means=gmm.means_.astype(np.float32),
        covariances=gmm.covariances_.astype(np.float32),
        weights=gmm.weights_.astype(np.float32),
        stride=np.int64(4),
        patch_norm=np.str_("subtract-mean"),
    )
    print(f"wrote {out / 'gmm-builtin-8x8.npz'}")


if __name__ == "__main__":
    main()
