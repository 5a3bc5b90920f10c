"""Denormalization / display helpers.

Counterparts of `denormalize` / `denormalize_imshow`
(/root/reference/src/utils/idealscore.py:17-29), NHWC layout.
"""

from __future__ import annotations

import numpy as np

__all__ = ["denormalize", "denormalize_imshow", "save_image_grid"]


def denormalize(image, means, stds):
    """Invert Normalize(mean, std): x * std + mean, per channel (last axis).

    Accepts [h, w, c] or [b, h, w, c].
    """
    image = np.asarray(image)
    means = np.asarray(means, image.dtype)
    stds = np.asarray(stds, image.dtype)
    return image * stds + means


def denormalize_imshow(image, means, stds, show=True):
    """Denormalize and imshow the (first) image (reference idealscore.py:22-29)."""
    import matplotlib.pyplot as plt

    img = denormalize(image, means, stds)
    if img.ndim == 4:
        img = img[0]
    if img.shape[-1] == 1:
        img = img[..., 0]
    plt.imshow(np.clip(img, 0, 1), cmap="gray_r")
    plt.axis("off")
    if show:
        plt.show()


def save_image_grid(images, path, *, ncols: int = 8, means=0.5, stds=0.5):
    """Save a grid of NHWC samples as one PNG (denormalized, clipped)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = denormalize(np.asarray(images), means, stds)
    n = images.shape[0]
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(1.6 * ncols, 1.6 * nrows),
                             squeeze=False)
    for i in range(nrows * ncols):
        ax = axes[i // ncols][i % ncols]
        ax.axis("off")
        if i < n:
            img = images[i]
            if img.shape[-1] == 1:
                img = img[..., 0]
            ax.imshow(np.clip(img, 0, 1), cmap="gray_r")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
