"""Patch extraction and padding primitives (NHWC).

The analytic score machines view training images as banks of k x k patches
and the sample x as a field of k x k query windows. Extraction is expressed
as k^2 shifted slices concatenated on the channel axis — pure static slicing
that XLA fuses into the consuming matmul's operand layout.

Feature ordering of the flattened patch axis is (ki, kj, c): offset (di, dj)
channel ci lives at index (di * k + dj) * c + ci. `center_slice` exposes the
center-pixel channels under this ordering.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "extract_patches",
    "pad_image",
    "center_index",
    "patch_centers",
]


def extract_patches(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """All valid k x k patches of NHWC `x` -> [n, h-k+1, w-k+1, k*k*c].

    Equivalent to torch F.unfold(stride=1, padding=0) up to feature ordering
    (reference uses it at src/utils/idealscore.py:240,447; ordering here is
    (ki, kj, c) instead of torch's (c, ki, kj) — consistent across the
    framework, so distances and dot products are identical).
    """
    n, h, w, c = x.shape
    hp, wp = h - k + 1, w - k + 1
    slices = [
        x[:, di : di + hp, dj : dj + wp, :] for di in range(k) for dj in range(k)
    ]
    return jnp.concatenate(slices, axis=-1)


def pad_image(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """Spatially pad NHWC x by `pad` on all sides ('circular' or 'zeros')."""
    if pad == 0:
        return x
    try:
        jmode = {"circular": "wrap", "zeros": "constant"}[mode]
    except KeyError:
        raise ValueError(
            f"mode must be 'circular' or 'zeros', got {mode!r}"
        ) from None
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=jmode)


def center_index(k: int, c: int) -> slice:
    """Channel slice of the patch-center pixel under (ki, kj, c) ordering."""
    p = k // 2
    start = (p * k + p) * c
    return slice(start, start + c)


def patch_centers(patches: jnp.ndarray, k: int, c: int) -> jnp.ndarray:
    """[..., k*k*c] patches -> [..., c] center-pixel values."""
    return patches[..., center_index(k, c)]

