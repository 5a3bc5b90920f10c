"""Shared building blocks for the convolutional diffusion backbones.

All models in this framework are **NHWC** (TPU-native layout: channels last
feeds the MXU/VPU lanes directly). The torch reference is NCHW; the weight
converter (`convolutional_diffusion_tpu.convert`) handles the transposes.

Parity notes vs the reference (`/root/reference/src/models.py`):
 - torch ``padding='same', padding_mode='circular'`` == wrap-pad by k//2 then
   VALID conv (XLA has no circular conv primitive).
 - torch GroupNorm default eps is 1e-5 (flax default is 1e-6) — set explicitly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

# Computation defaults. `precision='highest'` keeps fp32 convs on TPU (the MXU
# otherwise truncates to bf16 inputs), which the <1e-3 parity target requires.
# Benchmarks may override with precision=None + dtype=bfloat16.
DEFAULT_PRECISION = "highest"

GROUPNORM_EPS = 1e-5  # torch nn.GroupNorm default


def pad_same(x: jnp.ndarray, kernel_size: int, mode: str) -> jnp.ndarray:
    """Pad NHWC `x` spatially so a VALID conv of `kernel_size` is 'same'.

    mode: 'circular' (wrap) or 'zeros' — the paper's two boundary conditions.
    """
    p = kernel_size // 2
    if p == 0:
        return x
    pad_mode = {"circular": "wrap", "zeros": "constant"}[mode]
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode=pad_mode)


class PaddedConv(nn.Module):
    """Conv2D with 'same' output size under circular or zeros padding.

    Mirrors torch ``nn.Conv2d(..., padding='same', padding_mode=mode)``
    (reference `src/models.py:141,150,155,305`).
    """

    features: int
    kernel_size: int
    mode: str = "circular"
    dtype: Optional[Any] = None
    precision: Any = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = pad_same(x, self.kernel_size, self.mode)
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="VALID",
            dtype=self.dtype,
            precision=self.precision,
            name="conv",
        )(x)


class DenseNormAct(nn.Module):
    """Linear -> GroupNorm(8) -> ReLU on a [batch, features] vector.

    The per-layer embedding MLP of MinimalResNet
    (reference `src/models.py:144-146`).
    """

    features: int
    dtype: Optional[Any] = None
    precision: Any = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, e: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(
            self.features, dtype=self.dtype, precision=self.precision, name="dense"
        )(e)
        h = nn.GroupNorm(
            num_groups=8, epsilon=GROUPNORM_EPS, dtype=self.dtype, name="norm"
        )(h)
        return nn.relu(h)


def make_norm(normalization: Optional[str], features: int, dtype=None, name="norm"):
    """GroupNorm(min(32, f)) / BatchNorm factory used by UBlock / UNet.

    Reference `src/models.py:306-309,234-237`. BatchNorm is implemented in
    inference-style (running stats folded); training with BatchNorm is rare in
    the reference (default normalization=None) — GroupNorm is the supported
    normalized config.
    """
    if normalization == "GroupNorm":
        return nn.GroupNorm(
            num_groups=min(32, features), epsilon=GROUPNORM_EPS, dtype=dtype, name=name
        )
    if normalization == "BatchNorm":
        return nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, dtype=dtype, name=name
        )
    return None
