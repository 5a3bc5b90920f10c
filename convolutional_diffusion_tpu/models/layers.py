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

import jax
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
    total = kernel_size - 1
    if total == 0:
        return x
    # torch 'same' semantics (nn.Conv2d conv.py): total padding k-1, split
    # floor-left / ceil-right — asymmetric for EVEN kernels (k=4 -> 1,2);
    # a symmetric 2*(k//2) pad would grow even-k outputs by one pixel
    lo = total // 2
    hi = total - lo
    pad_mode = {"circular": "wrap", "zeros": "constant"}[mode]
    return jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)), mode=pad_mode)


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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch ``nn.BatchNorm2d`` semantics exactly.

    flax ``nn.BatchNorm`` updates the running variance with the BIASED batch
    variance; torch normalizes with the biased variance but updates
    ``running_var`` with the UNBIASED one (x n/(n-1)) at momentum 0.1 —
    running stats would drift apart over training. Stats live in the
    ``batch_stats`` collection ({mean, var} per feature), updated only when
    ``train=True`` (reference src/models.py:306-309,232-237)."""

    momentum: float = 0.1  # torch default: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if train and not self.is_initializing():
            axes = tuple(range(x.ndim - 1))  # N(,H,W) per channel
            mean = jnp.mean(x, axes)
            var = jnp.mean((x - mean) ** 2, axes)  # biased: normalizes
            n = x.size // feat
            unbiased = var * (n / max(n - 1, 1))  # torch running update
            m = self.momentum
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
            ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


def make_norm(normalization: Optional[str], features: int, dtype=None, name="norm"):
    """GroupNorm(min(32, f)) / BatchNorm factory used by UBlock / UNet.

    Reference `src/models.py:306-309,234-237`. BatchNorm carries torch-exact
    running statistics in the ``batch_stats`` collection (see TorchBatchNorm);
    call it with ``train=True`` during training to update them.
    """
    if normalization == "GroupNorm":
        return nn.GroupNorm(
            num_groups=min(32, features), epsilon=GROUPNORM_EPS, dtype=dtype, name=name
        )
    if normalization == "BatchNorm":
        return TorchBatchNorm(dtype=dtype, name=name)
    return None


def apply_norm(norm, h: jnp.ndarray, train: bool = False) -> jnp.ndarray:
    """Apply a make_norm result, threading `train` to BatchNorm only."""
    if norm is None:
        return h
    if isinstance(norm, TorchBatchNorm):
        return norm(h, train=train)
    return norm(h)
