"""MinimalUNet + UBlock — the paper's U-Net epsilon-predictor.

TPU-native re-design of `/root/reference/src/models.py:187-320`: NHWC,
functional Flax. Semantics preserved:

 - encoder: UBlock then 2x2 max-pool per feature size (`:215-218,251-256`)
 - bottleneck UBlock (`:220,258-259`)
 - decoder: ConvTranspose(k=2, s=2) upsample, concat skip (skip first, upconv
   second, `:267`), then UBlock. Decoder UBlocks do NOT receive kernel_size —
   they use the default 3 regardless (reference quirk, `:225`).
 - final: x + last_emb(e) (ReLU -> Linear, `:227`), optional last_norm
   (`:232-237`), then output conv with `lastksize` (`:228`).
 - UBlock: x + emb(e) once at block input (ReLU -> Linear, `:296,314-320`),
   then depth x [Conv('same', mode) -> optional Group/BatchNorm -> ReLU]
   (`:298-312`).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .embedding import TimeClassEmbedding
from .layers import DEFAULT_PRECISION, PaddedConv, apply_norm, make_norm


class UBlock(nn.Module):
    """Conditioned double-conv block (reference `src/models.py:285-320`)."""

    outfeatures: int
    depth: int = 2
    kernel_size: int = 3
    normalization: Optional[str] = None
    mode: str = "circular"
    dtype: Optional[Any] = None
    precision: Any = DEFAULT_PRECISION

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, embedding: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        infeatures = x.shape[-1]
        # torch: nn.Sequential(nn.ReLU(), nn.Linear(emb_dim, infeatures))
        e = nn.Dense(
            infeatures, dtype=self.dtype, precision=self.precision, name="emb_dense"
        )(nn.relu(embedding))
        h = x + e[:, None, None, :]
        for i in range(self.depth):
            h = PaddedConv(
                self.outfeatures,
                self.kernel_size,
                mode=self.mode,
                dtype=self.dtype,
                precision=self.precision,
                name=f"conv_{i}",
            )(h)
            norm = make_norm(
                self.normalization, self.outfeatures, dtype=self.dtype, name=f"norm_{i}"
            )
            h = apply_norm(norm, h, train=train)
            h = nn.relu(h)
        return h


class MinimalUNet(nn.Module):
    channels: int = 3
    fsizes: Optional[Tuple[int, ...]] = None
    mode: str = "circular"
    conditional: bool = False
    num_classes: Optional[int] = None
    emb_dim: int = 256
    normalization: Optional[str] = None
    last_norm: bool = False
    kernel_size: int = 3
    lastksize: int = 1
    dtype: Optional[Any] = None
    precision: Any = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, t, x, label=None, train: bool = False):
        """t: [b]; x: [b,h,w,c] NHWC (h, w divisible by 2^(len(fsizes)-1)).
        train=True updates BatchNorm running stats (batch_stats collection);
        a no-op for GroupNorm/None normalization."""
        fsizes = tuple(self.fsizes) if self.fsizes is not None else (32, 64, 128, 256)

        e = TimeClassEmbedding(
            self.emb_dim,
            conditional=self.conditional,
            num_classes=self.num_classes,
            dtype=self.dtype,
            name="embedding",
        )(t, label)

        skips = []
        for i, f in enumerate(fsizes[:-1]):
            x = UBlock(
                f,
                kernel_size=self.kernel_size,
                normalization=self.normalization,
                mode=self.mode,
                dtype=self.dtype,
                precision=self.precision,
                name=f"feature_block_{i}",
            )(x, e, train=train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = UBlock(
            fsizes[-1],
            kernel_size=self.kernel_size,
            normalization=self.normalization,
            mode=self.mode,
            dtype=self.dtype,
            precision=self.precision,
            name="bottleneck",
        )(x, e, train=train)

        for j, i in enumerate(range(len(fsizes) - 1, 0, -1)):
            upconv = nn.ConvTranspose(
                fsizes[i - 1],
                (2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                precision=self.precision,
                transpose_kernel=True,
                name=f"upsample_{j}",
            )(x)
            skip = skips[-(j + 1)]  # matching encoder level
            x = jnp.concatenate([skip, upconv], axis=-1)
            # Decoder UBlocks use default kernel_size=3 (reference :225 quirk).
            x = UBlock(
                fsizes[i - 1],
                kernel_size=3,
                normalization=self.normalization,
                mode=self.mode,
                dtype=self.dtype,
                precision=self.precision,
                name=f"output_block_{j}",
            )(x, e, train=train)

        last_e = nn.Dense(
            fsizes[0], dtype=self.dtype, precision=self.precision, name="last_emb_dense"
        )(nn.relu(e))
        x = x + last_e[:, None, None, :]
        if self.last_norm and self.normalization is not None:
            norm = make_norm(
                self.normalization, fsizes[0], dtype=self.dtype, name="last_normalizer"
            )
            x = apply_norm(norm, x, train=train)
        return PaddedConv(
            self.channels,
            self.lastksize,
            mode=self.mode,
            dtype=self.dtype,
            precision=self.precision,
            name="output_conv",
        )(x)
