"""Sinusoidal time embedding with optional additive class embedding.

TPU-native counterpart of `EmbeddingModule`
(reference `/root/reference/src/models.py:88-113`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


class TimeClassEmbedding(nn.Module):
    """emb(t) = concat(sin(t/f), cos(t/f)) [+ Embed(label)].

    Preserves the reference's frequency quirk: the denominator exponent is
    ``arange(d) / (d - 1)`` (reference `src/models.py:105`), i.e. the highest
    frequency index reaches 10000 exactly, unlike the usual ``/d``.
    """

    fdim: int
    conditional: bool = False
    num_classes: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, t: jnp.ndarray, label: Optional[jnp.ndarray] = None):
        d = self.fdim // 2
        # (d-1) denominator quirk kept for parity (src/models.py:105).
        denom = 10000.0 ** (jnp.arange(d, dtype=jnp.float32) / (d - 1))
        targ = t[:, None].astype(jnp.float32) / denom[None, :]
        emb = jnp.concatenate([jnp.sin(targ), jnp.cos(targ)], axis=1)
        if self.dtype is not None:
            emb = emb.astype(self.dtype)

        if self.conditional:
            if self.num_classes is None:
                raise ValueError("num_classes must be set when conditional=True")
            if label is None:
                raise ValueError("label required for a conditional embedding")
            class_emb = nn.Embed(
                self.num_classes, self.fdim, dtype=self.dtype, name="class_embeddings"
            )(label.astype(jnp.int32))
            emb = emb + class_emb
        return emb
