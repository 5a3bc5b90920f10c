"""MinimalResNet — the paper's residual convnet epsilon-predictor.

TPU-native re-design of the reference backbone
(`/root/reference/src/models.py:116-185`): NHWC layout, pure-functional Flax,
no per-call device shuffling. Architectural semantics preserved exactly:

 - up-projection conv channels -> emb_dim (`:141`)
 - num_layers residual blocks: state += Conv(ReLU)(state + emb_i(e)) (`:171-175`)
   where emb_i = Linear -> GroupNorm(8) -> ReLU (`:144-146`)
 - optional GroupNorm(8) inside each conv block (`:150-152`)
 - `add_one=True` appends one extra embedding MLP whose output is added to the
   final state (`:143-146,177-182`); with add_one=False the final state is
   doubled (delta = state, `:180-182`)
 - down-projection conv with `lastksize`, optionally preceded by GroupNorm
   (`:154-157`)
 - 'circular' or 'zeros' boundary conditions everywhere.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .embedding import TimeClassEmbedding
from .layers import DEFAULT_PRECISION, GROUPNORM_EPS, DenseNormAct, PaddedConv


class MinimalResNet(nn.Module):
    channels: int = 3
    emb_dim: int = 128
    mode: str = "circular"
    normalization: Optional[str] = None
    conditional: bool = False
    num_classes: Optional[int] = None
    kernel_size: int = 3
    num_layers: int = 6
    lastksize: int = 1
    add_one: bool = True
    dtype: Optional[Any] = None
    precision: Any = DEFAULT_PRECISION

    @nn.compact
    def __call__(self, t, x, label=None, train: bool = False):
        """t: [b] in [0,1]; x: [b,h,w,c] NHWC; label: [b] int or None.

        `train` exists for interface uniformity with MinimalUNet; the
        reference ResNet has no BatchNorm option (src/models.py:150-152
        treats any truthy normalization as GroupNorm), so it is unused."""
        del train
        e = TimeClassEmbedding(
            self.emb_dim,
            conditional=self.conditional,
            num_classes=self.num_classes,
            dtype=self.dtype,
            name="embedding",
        )(t, label)

        state = PaddedConv(
            self.emb_dim,
            self.kernel_size,
            mode=self.mode,
            dtype=self.dtype,
            precision=self.precision,
            name="up_projection",
        )(x)

        for i in range(self.num_layers):
            ei = DenseNormAct(
                self.emb_dim,
                dtype=self.dtype,
                precision=self.precision,
                name=f"emb_{i}",
            )(e)
            h = state + ei[:, None, None, :]
            h = PaddedConv(
                self.emb_dim,
                self.kernel_size,
                mode=self.mode,
                dtype=self.dtype,
                precision=self.precision,
                name=f"conv_{i}",
            )(h)
            if self.normalization is not None:
                h = nn.GroupNorm(
                    num_groups=8,
                    epsilon=GROUPNORM_EPS,
                    dtype=self.dtype,
                    name=f"conv_norm_{i}",
                )(h)
            state = state + nn.relu(h)

        if self.add_one:
            delta = DenseNormAct(
                self.emb_dim,
                dtype=self.dtype,
                precision=self.precision,
                name=f"emb_{self.num_layers}",
            )(e)[:, None, None, :]
        else:
            delta = state
        nextstate = state + delta

        if self.normalization is not None:
            nextstate = nn.GroupNorm(
                num_groups=8,
                epsilon=GROUPNORM_EPS,
                dtype=self.dtype,
                name="down_norm",
            )(nextstate)
        out = PaddedConv(
            self.channels,
            self.lastksize,
            mode=self.mode,
            dtype=self.dtype,
            precision=self.precision,
            name="down_projection",
        )(nextstate)
        return out
