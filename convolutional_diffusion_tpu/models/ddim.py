"""DiffusionModel — bundles a backbone, a noise schedule, and shape metadata.

Functional counterpart of the reference `DDIM` wrapper
(`/root/reference/src/models.py:10-32`): in JAX the parameters live outside
the module, so this is a lightweight descriptor plus `init`/`apply` helpers.
Sampling lives in `convolutional_diffusion_tpu.sampling` (one `lax.scan`
instead of the reference's Python step loop, `src/models.py:34-85`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..schedules import Schedule, cosine_noise_schedule


@dataclasses.dataclass(frozen=True)
class DiffusionModel:
    backbone: nn.Module
    noise_schedule: Schedule = cosine_noise_schedule
    in_channels: int = 3
    default_imsize: int = 32

    def init(self, key, batch_size: int = 1, conditional: Optional[bool] = None):
        """Initialize backbone parameters with dummy inputs."""
        t = jnp.zeros((batch_size,), jnp.float32)
        x = jnp.zeros(
            (batch_size, self.default_imsize, self.default_imsize, self.in_channels),
            jnp.float32,
        )
        if conditional is None:
            conditional = bool(getattr(self.backbone, "conditional", False))
        label = jnp.zeros((batch_size,), jnp.int32) if conditional else None
        variables = self.backbone.init(key, t, x, label)
        return variables["params"]

    def apply(self, params, t, x, label=None):
        """Epsilon prediction: backbone(t, x, label). NHWC."""
        return self.backbone.apply({"params": params}, t, x, label)

    @property
    def conditional(self) -> bool:
        return bool(getattr(self.backbone, "conditional", False))
