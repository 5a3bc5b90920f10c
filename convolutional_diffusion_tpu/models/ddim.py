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

    def _dummy_inputs(self, batch_size: int, conditional: Optional[bool]):
        t = jnp.zeros((batch_size,), jnp.float32)
        x = jnp.zeros(
            (batch_size, self.default_imsize, self.default_imsize, self.in_channels),
            jnp.float32,
        )
        if conditional is None:
            conditional = bool(getattr(self.backbone, "conditional", False))
        label = jnp.zeros((batch_size,), jnp.int32) if conditional else None
        return t, x, label

    def init(self, key, batch_size: int = 1, conditional: Optional[bool] = None):
        """Initialize backbone parameters with dummy inputs (params only;
        use init_variables for models with batch_stats, e.g. BatchNorm)."""
        t, x, label = self._dummy_inputs(batch_size, conditional)
        return self.backbone.init(key, t, x, label)["params"]

    def init_variables(self, key, batch_size: int = 1, conditional=None):
        """Full variables dict — {'params': ...} plus 'batch_stats' when the
        backbone has BatchNorm running statistics."""
        t, x, label = self._dummy_inputs(batch_size, conditional)
        return self.backbone.init(key, t, x, label)

    @staticmethod
    def _as_variables(params):
        """Accept either a bare params tree or a full variables dict
        ({'params': ..., 'batch_stats': ...}) everywhere a model is applied —
        BatchNorm checkpoints flow through samplers/CLIs unchanged."""
        if isinstance(params, dict) and "params" in params:
            return dict(params)
        return {"params": params}

    def apply(self, params, t, x, label=None, train: bool = False, **kw):
        """Epsilon prediction: backbone(t, x, label). NHWC.

        `params` may be a bare params tree or a variables dict. train=True
        with mutable=['batch_stats'] (pass via **kw) returns
        (pred, updated_variables) for BatchNorm training."""
        return self.backbone.apply(
            self._as_variables(params), t, x, label, train=train, **kw
        )

    @property
    def conditional(self) -> bool:
        return bool(getattr(self.backbone, "conditional", False))
