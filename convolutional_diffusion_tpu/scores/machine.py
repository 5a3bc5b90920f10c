"""ScheduledScoreMachine: reverse diffusion driven by an analytic score
module with a calibrated per-timestep kernel-size schedule.

Counterpart of `/root/reference/src/utils/idealscore.py:55-124`. Semantics
preserved exactly:
 - the loop runs i = nsteps-1 .. 1 (nsteps-1 updates; skips i = nsteps and
   i = 0, unlike DDIM.sample — reference :88);
 - per step k = scales[i] (:95); when scales is given nsteps defaults to
   len(scales) (:82-86);
 - score backbones are converted to epsilon via eps = -sqrt(beta_t) * score
   (:101-102);
 - deterministic DDIM update identical to the neural sampler (:108-116).

The per-step kernel size changes patch-bank shapes, so steps are grouped by
k and each distinct k compiles once (the backbone's jit cache); the step loop
itself is a Python loop over <= nsteps-1 iterations driving jitted kernels.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..sampling import ddim_step
from ..schedules import cosine_noise_schedule


class ScheduledScoreMachine:
    def __init__(
        self,
        backbone,
        *,
        in_channels: int = 3,
        imsize: int = 32,
        default_time_steps: int = 20,
        noise_schedule: Callable = cosine_noise_schedule,
        score_backbone: bool = True,
        scales: Optional[Sequence[int]] = None,
        **_unused,
    ):
        self.backbone = backbone
        self.in_channels = in_channels
        self.imsize = imsize
        self.default_time_steps = default_time_steps
        self.noise_schedule = noise_schedule
        self.score_backbone = score_backbone
        self.scales = list(scales) if scales is not None else None

    def __call__(
        self,
        x,
        nsteps=None,
        label=None,
        collect_trajectory=False,
        visualize_fn=None,
    ):
        """Run the reverse loop from x (NHWC [b,h,w,c]); returns the sample.

        collect_trajectory=True also returns the list of per-step states
        (after each update), used by the exterior-derivative analysis.
        visualize_fn, if given, receives (step_i, imputed_x0) per step — the
        denoised estimate (x - sqrt(beta) eps)/sqrt(1-beta), mirroring the
        reference's visualize flag (idealscore.py:104-106).
        """
        x = jnp.asarray(x, jnp.float32)
        if nsteps is None:
            nsteps = (
                self.default_time_steps if self.scales is None else len(self.scales)
            )
        from ..utils import profiling

        b = x.shape[0]
        trajectory = []
        for i in range(nsteps - 1, 0, -1):
            t = jnp.float32(i) / nsteps
            beta_t = self.noise_schedule(t)
            k = None if self.scales is None else self.scales[i]
            with profiling.annotate(f"machine_step_k{k}"):
                score = self.backbone(t, x, label=label, k=k)
            eps = score * (-jnp.sqrt(beta_t)) if self.score_backbone else score
            if visualize_fn is not None:
                imputed = (x - eps * jnp.sqrt(beta_t)) / jnp.sqrt(1.0 - beta_t)
                visualize_fn(i, imputed)
            beta_prev = self.noise_schedule(t - 1.0 / nsteps)
            tb = jnp.full((b,), beta_t)
            tbp = jnp.full((b,), beta_prev)
            x = ddim_step(x, eps, tb, tbp)
            if collect_trajectory:
                trajectory.append(x)
        if collect_trajectory:
            return x, trajectory
        return x

    def sample(self, nsteps=None, label=None, key=None, batch_size: int = 1):
        """Draw N(0,1) seed(s) and run the machine (reference :120-124)."""
        if key is None:
            raise ValueError("need a PRNG key to draw the seed")
        x = jax.random.normal(
            key, (batch_size, self.imsize, self.imsize, self.in_channels)
        )
        return self(x, nsteps=nsteps, label=label)
