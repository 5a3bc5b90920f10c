"""Noise schedules: t in [0, 1] -> beta(t).

TPU-native counterparts of the reference schedules
(`/root/reference/src/utils/noise_schedules.py:5-19`; the reference also
carries duplicate copies at `src/utils/idealscore.py:41-52` — this module is
the single definition for the whole framework).

All functions are pure jnp and safe under `jit` / `vmap` / `grad`.
The diffusion convention throughout the framework is

    x_t = sqrt(1 - beta(t)) * x_0 + sqrt(beta(t)) * eps,   eps ~ N(0, I)

i.e. ``beta`` is the *noise variance fraction* at time t (alpha_bar = 1-beta).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

__all__ = [
    "exponential_schedule",
    "linear_noise_schedule",
    "cosine_noise_schedule",
    "get_schedule",
    "Schedule",
]

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def exponential_schedule(t):
    """beta(t) = 1 - exp(-2 t)  (reference `noise_schedules.py:5-9`)."""
    t = jnp.asarray(t)
    return 1.0 - jnp.exp(-2.0 * t)


def linear_noise_schedule(t):
    """beta(t) = 0.01 + 0.97 t  (reference `noise_schedules.py:11-13`)."""
    t = jnp.asarray(t)
    return 0.01 + 0.97 * t


def cosine_noise_schedule(t, mode: str = "legacy"):
    """Cosine schedule (reference `noise_schedules.py:15-19`).

    ``legacy`` (the reference default, used by every trained model and score
    machine): beta(t) = 1 - cos(t / 1.008 * pi/2)^2 — note *no* 0.008 offset,
    so beta(0) = 0 exactly. Non-legacy adds the usual 0.008 offset.
    """
    t = jnp.asarray(t)
    if mode == "legacy":
        return 1.0 - jnp.cos(t / 1.008 * math.pi / 2.0) ** 2
    return 1.0 - jnp.cos((t + 0.008) / 1.008 * math.pi / 2.0) ** 2


_REGISTRY = {
    "exponential": exponential_schedule,
    "linear": linear_noise_schedule,
    "cosine": cosine_noise_schedule,
}


def get_schedule(name: str) -> Schedule:
    """Look up a schedule by name ('exponential' | 'linear' | 'cosine')."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown schedule {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
