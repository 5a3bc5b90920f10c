"""Reverse-diffusion samplers as a single `lax.scan` (jit-compiled once).

Replaces the reference's Python-level per-step loops
(`/root/reference/src/models.py:34-85`) with XLA control flow: the whole
nsteps-step trajectory compiles to one program, so on TPU there is no
host-device round-trip per step.

Update rules (exact reference formulas):
 - DDPM ancestral (`src/models.py:48-64`):
     sigma_t = sqrt(beta_prev / beta_t) * sqrt(1 - alpha_t / alpha_prev)
     x <- sqrt(alpha_prev) (x - sqrt(beta_t) eps) / sqrt(alpha_t)
          + sqrt(1 - alpha_prev - sigma_t^2) eps + sigma_t N(0,1)
 - DDIM deterministic (`src/models.py:66-83`):
     x <- sqrt(alpha_prev / alpha_t) x
          + (sqrt(beta_prev) - sqrt(alpha_prev / alpha_t) sqrt(beta_t)) eps

`breakstep` reproduces the reference early-exit (`:50-51,70-71`): step i is
applied only while i > breakstep, so the returned x equals the state at the
moment the reference would have returned.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .models.ddim import DiffusionModel

EpsFn = Callable[..., jnp.ndarray]  # (params, t, x, label) -> eps


def ddim_step(x, eps, beta_t, beta_prev):
    """Deterministic DDIM update (reference src/models.py:77-83)."""
    alpha_t = 1.0 - beta_t
    alpha_prev = 1.0 - beta_prev
    ratio = jnp.sqrt(alpha_prev / alpha_t)
    coef = jnp.sqrt(beta_prev) - ratio * jnp.sqrt(beta_t)
    return ratio[:, None, None, None] * x + coef[:, None, None, None] * eps


def ddpm_step(x, eps, beta_t, beta_prev, noise):
    """Stochastic ancestral DDPM update (reference src/models.py:57-64)."""
    alpha_t = 1.0 - beta_t
    alpha_prev = 1.0 - beta_prev
    sigma = jnp.sqrt(beta_prev / jnp.maximum(beta_t, 1e-20)) * jnp.sqrt(
        jnp.maximum(1.0 - alpha_t / alpha_prev, 0.0)
    )
    mean = (
        jnp.sqrt(alpha_prev)[:, None, None, None]
        * (x - jnp.sqrt(beta_t)[:, None, None, None] * eps)
        / jnp.sqrt(alpha_t)[:, None, None, None]
    )
    extra = jnp.sqrt(jnp.maximum(1.0 - alpha_prev - sigma**2, 0.0))
    return mean + extra[:, None, None, None] * eps + sigma[:, None, None, None] * noise


def sample_scan(
    eps_fn: EpsFn,
    noise_schedule,
    params,
    x,
    *,
    nsteps: int,
    label=None,
    key: Optional[jax.Array] = None,
    ddpm: bool = False,
    breakstep: int = -1,
):
    """Run the reverse loop i = nsteps..1 as one scan. x: [b,h,w,c] NHWC."""
    b = x.shape[0]
    if ddpm and key is None:
        raise ValueError("ddpm=True requires a PRNG key")
    key = key if key is not None else jax.random.PRNGKey(0)
    if breakstep > nsteps:
        # reference semantics (models.py:48-51): the loop never reaches an
        # i == breakstep above nsteps, so the full reverse pass runs; the
        # freeze predicate below would otherwise freeze EVERY step
        breakstep = -1

    def step(carry, i):
        x, k = carry
        t = i.astype(jnp.float32) * jnp.ones((b,), jnp.float32) / nsteps
        beta_t = noise_schedule(t)
        beta_prev = noise_schedule(t - 1.0 / nsteps)
        eps = eps_fn(params, t, x, label)
        if ddpm:
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            new_x = ddpm_step(x, eps, beta_t, beta_prev, noise)
        else:
            new_x = ddim_step(x, eps, beta_t, beta_prev)
        # reference returns BEFORE applying step i == breakstep
        new_x = jnp.where(i > breakstep, new_x, x)
        return (new_x, k), None

    steps = jnp.arange(nsteps, 0, -1)
    (x, _), _ = jax.lax.scan(step, (x, key), steps)
    return x


def make_sampler(
    model: DiffusionModel, *, nsteps: int = 20, ddpm: bool = False, jit: bool = True
):
    """Build a jitted sampler fn(params, x, label=None, key=None, breakstep=-1)."""

    def fn(params, x, label=None, key=None, breakstep=-1):
        return sample_scan(
            model.apply,
            model.noise_schedule,
            params,
            x,
            nsteps=nsteps,
            label=label,
            key=key,
            ddpm=ddpm,
            breakstep=breakstep,
        )

    if jit:
        fn = jax.jit(fn, static_argnames=())
    return fn


def sample(
    model: DiffusionModel,
    params,
    *,
    batch_size: int = 1,
    x: Optional[jnp.ndarray] = None,
    nsteps: int = 20,
    label=None,
    key: Optional[jax.Array] = None,
    breakstep: int = -1,
    ddpm: bool = False,
):
    """Convenience mirror of the reference `DDIM.sample` signature.

    Draws the N(0,1) seed when x is None (reference src/models.py:40-43).
    """
    if x is None:
        if key is None:
            raise ValueError("need a PRNG key to draw the initial noise")
        key, sub = jax.random.split(key)
        x = jax.random.normal(
            sub,
            (batch_size, model.default_imsize, model.default_imsize, model.in_channels),
            jnp.float32,
        )
    return sample_scan(
        model.apply,
        model.noise_schedule,
        params,
        x,
        nsteps=nsteps,
        label=label,
        key=key,
        ddpm=ddpm,
        breakstep=breakstep,
    )


def sample_sharded(
    model: DiffusionModel,
    params,
    mesh,
    *,
    batch_size: int,
    nsteps: int = 20,
    label=None,
    key: Optional[jax.Array] = None,
    ddpm: bool = False,
):
    """Multi-seed sampling spread across a device mesh: seeds shard over the
    'data' axis, params replicate — each chip runs its slice of the batch
    through the same scan (no collectives needed; SURVEY §5's third
    TPU-parallel component). batch_size must divide by the mesh size."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if key is None:
        raise ValueError("need a PRNG key")
    n_dev = mesh.devices.size
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} not divisible by {n_dev} devices")
    key, sub = jax.random.split(key)
    x = jax.random.normal(
        sub,
        (batch_size, model.default_imsize, model.default_imsize, model.in_channels),
        jnp.float32,
    )
    x = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    if label is not None:
        label = jax.device_put(
            jnp.asarray(label), NamedSharding(mesh, P("data"))
        )
    return sample_scan(
        model.apply, model.noise_schedule, params, x,
        nsteps=nsteps, label=label, key=key, ddpm=ddpm,
    )


def q_sample(x0, eps, beta_t):
    """Forward noising x_t = sqrt(1-beta) x0 + sqrt(beta) eps
    (reference src/utils/train.py:43-44)."""
    return (
        jnp.sqrt(1.0 - beta_t)[:, None, None, None] * x0
        + jnp.sqrt(beta_t)[:, None, None, None] * eps
    )
