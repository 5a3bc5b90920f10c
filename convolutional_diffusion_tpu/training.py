"""Epsilon-prediction DDPM training (optax + pjit data parallelism).

Counterpart of `/root/reference/src/utils/train.py:9-63`, with the same
optimization semantics:
 - AdamW(lr, weight_decay) (`:23`);
 - exponential LR decay stepped PER BATCH (`:26,60`) — expressed as an optax
   `exponential_decay(transition_steps=1, decay_rate=gamma)` schedule;
 - per-sample t ~ U{0..max_t-1}/max_t (`:40`), x_t = sqrt(1-beta) x +
   sqrt(beta) eps (`:43-44`), MSE(eps_hat, eps) (`:51`).

TPU-native differences:
 - one jitted `train_step` (noise injection + forward + backward + update in
   a single XLA program); batch sharded over the mesh 'data' axis with
   replicated params — XLA inserts the gradient psum over ICI;
 - Orbax checkpoints carry params + OPTIMIZER STATE + step (the reference
   pickles only the model, so its training cannot resume the optimizer —
   SURVEY §5);
 - the host never sees per-batch tensors (dataset lives in device memory, or
   is fed via the C++ loader for out-of-core sets).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .models.ddim import DiffusionModel
from .parallel.mesh import data_spec
from .sampling import q_sample
from .utils import profiling


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 100
    batch_size: int = 128
    lr: float = 1e-4
    weight_decay: float = 0.0
    gamma: float = 0.99995  # per-batch LR decay (reference train.py:15)
    max_t: int = 1000
    save_interval: int = 10
    seed: int = 0
    log_every: int = 50
    drop_last: bool = True  # static shapes for jit; reference keeps ragged tails


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=config.lr, transition_steps=1, decay_rate=config.gamma
    )
    return optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=config.weight_decay,
    )


class TrainState:
    """Minimal functional train state (params, opt_state, step)."""

    def __init__(self, params, opt_state, step=0):
        self.params = params
        self.opt_state = opt_state
        self.step = step


def make_train_step(
    model: DiffusionModel,
    optimizer: optax.GradientTransformation,
    *,
    max_t: int = 1000,
    conditional: bool = False,
    batch_norm: bool = False,
):
    """Build the jitted train step: (params, opt_state, images, labels, key)
    -> (params, opt_state, loss).

    With batch_norm=True, `params` is a variables dict {'params',
    'batch_stats'}: the forward runs train=True with mutable batch_stats
    (torch BatchNorm training semantics, reference src/models.py:306-309)
    and the updated running stats ride along in the returned tree."""
    schedule = model.noise_schedule

    def loss_fn(params, batch_stats, images, labels, key):
        b = images.shape[0]
        kt, ke = jax.random.split(key)
        t = (
            jax.random.randint(kt, (b,), 0, max_t).astype(jnp.float32) / max_t
        )  # reference train.py:40
        beta_t = schedule(t)
        eps = jax.random.normal(ke, images.shape, images.dtype)
        x_noised = q_sample(images, eps, beta_t)
        lbl = labels if conditional else None
        if batch_norm:
            pred, updated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                t, x_noised, lbl, train=True, mutable=["batch_stats"],
            )
            new_stats = updated["batch_stats"]
        else:
            pred = model.apply(params, t, x_noised, lbl)
            new_stats = batch_stats
        return jnp.mean((pred - eps) ** 2), new_stats

    def train_step(params, opt_state, images, labels, key):
        if batch_norm:
            p, stats = params["params"], params["batch_stats"]
        else:
            p, stats = params, None
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, stats, images, labels, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        out = {"params": p, "batch_stats": new_stats} if batch_norm else p
        return out, opt_state, loss

    return jax.jit(train_step, donate_argnums=(0, 1))


def train_diffusion(
    model: DiffusionModel,
    params,
    dataset,  # (images [N,h,w,c], labels [N]) numpy or jnp
    config: TrainConfig = TrainConfig(),
    *,
    conditional: bool = False,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_extra: Optional[dict] = None,
    use_native_loader: bool = False,
    native_loader=None,
    resume_from: Optional[str] = None,
    log_fn: Callable[[str], None] = print,
):
    """Full training loop. Returns (params, opt_state, history).

    With a mesh, batches are sharded over the 'data' axis and params
    replicated; without one, runs single-device. With
    use_native_loader=True, shuffled/normalized batches come from the C++
    prefetch runtime (utils.native_loader) instead of numpy gathers
    (falls back silently if the library can't build). A prebuilt
    `native_loader` (e.g. NativeLoader.from_idx / from_cifar_bins — the
    out-of-core file-backed path) overrides both; `dataset` may then be None.
    """
    if native_loader is not None:
        native = native_loader
        images = labels = None
        n = native.num_samples
    else:
        images, labels = dataset
        images = np.asarray(images, np.float32)
        labels = np.asarray(labels, np.int32)
        n = images.shape[0]

        native = None
        if use_native_loader:
            from .utils import native_loader as nl

            if nl.is_available():
                # the C++ loader holds raw uint8; invert the normalization
                u8 = np.clip((images * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
                native = nl.NativeLoader.from_arrays(
                    u8, labels, batch_size=config.batch_size, seed=config.seed,
                    drop_last=config.drop_last,
                )
            else:
                log_fn("native loader unavailable; using numpy batches")

    # train_step donates params/opt_state buffers; copy so the caller's
    # arrays survive the first step.
    params = jax.tree_util.tree_map(jnp.array, params)
    # a variables dict with batch_stats means BatchNorm training (the
    # optimizer only sees the 'params' leaf tree)
    batch_norm = isinstance(params, dict) and "batch_stats" in params
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params["params"] if batch_norm else params)
    start_step = 0
    if resume_from is not None:
        # full resume incl. AdamW moments + LR schedule position (the
        # reference cannot do this — it pickles only the model, SURVEY §5)
        from .utils.checkpoint import restore_checkpoint

        blob = restore_checkpoint(resume_from)
        restored = blob["state"]
        params = jax.tree_util.tree_map(
            lambda old, new: jnp.asarray(new, old.dtype), params, restored["params"]
        )
        if "opt_state" in restored:
            # orbax restores (without a target) as plain containers — optax
            # namedtuples come back as dicts and EmptyState as None — so a
            # structural tree_map against the live opt_state fails. Zip the
            # LEAVES instead: dict keys flatten sorted, which matches optax
            # field order (count/mu/nu), and None/EmptyState are both empty
            # nodes, so leaf order lines up.
            flat_old, treedef = jax.tree_util.tree_flatten(opt_state)
            flat_new = jax.tree_util.tree_leaves(restored["opt_state"])
            if len(flat_old) != len(flat_new):
                raise ValueError(
                    f"checkpoint opt_state has {len(flat_new)} leaves, the "
                    f"optimizer expects {len(flat_old)} — was it saved with "
                    "a different optimizer configuration?"
                )
            opt_state = jax.tree_util.tree_unflatten(
                treedef,
                [
                    jnp.asarray(new, jnp.asarray(old).dtype)
                    for old, new in zip(flat_old, flat_new)
                ],
            )
        start_step = int(blob.get("meta", {}).get("step", 0))
        log_fn(f"resumed from {resume_from} at step {start_step}")
    train_step = make_train_step(
        model, optimizer, max_t=config.max_t, conditional=conditional,
        batch_norm=batch_norm,
    )

    if mesh is not None:
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))

    if mesh is not None and config.batch_size % mesh.size:
        raise ValueError(
            f"batch_size={config.batch_size} must divide over the "
            f"{mesh.size}-device mesh (every regular batch would otherwise "
            "fall back to replicated compute on all devices)"
        )

    def put_batch(x):
        if mesh is None:
            return jnp.asarray(x)
        if x.shape[0] % mesh.size:
            # ragged tail (drop_last=False): device_put cannot shard an
            # indivisible leading dim — replicate instead. Every device
            # redundantly computes the small tail batch; math is identical
            # and the tail shape compiles once.
            return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, data_spec(x.ndim)))

    rng = np.random.RandomState(config.seed)
    key = jax.random.PRNGKey(config.seed)
    bs = config.batch_size
    steps_per_epoch = n // bs if config.drop_last else -(-n // bs)
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset of {n} samples is smaller than batch_size={bs} with "
            "drop_last=True — lower batch_size or pass drop_last=False"
        )
    history = []
    step = start_step
    for epoch in range(config.epochs):
        perm = rng.permutation(n) if native is None else None
        epoch_losses = []
        t0 = time.time()
        for i in range(steps_per_epoch):
            if native is not None:
                bi, bl = native.next()
                batch_img = put_batch(bi)
                batch_lab = put_batch(bl)
            else:
                idx = perm[i * bs : (i + 1) * bs]
                if len(idx) < bs and config.drop_last:
                    break
                batch_img = put_batch(images[idx])
                batch_lab = put_batch(labels[idx])
            key, sub = jax.random.split(key)
            with profiling.annotate("train_step"):
                params, opt_state, loss = train_step(
                    params, opt_state, batch_img, batch_lab, sub
                )
            step += 1
            if step % config.log_every == 0:
                epoch_losses.append(float(loss))
        dt = time.time() - t0
        mean_loss = float(np.mean(epoch_losses)) if epoch_losses else float(loss)
        history.append(mean_loss)
        log_fn(
            f"epoch {epoch + 1}/{config.epochs} loss={mean_loss:.5f} "
            f"({steps_per_epoch / max(dt, 1e-9):.1f} steps/s)"
        )
        if checkpoint_dir and (epoch + 1) % config.save_interval == 0:
            from .utils.checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir, params=params, opt_state=opt_state, step=step,
                epoch=epoch + 1, extra=checkpoint_extra,
            )
    return params, opt_state, history
