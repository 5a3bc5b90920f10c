"""Kernel-size (locality scale) calibration.

Counterpart of `/root/reference/scripts/scales_calibration.py:33-188`: runs
reverse diffusion with the trained CNN while, at every step, asking each
candidate-k analytic score module for its estimate; the per-step optimal k
maximizes cosine similarity (or minimizes L2) to the CNN's implied score
-eps/sqrt(beta_t). Aggregates median and mode over seeds.

TPU-native redesign: all `nsamps` seeds advance TOGETHER as one batch — the
per-seed Python loop of the reference (scales_calibration.py:128-178) becomes
a batch dimension, so each of the |K| dataset sweeps per step serves every
seed at once (the BASELINE.json north-star item). The per-k loop remains a
Python loop because k changes patch shapes (one compile per k). Conditional
calibration draws one label per seed; seeds sharing a label batch together.

Aggregation parity: torch.median returns the LOWER median and torch.mode the
smallest most-frequent value — both reproduced here (numpy's np.median would
average the two middle values).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import ddim_step
from .schedules import cosine_noise_schedule


def lower_median(a: np.ndarray, axis=0) -> np.ndarray:
    """torch.median semantics: lower of the two middle values."""
    a = np.sort(a, axis=axis)
    idx = (a.shape[axis] - 1) // 2
    return np.take(a, idx, axis=axis)


def mode_smallest(a: np.ndarray, axis=0) -> np.ndarray:
    """torch.mode semantics: most frequent value, smallest on ties."""
    a = np.asarray(a)
    moved = np.moveaxis(a, axis, 0)
    out = np.empty(moved.shape[1:], moved.dtype)
    it = np.nditer(out, flags=["multi_index"], op_flags=["writeonly"])
    for _ in it:
        col = moved[(slice(None), *it.multi_index)]
        vals, counts = np.unique(col, return_counts=True)  # vals sorted asc
        out[it.multi_index] = vals[np.argmax(counts)]  # first max = smallest
    return out


def calibrate(
    model_eps: Callable,  # (t [b], x [b,h,w,c], label [b] or None) -> eps
    score_modules: Dict[int, Callable],  # k -> module(t, x, label=None, k=k)
    *,
    image_size: int,
    in_channels: int,
    nsamps: int = 20,
    nsteps: int = 20,
    conditional: bool = False,
    nlabels: int = 10,
    eval_mode: str = "cos",
    noise_schedule=cosine_noise_schedule,
    key: Optional[jax.Array] = None,
    x0: Optional[jnp.ndarray] = None,
    labels: Optional[jnp.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Returns {'k_optimals' [nsamps, nsteps], 'median' [nsteps],
    'mode' [nsteps]} with reference index semantics (index i-1 = step i).

    `x0` [nsamps, h, w, c] (and `labels` [nsamps] when conditional) inject
    the initial seeds instead of drawing from `key` — used by the golden
    parity tests to replay the reference's recorded torch draws
    (scales_calibration.py:131-136)."""
    if x0 is None and key is None:
        raise ValueError("need a PRNG key or explicit x0 seeds")
    kernel_sizes = sorted(score_modules)
    if x0 is not None:
        x = jnp.asarray(x0)
        if x.shape[0] != nsamps:
            raise ValueError(f"x0 batch {x.shape[0]} != nsamps {nsamps}")
        if conditional and labels is None:
            raise ValueError("conditional calibration with x0 needs labels")
        labels = jnp.asarray(labels) if conditional else None
    else:
        kx, kl = jax.random.split(key)
        x = jax.random.normal(kx, (nsamps, image_size, image_size, in_channels))
        labels = (
            jax.random.randint(kl, (nsamps,), 0, nlabels) if conditional else None
        )

    k_optimals = np.zeros((nsamps, nsteps), np.int32)
    ks = jnp.asarray(kernel_sizes)

    for i in range(nsteps, 0, -1):
        t = jnp.full((nsamps,), i / nsteps, jnp.float32)
        beta_t = noise_schedule(t)
        eps = model_eps(t, x, labels)
        cnn_score = -eps / jnp.sqrt(beta_t)[:, None, None, None]

        # per-candidate-k analytic estimates (batched over all seeds)
        metrics = []  # [K, nsamps]
        for k in kernel_sizes:
            mod = score_modules[k]
            if conditional:
                if getattr(mod, "supports_vector_label", False):
                    # all seeds, all labels, one sweep
                    ke = mod(float(i / nsteps), x, label=labels, k=k)
                else:
                    # group seeds by label so each sweep is still batched;
                    # pad every group to the LARGEST group so all groups
                    # (and all steps) share one compiled x-shape per k —
                    # distinct group sizes would each cost a ~1-3 min
                    # remote compile
                    ke = jnp.zeros_like(x)
                    labs_np = np.asarray(labels)
                    groups = {
                        int(lab): np.nonzero(labs_np == lab)[0]
                        for lab in np.unique(labs_np)
                    }
                    gmax = max(len(v) for v in groups.values())
                    for lab, sel in groups.items():
                        xg = x[sel]
                        if len(sel) < gmax:
                            xg = jnp.concatenate([
                                xg,
                                jnp.zeros(
                                    (gmax - len(sel), *x.shape[1:]), x.dtype
                                ),
                            ])
                        est = mod(float(i / nsteps), xg, label=lab, k=k)
                        ke = ke.at[sel].set(est[: len(sel)])
            else:
                ke = mod(float(i / nsteps), x, k=k)
            flat_c = cnn_score.reshape(nsamps, -1)
            flat_k = ke.reshape(nsamps, -1)
            if eval_mode == "l2_dist":
                m = -jnp.sqrt(jnp.sum((flat_c - flat_k) ** 2, axis=1))
            else:
                m = jnp.sum(flat_c * flat_k, axis=1) / (
                    jnp.linalg.norm(flat_c, axis=1) * jnp.linalg.norm(flat_k, axis=1)
                )
            metrics.append(m)
        metrics = jnp.stack(metrics)  # [K, nsamps]; argmax = best either way
        best = ks[jnp.argmax(metrics, axis=0)]
        k_optimals[:, i - 1] = np.asarray(best)

        # advance x with the CNN epsilon (reference :154-160)
        beta_prev = noise_schedule(t - 1.0 / nsteps)
        x = ddim_step(x, eps, beta_t, beta_prev)

    return {
        "k_optimals": k_optimals,
        "median": lower_median(k_optimals, axis=0).astype(np.int32),
        "mode": mode_smallest(k_optimals, axis=0).astype(np.int32),
    }
