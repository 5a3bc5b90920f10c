"""LocalScoreModule (LS): locality without translation equivariance.

Counterpart of `/root/reference/src/utils/idealscore.py:476-557`. Each pixel
(i, j) of x attends over the N training images; the logit for image n is the
sum of per-pixel squared distances over the zero-padded k x k window around
(i, j), and the value is the pixelwise diff (x - a_t img_n)(i, j).

TPU formulation: the per-pixel distance field D[b, n] = sum_c (x - a_t img)^2
is box-filtered with a k x k SAME window (one `lax.reduce_window` — the
zero-padding contributes zeros exactly like torch's F.unfold(padding=k//2),
idealscore.py:539), then streamed through the shared online softmax with
per-pixel values.

NOTE on ordering: the reference's DataLoader hardcodes shuffle=True here
(idealscore.py:489) — the only always-shuffled module — so with max_samples
it processes a random subset. This module therefore defaults shuffle=True
(key-deterministic permutation per call; see ScoreModuleBase). Order only
affects results through batch composition — pass shuffle=False or an
explicit `order` for reproducible parity runs, or batch_size >= N where
order is irrelevant (default schedule is exponential, matching the
reference's odd default at idealscore.py:483).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..schedules import exponential_schedule
from .base import ScoreModuleBase
from .common import (
    CutoffRule,
    Weighting,
    image_weights,
    init_state,
    update_state,
)


class LocalScoreModule(ScoreModuleBase):
    def __init__(
        self,
        dataset,
        *,
        batch_size: int = 256,
        schedule=exponential_schedule,
        shuffle: bool = True,
        **kw,
    ):
        super().__init__(
            dataset, batch_size=batch_size, schedule=schedule, shuffle=shuffle, **kw
        )

    def _build(self, *, k: int, x_shape, has_label: bool):
        batch_size = self.batch_size
        max_samples = self.max_samples
        cs = min(self.chunk_size, 64)
        # mesh-aware (set by parallel.ShardedLocalScoreModule): weights are
        # computed GLOBALLY, the dataset shards over the mesh axis, and each
        # device's partial per-pixel softmax state merges with pmax/psum
        mesh = getattr(self, "mesh", None)
        shard_axis = getattr(self, "axis", "data")
        n_dev = mesh.shape[shard_axis] if mesh is not None else 1

        def fn(images, labels, order, x, lab, at, bt):
            n, h, w, c = images.shape
            w_img = image_weights(
                labels,
                lab if has_label else None,
                batch_size=batch_size,
                max_samples=max_samples,
                cutoff=CutoffRule.FILTERED,
                weighting=Weighting.MEAN,
                order=order,
            )
            # chunks stream FLATTENED ([cs, h*w*c]): a c=3-minor scan operand
            # would be layout-padded to 128 lanes (42x HBM bloat; see els_sweep)
            pad = (-n) % (n_dev * cs)
            images_p = jnp.concatenate(
                [images.reshape(n, h * w * c), jnp.zeros((pad, h * w * c), images.dtype)]
            ).reshape(
                (n_dev, -1, cs, h * w * c) if mesh is not None
                else (-1, cs, h * w * c)
            )
            w_img_p = jnp.concatenate([w_img, jnp.zeros((pad,), w_img.dtype)]).reshape(
                (n_dev, -1, cs) if mesh is not None else (-1, cs)
            )

            b = x.shape[0]
            beta2 = 2.0 * bt**2

            def step(state, chunk):
                imgs_c, w_c = chunk  # [cs, h*w*c], [cs]
                imgs_c = imgs_c.reshape(cs, h, w, c)
                diffs = x[:, None] - at * imgs_c[None]  # [b, cs, h, w, c]
                d2 = jnp.sum(diffs**2, axis=-1)  # [b, cs, h, w]
                boxed = jax.lax.reduce_window(
                    d2,
                    0.0,
                    jax.lax.add,
                    window_dimensions=(1, 1, k, k),
                    window_strides=(1, 1, 1, 1),
                    padding=((0, 0), (0, 0), (k // 2, k // 2), (k // 2, k // 2)),
                )
                logits = -boxed / beta2  # [b, cs, h, w]
                # softmax axis is the image axis -> move to last: [b, h, w, cs]
                logits = jnp.moveaxis(logits, 1, -1)
                values = jnp.moveaxis(diffs, 1, 3)  # [b, h, w, cs, c]
                return (
                    update_state(state, logits, w_c[None, None, None, :], values),
                    None,
                )

            if mesh is None:
                state, _ = jax.lax.scan(
                    step, init_state((b, h, w), c), (images_p, w_img_p)
                )
                s1_, s2_ = state.s1, state.s2
            else:
                from jax.sharding import PartitionSpec as P

                from ..parallel.sharded_score import merge_collective

                def local(imgs_s, w_s):
                    st, _ = jax.lax.scan(
                        step, init_state((b, h, w), c), (imgs_s[0], w_s[0])
                    )
                    _, s1_, s2_ = merge_collective(st.m, st.s1, st.s2, shard_axis)
                    return s1_, s2_

                s1_, s2_ = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P(shard_axis), P(shard_axis)),
                    out_specs=(P(), P()),
                    check_vma=False,
                )(images_p, w_img_p)

            # values here are already the diffs, so num/den IS the mean diff:
            score = -(s2_ / s1_[..., None]) / (bt**2)
            return score

        return jax.jit(fn)
