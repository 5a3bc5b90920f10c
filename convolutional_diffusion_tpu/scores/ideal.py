"""IdealScoreModule (IS): exact score of the empirical distribution.

Counterpart of `/root/reference/src/utils/idealscore.py:560-636`. The
posterior weight of each training image n given x is
softmax_n(-||x - a_t img_n||^2 / (2 beta_t)); the score is
-(x - a_t E[img | x]) / beta_t.

TPU formulation: the distance expands to ||x||^2 - 2 a_t <x, img> +
a_t^2 ||img||^2, so the whole sweep is one [b, D] @ [D, N] matmul (MXU)
streamed in chunks through the shared online softmax with the training images
themselves as the value bank. The reference's per-batch `torch.mean`
accumulation and max_samples/label semantics are reproduced via
`image_weights` (FILTERED cutoff, idealscore.py:602-615).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import ScoreModuleBase
from .common import (
    CutoffRule,
    Weighting,
    image_weights,
    init_state,
    update_state,
)


class IdealScoreModule(ScoreModuleBase):
    # whole-image module: k is irrelevant (the reference forward swallows it
    # via **kwargs, idealscore.py:600) — accept any k, compile once
    uses_kernel_size = False

    def __init__(self, dataset, *, batch_size: int = 128, **kw):
        super().__init__(dataset, batch_size=batch_size, **kw)

    def _build(self, *, k: int, x_shape, has_label: bool):
        del k  # whole-image module; kernel size is irrelevant (ref **kwargs)
        cs = self.chunk_size
        batch_size = self.batch_size
        max_samples = self.max_samples
        # mesh-aware (set by parallel.ShardedIdealScoreModule): weights are
        # computed GLOBALLY, then the dataset shards over the mesh axis and
        # each device's partial softmax state merges with pmax/psum — the
        # same pattern as the ELS/bbELS sharded sweeps
        mesh = getattr(self, "mesh", None)
        shard_axis = getattr(self, "axis", "data")
        n_dev = mesh.shape[shard_axis] if mesh is not None else 1

        def fn(images, labels, order, x, lab, at, bt):
            n = images.shape[0]
            d = images.shape[1] * images.shape[2] * images.shape[3]
            w = image_weights(
                labels,
                lab if has_label else None,
                batch_size=batch_size,
                max_samples=max_samples,
                cutoff=CutoffRule.FILTERED,
                weighting=Weighting.MEAN,
                order=order,
            )
            pad = (-n) % (n_dev * cs)
            imgs_flat = jnp.concatenate(
                [images.reshape(n, d), jnp.zeros((pad, d), images.dtype)]
            )
            w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
            imgs_flat = imgs_flat.reshape(
                (n_dev, -1, cs, d) if mesh is not None else (-1, cs, d)
            )
            w = w.reshape((n_dev, -1, cs) if mesh is not None else (-1, cs))

            b = x.shape[0]
            xf = x.reshape(b, d)
            xn = jnp.sum(xf**2, axis=-1)
            beta2 = 2.0 * bt**2

            def sweep(imgs_p, w_p):
                img_norms = jnp.sum(imgs_p**2, axis=-1)

                def step(state, chunk):
                    imgs_c, w_c, n_c = chunk
                    dots = jnp.dot(xf, imgs_c.T, precision=self.prec)  # [b, cs]
                    logits = (
                        -(xn[:, None] - 2.0 * at * dots + at**2 * n_c[None, :])
                        / beta2
                    )
                    return update_state(state, logits, w_c[None, :], imgs_c), None

                state = init_state((b,), d)
                state, _ = jax.lax.scan(step, state, (imgs_p, w_p, img_norms))
                return state

            if mesh is None:
                state = sweep(imgs_flat, w)
                s1_, s2_ = state.s1, state.s2
            else:
                from jax.sharding import PartitionSpec as P

                from ..parallel.sharded_score import merge_collective

                def local(imgs_s, w_s):
                    st = sweep(imgs_s[0], w_s[0])
                    _, s1_, s2_ = merge_collective(st.m, st.s1, st.s2, shard_axis)
                    return s1_, s2_

                s1_, s2_ = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P(shard_axis), P(shard_axis)),
                    out_specs=(P(), P()),
                    check_vma=False,
                )(imgs_flat, w)

            mean_img = s2_ / s1_[:, None]
            score = -(xf - at * mean_img) / (bt**2)
            return score.reshape(x.shape)

        return jax.jit(fn)
