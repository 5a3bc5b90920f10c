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
            pad = (-n) % cs
            imgs_flat = jnp.concatenate(
                [images.reshape(n, d), jnp.zeros((pad, d), images.dtype)]
            )
            w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
            imgs_flat = imgs_flat.reshape(-1, cs, d)
            w = w.reshape(-1, cs)
            img_norms = jnp.sum(imgs_flat**2, axis=-1)

            b = x.shape[0]
            xf = x.reshape(b, d)
            xn = jnp.sum(xf**2, axis=-1)
            beta2 = 2.0 * bt**2

            def step(state, chunk):
                imgs_c, w_c, n_c = chunk
                dots = jnp.dot(xf, imgs_c.T, precision=self.prec)  # [b, cs]
                logits = -(xn[:, None] - 2.0 * at * dots + at**2 * n_c[None, :]) / beta2
                return update_state(state, logits, w_c[None, :], imgs_c), None

            state = init_state((b,), d)
            state, _ = jax.lax.scan(step, state, (imgs_flat, w, img_norms))
            mean_img = state.s2 / state.s1[:, None]
            score = -(xf - at * mean_img) / (bt**2)
            return score.reshape(x.shape)

        return jax.jit(fn)
