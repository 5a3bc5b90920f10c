"""Shared scaffolding for the analytic score machines.

Two pieces:

1. `SoftmaxState` — a running online-softmax accumulator (max / weighted-sum /
   weighted-value-sum). Its `update` and `merge` are associative, so the same
   math runs (a) sequentially in a `lax.scan` over dataset chunks and (b) as a
   cross-device combine (`psum`-tree over ICI) for dataset-sharded machines —
   numerically equivalent to the reference's streaming max-subtraction merge
   (/root/reference/src/utils/idealscore.py:458-465,543-550,621-628), which
   cancels exactly in the final -num/den ratio.

2. `image_weights` — per-image contribution weights reproducing the
   reference's DataLoader semantics exactly: per-batch `mean` accumulation
   (weight 1/n_kept(batch)), label filtering, and each module's distinct
   `max_samples` cutoff rule (they all differ; see `CutoffRule`).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


class SoftmaxState(NamedTuple):
    """Running state of a weighted online softmax over a streamed bank.

    Shapes: m, s1: [*S]; s2: [*S, dv]. The softmax-weighted mean of streamed
    values v is s2/s1 (the max m cancels).
    """

    m: jnp.ndarray
    s1: jnp.ndarray
    s2: jnp.ndarray


def init_state(shape, dv: int, dtype=jnp.float32) -> SoftmaxState:
    return SoftmaxState(
        m=jnp.full(shape, NEG_INF, dtype),
        s1=jnp.zeros(shape, dtype),
        s2=jnp.zeros((*shape, dv), dtype),
    )


def _rescale(m_old, m_new):
    """exp(m_old - m_new), with empty (-inf) states mapping to 0."""
    return jnp.where(jnp.isneginf(m_old), 0.0, jnp.exp(m_old - m_new))


def update_state(
    state: SoftmaxState,
    logits: jnp.ndarray,  # [*S, P]
    weights: jnp.ndarray,  # broadcastable to [*S, P]; 0 disables an entry
    values: Optional[jnp.ndarray] = None,  # [*L, P, dv]; L = leading dims of S
) -> SoftmaxState:
    """Fold one bank block into the running softmax.

    `values` may share any number of LEADING state dims: shape [*L, P, dv]
    where L is a (possibly empty) prefix of S — e.g. a bank shared by all
    queries ([P, dv]), per-row banks ([R, P, dv] for S=(R, b, q)), or fully
    per-query values ([*S, P, dv]).
    """
    weights = jnp.broadcast_to(weights, logits.shape)
    masked = jnp.where(weights > 0, logits, NEG_INF)
    m_new = jnp.maximum(state.m, jnp.max(masked, axis=-1))
    m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    e = jnp.where(weights > 0, weights * jnp.exp(logits - m_safe[..., None]), 0.0)
    scale = _rescale(state.m, m_safe)
    s1 = state.s1 * scale + jnp.sum(e, axis=-1)
    if values is None:
        s2 = state.s2
    else:
        shared = values.ndim - 2  # leading S dims shared with values
        # uppercase shared-dim letters: lowercase starting at 'r' would
        # collide with the 'v' value subscript at shared >= 5
        letters = "".join(chr(ord("A") + i) for i in range(shared))
        spec = f"{letters}...p,{letters}pv->{letters}...v"
        s2 = state.s2 * scale[..., None] + jnp.einsum(
            spec, e, values, precision=jax.lax.Precision.HIGHEST
        )
    return SoftmaxState(m=m_new, s1=s1, s2=s2)


def merge_states(a: SoftmaxState, b: SoftmaxState) -> SoftmaxState:
    """Associative combine of two partial softmax states (for psum trees /
    dataset sharding across devices)."""
    m = jnp.maximum(a.m, b.m)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    sa = _rescale(a.m, m_safe)
    sb = _rescale(b.m, m_safe)
    return SoftmaxState(
        m=m,
        s1=a.s1 * sa + b.s1 * sb,
        s2=a.s2 * sa[..., None] + b.s2 * sb[..., None],
    )


class CutoffRule(enum.Enum):
    """Which cumulative count the reference compares against max_samples.

    The four reference modules each break slightly differently (verified
    line-by-line; see file:line below). A chunk (reference DataLoader batch)
    is PROCESSED iff the stated cumulative count is <= max_samples.

    - FILTERED: cumulative label-filtered count including this batch
      (IdealScoreModule idealscore.py:602-615; LocalScoreModule :524-535).
    - UNFILTERED: cumulative raw batch sizes including this batch, counted
      BEFORE label filtering (LocalEquivScoreModule :432-434).
    - BATCH_QUOTA: q = (batch index) * configured batch_size checked before
      the batch (LocalEquivBordersScoreModule :184-187,370) — i.e. batch i is
      processed iff i * batch_size <= max_samples.
    """

    FILTERED = "filtered"
    UNFILTERED = "unfiltered"
    BATCH_QUOTA = "batch_quota"


class Weighting(enum.Enum):
    MEAN = "mean"  # torch.mean over the bank dim per batch (IS/LS/ELS)
    SUM = "sum"  # torch.sum (bbELS)


def image_weights(
    labels: jnp.ndarray,  # [N] int
    label: Optional[jnp.ndarray],  # scalar int or None
    *,
    batch_size: int,
    max_samples: Optional[int],
    cutoff: CutoffRule,
    weighting: Weighting,
    per_image_bank: int = 1,  # bank entries contributed per image (e.g. (h-k+1)^2)
    order: Optional[jnp.ndarray] = None,  # [N] stream order (DataLoader shuffle)
) -> jnp.ndarray:
    """Per-image weights [N] replicating reference DataLoader streaming.

    Images are consumed in chunks of `batch_size`, sequentially or — when
    `order` is given — in that permuted order (the reference DataLoader's
    shuffle=True; LocalScoreModule always shuffles, idealscore.py:489, and
    els_script passes --shuffle into the other modules). The returned weights
    are in CANONICAL image indexing regardless of order: since every module's
    accumulation is an associative weighted sum, streaming order only changes
    batch composition (mean denominators, cutoff subsets), which this
    function fully captures — the sweep itself may visit images in any order.
    Weight of image i = include(i) * (1/bank_size(batch of i)) for MEAN, or
    include(i) * 1 for SUM, where bank_size counts label-kept entries in the
    image's batch times `per_image_bank`.
    """
    n = labels.shape[0]
    if order is not None:
        w_stream = image_weights(
            labels[order],
            label,
            batch_size=batch_size,
            max_samples=max_samples,
            cutoff=cutoff,
            weighting=weighting,
            per_image_bank=per_image_bank,
        )
        return jnp.zeros((n,), w_stream.dtype).at[order].set(w_stream)
    idx = jnp.arange(n)
    batch_id = idx // batch_size
    n_batches = -(-n // batch_size)

    kept = (
        jnp.ones((n,), bool) if label is None else (labels == label)
    )
    kept_f = kept.astype(jnp.float32)
    batch_sizes = jax.ops.segment_sum(
        jnp.ones((n,), jnp.float32), batch_id, num_segments=n_batches
    )
    batch_kept = jax.ops.segment_sum(kept_f, batch_id, num_segments=n_batches)

    if max_samples is None:
        batch_included = jnp.ones((n_batches,), bool)
    elif cutoff == CutoffRule.FILTERED:
        batch_included = jnp.cumsum(batch_kept) <= max_samples
    elif cutoff == CutoffRule.UNFILTERED:
        batch_included = jnp.cumsum(batch_sizes) <= max_samples
    elif cutoff == CutoffRule.BATCH_QUOTA:
        batch_included = (jnp.arange(n_batches) * batch_size) <= max_samples
    else:  # pragma: no cover
        raise ValueError(cutoff)

    if weighting == Weighting.MEAN:
        denom = jnp.maximum(batch_kept * per_image_bank, 1.0)
        w_batch = jnp.where(batch_included, 1.0 / denom, 0.0)
    else:
        w_batch = jnp.where(batch_included, 1.0, 0.0)
    return kept_f * w_batch[batch_id]


# Score finalization note (inlined by every module): the reference
# numerator accumulates w e (x - at*v) which equals s1*x - at*s2, so
# -num/den/bt^2 = -(x - at*s2/s1)/bt^2 — identical to all four modules'
# returns (idealscore.py:372,473,557,636).
