"""Exact block pruning for the flash-score sweep (the fp32-tier lever).

At low noise the ELS posterior is a near-argmax patch selector: for a query
q, every bank patch p with

    logit(q, p) - max_p' logit(q, p') < -LN2 * THR      (THR in log2 units)

contributes a weight that underflows to EXACT fp32 zero inside the kernel
(exp2(x) == 0.0 for x < -150), so a whole (query-block, bank-block) tile of
such pairs can be skipped without changing the result. The logit is a scaled
negative squared distance,

    logit(q, p) = -||q - a_t p||^2 / (2 beta_t^2) * log2e + log2 w_p,

so triangle-inequality bounds from per-block (centroid, radius) statistics
give, per (query row, bank block),

    upper(q, pb) = -max(0, ||q - a_t c_pb|| - a_t r_pb)^2 * s + maxlogw_pb
    lower(q)     = max_pb -(||q - a_t c_pb|| + a_t r_pb)^2 * s + minlogw_pb

(the lower bound is attained by SOME included patch of the best block, so
the true row max is >= lower(q)). A tile is skipped when every row's upper
is below every row's lower minus THR.

The bounds only bite when bank blocks are spatially coherent, so the cached
bank is stored in a CLUSTERED order: k-means centers fitted on a patch
subsample, every patch assigned, patches stably sorted by cluster id
(``cluster_perm``). Any permutation of the bank is mathematically a no-op
for the softmax sums (the weights follow via the stored per-patch image
index); it only changes fp32 summation order.

Reference anchor: this accelerates the hot loop of
/root/reference/src/utils/idealscore.py:447-471 (the per-batch ELS patch
sweep) without changing its math. PERFORMANCE.md round-2/3 worked the
cost-benefit ("levers not yet pulled"); round 4 builds and measures it.

Threshold semantics: THR defaults to 152 (log2 units) — every skipped
pair's weight would round to exact fp32 zero even against the FINAL row
max, so pruning is exact to sub-ulp accumulation residue. Smaller THR
(env CDT_FLASH_PRUNE_THR) prunes more at a still-provable relative error
<= sum(w) * 2^-THR / s1 <= NP * 2^-THR (e.g. THR=60 keeps the machine's
fp32-parity contract with ~2^-34 headroom at NP ~= 2^25.4).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

LOG2E = 1.4426950408889634
# default skip threshold (log2 units): exp2(-152) == exact fp32 zero
DEFAULT_THR = 152.0
# fp32 slack on the bound arithmetic (distances O(30) squared and scaled by
# up to ~120 -> abs error O(1e-2); 1.0 is >100x that)
BOUND_MARGIN = 1.0
PRUNE_BLOCK = 2048  # bank rows per pruning block == kernel block_p at dp<=512


def prune_threshold() -> float:
    raw = os.environ.get("CDT_FLASH_PRUNE_THR")
    if raw:
        try:
            return float(raw)
        except ValueError:
            pass
    return DEFAULT_THR


class BankBlockStats(NamedTuple):
    """Per kernel-block (PRUNE_BLOCK bank rows) geometry, flattened over
    (chunk, block-within-chunk); padded rows excluded via `valid`."""

    centroids: jnp.ndarray  # [J, d] mean of valid patches (0 if none)
    radii: jnp.ndarray  # [J] max ||p - centroid|| over valid rows
    valid: jnp.ndarray  # [J] bool: block has >= 1 real (non-pad) row


def kmeans_centers(sample: jnp.ndarray, n_centers: int, *, iters: int = 8,
                   key=None, chunk: int = 16384) -> jnp.ndarray:
    """Plain Lloyd k-means on a patch subsample (MXU distance argmin per
    iteration). Initialization: evenly strided sample rows — the sample is
    image-ordered, so strides land on distinct images; empty clusters keep
    their previous center. Memory-bounded: the [S, J] distance matrix and
    the center update are both chunked over S (a one-hot [S, J] matmul at
    S=256k/J=4k would be a 4.3 GB transient — it OOM'd the 50k build next
    to two bank copies), accumulating per-cluster sums via segment_sum."""
    S, d = sample.shape
    idx = jnp.linspace(0, S - 1, n_centers).astype(jnp.int32)
    centers = sample[idx]
    pad = (-S) % chunk
    sample_c = jnp.concatenate(
        [sample, jnp.zeros((pad, d), sample.dtype)]
    ).reshape(-1, chunk, d)
    nch = sample_c.shape[0]
    rowid = (jnp.arange(nch * chunk) < S).reshape(nch, chunk)

    def step(centers, _):
        cn = jnp.sum(centers * centers, axis=1)

        def one(args):
            sc, ok = args
            a = jnp.argmin(cn[None, :] - 2.0 * (sc @ centers.T), axis=1)
            a = jnp.where(ok, a, n_centers)  # pad rows -> overflow bucket
            sums = jax.ops.segment_sum(sc, a, num_segments=n_centers + 1)
            cnts = jax.ops.segment_sum(
                jnp.ones((chunk,), jnp.float32), a, num_segments=n_centers + 1
            )
            return sums[:n_centers], cnts[:n_centers]

        sums, cnts = jax.lax.map(one, (sample_c, rowid))
        sums, cnts = jnp.sum(sums, axis=0), jnp.sum(cnts, axis=0)
        new = jnp.where(
            cnts[:, None] > 0, sums / jnp.maximum(cnts, 1.0)[:, None],
            centers,
        )
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def _seg_slices(n: int, seg: int):
    return [(i, min(i + seg, n)) for i in range(0, n, seg)]


def assign_clusters(bank: jnp.ndarray, centers: jnp.ndarray,
                    B: int, d: int, *, chunks_per_call: int = 64) -> jnp.ndarray:
    """Cluster id per bank row, chunk at a time. bank [nblk, B*d] compact
    rows -> ids [nblk, B] int32. Dispatched in bounded slices of the chunk
    axis: the full 50k assignment is ~10 bf16 TFLOP in one lax.map — a
    single >60 s device execution, which the axon tunnel kills
    (ops.dispatch rationale; same fix, host-level slicing)."""
    cn = jnp.sum(centers * centers, axis=1)

    @jax.jit
    def run(bank_s):
        def one(row):
            p = row.reshape(B, d)
            return jnp.argmin(
                cn[None, :] - 2.0 * (p @ centers.T), axis=1
            ).astype(jnp.int32)

        return jax.lax.map(one, bank_s)

    nblk = bank.shape[0]
    outs = [run(bank[i0:i1]) for i0, i1 in _seg_slices(nblk, chunks_per_call)]
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def permute_bank(bank: jnp.ndarray, perm: jnp.ndarray, B: int, d: int,
                 *, chunks_per_call: int = 64):
    """Gather bank rows into a new order WITHOUT materializing a padded
    [P, d] copy (T(8,128) pads d=27 to 128 lanes — 4.7x HBM bloat at the
    50k k=3 bank). The source stays the compact [nblk, B*d] layout viewed
    as one contiguous 1-D buffer; each output chunk gathers its B rows as
    d-length strided segments. Host-sliced like assign_clusters: TPU
    gathers at this index volume can exceed the tunnel's execution kill
    in one call. Each slice lands in a DONATED preallocated output via
    dynamic_update_slice — the slice-list + concatenate variant held
    source + slices + result (3 bank copies, 15.6 GB at the 50k k=3 bank)
    and left the chip too full for the stats pass that follows."""
    nblk = bank.shape[0]
    flat = bank.reshape(-1)  # contiguous: row r = flat[r*d:(r+1)*d]

    def _run(out, flat, perm_s, i0):
        def one(perm_rows):  # [B] -> [B*d]
            idx = perm_rows[:, None] * d + jnp.arange(d)[None, :]
            return flat[idx.reshape(-1)]

        chunk = jax.lax.map(one, perm_s)
        return jax.lax.dynamic_update_slice(out, chunk, (i0, 0))

    run = jax.jit(_run, donate_argnums=0)
    out = jnp.zeros_like(bank)
    perm2 = perm.reshape(nblk, B)
    for i0, i1 in _seg_slices(nblk, chunks_per_call):
        out = run(out, flat, perm2[i0:i1], jnp.int32(i0))
    return out


def gather_rows(bank: jnp.ndarray, ids: jnp.ndarray, d: int) -> jnp.ndarray:
    """Gather rows by GLOBAL row id from the compact [nblk, B*d] layout as
    d-length strided segments of the contiguous 1-D view (no padded [P, d]
    intermediate). Returns [len(ids), d]."""
    flat = bank.reshape(-1)
    idx = ids[:, None] * d + jnp.arange(d)[None, :]
    return flat[idx.reshape(-1)].reshape(len(ids), d)


def block_stats(bank: jnp.ndarray, row_valid: jnp.ndarray, B: int, d: int,
                block: int = PRUNE_BLOCK) -> BankBlockStats:
    """Per-PRUNE_BLOCK (centroid, radius) over the (clustered) bank.

    Blocks follow the kernel grid: each chunk pads B up to a block multiple,
    so block j of chunk i covers chunk rows [j*block, (j+1)*block).
    `row_valid` [nblk, B] marks real (non-pad-image) rows — after the
    cluster permutation pad rows scatter, so validity must ride per row
    (derived from the stored per-patch image index)."""
    nblk = bank.shape[0]
    Bp = -(-B // block) * block
    npb = Bp // block

    @jax.jit
    def run(bank, row_valid):
        def one(args):
            row, ok = args
            p = row.reshape(B, d)
            ok = ok.astype(jnp.float32)
            if Bp != B:
                p = jnp.concatenate([p, jnp.zeros((Bp - B, d), p.dtype)])
                ok = jnp.concatenate([ok, jnp.zeros((Bp - B,), ok.dtype)])
            pb = p.reshape(npb, block, d)
            okb = ok.reshape(npb, block)
            cnt = jnp.sum(okb, axis=1)
            cent = jnp.sum(pb * okb[:, :, None], axis=1) / jnp.maximum(
                cnt, 1.0
            )[:, None]
            dist2 = jnp.sum((pb - cent[:, None, :]) ** 2, axis=2)  # [npb, blk]
            rad = jnp.sqrt(jnp.max(dist2 * okb, axis=1))
            return cent, rad, cnt > 0

        return jax.lax.map(one, (bank, row_valid))

    cent, rad, valid = run(bank, row_valid)
    J = nblk * npb
    return BankBlockStats(
        cent.reshape(J, d), rad.reshape(J), valid.reshape(J)
    )


def prune_masks(
    q: jnp.ndarray,  # [M, d] query windows
    qn: jnp.ndarray,  # [M] ||q||^2
    at,
    bt,
    stats: BankBlockStats,
    logw_max: jnp.ndarray,  # [J] per-block max log2 w over INCLUDED rows
    logw_min: jnp.ndarray,  # [J] per-block min log2 w over included rows
    any_included: jnp.ndarray,  # [J] bool: block has >= 1 included row
    *,
    block_q: int,
    thr: float | None = None,
) -> jnp.ndarray:
    """int32 skip mask [M/block_q, J]: 1 = the (query-block, bank-block)
    tile provably underflows to exact zero; 0 = compute. Cost: one
    [M, J] 256-row-chunked centroid-distance matmul — ~0.02% of the sweep's
    pair work at J = P / PRUNE_BLOCK."""
    if thr is None:
        thr = prune_threshold()
    M, d = q.shape
    if M % block_q:
        raise ValueError(f"M={M} not a multiple of block_q={block_q}")
    s = (1.0 / (2.0 * bt * bt)) * LOG2E
    atr = at * stats.radii  # [J]
    cn = jnp.sum(stats.centroids * stats.centroids, axis=1)  # [J]
    neg_inf = jnp.float32(-1e30)
    u_bias = jnp.where(stats.valid, logw_max, neg_inf)
    l_bias = jnp.where(stats.valid & any_included, logw_min, neg_inf)
    l_ok = stats.valid & any_included

    qr = q.reshape(M // block_q, block_q, d)
    qnr = qn.reshape(M // block_q, block_q)

    def one(args):
        qb, qnb = args  # [bq, d], [bq]
        d2 = qnb[:, None] - 2.0 * at * (qb @ stats.centroids.T) + (
            at * at
        ) * cn[None, :]
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))  # [bq, J] = ||q - at c||
        lo = jnp.maximum(dist - atr[None, :], 0.0)
        hi = dist + atr[None, :]
        upper = -(lo * lo) * s + u_bias[None, :]
        lower_row = jnp.max(
            jnp.where(l_ok[None, :], -(hi * hi) * s + l_bias[None, :],
                      neg_inf),
            axis=1,
        )  # [bq]
        u_blk = jnp.max(upper, axis=0)  # [J]
        l_blk = jnp.min(lower_row)  # scalar
        return (u_blk < l_blk - thr - BOUND_MARGIN).astype(jnp.int32)

    return jax.lax.map(one, (qr, qnr))  # [M/block_q, J]


def logw_block_stats(w: jnp.ndarray, B: int, block: int = PRUNE_BLOCK):
    """Per-block (max log2 w, min log2 w over included rows, any-included)
    from the per-call bank weights w [nblk, B] (included = w > 0)."""
    nblk = w.shape[0]
    Bp = -(-B // block) * block
    npb = Bp // block
    if Bp != B:
        w = jnp.concatenate(
            [w, jnp.zeros((nblk, Bp - B), w.dtype)], axis=1
        )
    wb = w.reshape(nblk, npb, block)
    inc = wb > 0.0
    neg_inf = jnp.float32(-1e30)
    logw = jnp.where(inc, jnp.log2(jnp.maximum(wb, 1e-38)), neg_inf)
    lmax = jnp.max(logw, axis=2).reshape(-1)
    lmin = jnp.min(jnp.where(inc, logw, -neg_inf), axis=2).reshape(-1)
    any_inc = jnp.any(inc, axis=2).reshape(-1)
    lmin = jnp.where(any_inc, lmin, neg_inf)
    return lmax, lmin, any_inc
