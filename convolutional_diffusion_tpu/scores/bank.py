"""Compact chunked patch-bank storage for the banked ELS/bbELS fast path.

A cached bank stored 2-D as ``[P, d]`` looks innocent but is layout-poisoned
on TPU: T(8,128) tiling pads the minor d (27 for k=3, 75 for k=5) up to 128
lanes — a hidden 1.7-4.7x HBM bloat — and building it with one
`extract_patches` call materializes ``[n, hp, wp, d]``, which pads BOTH
trailing dims (22.9 GB for the 50k-image k=5 CIFAR bank vs 11.8 GB of
payload; the allocation that OOM'd the round-2 headline bench). Banks are
therefore stored as flat per-chunk rows

    bank    [nblk, B*d]     (B = images-per-chunk * patches-per-image)
    centers [nblk, B*c]
    pn      [nblk, B]

— large minor dims tile exactly, so HBM cost == payload — built by a
`lax.map` over flattened image chunks (no big padded intermediate ever
exists) and reshaped back to ``[B, d]`` per block inside the consuming scan,
a transient few-MB padded copy per step that XLA overlaps with compute.

Bank rows are ordered image-major then patch-position (identical to
reshaping the reference's unfold output, idealscore.py:447-450); images are
zero-padded up to a whole chunk and excluded via zero weights, exactly like
the former tail-padding-to-block-multiple scheme.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.patches import extract_patches, patch_centers


class BankLedger:
    """Shared HBM budget for cached banks ACROSS score modules.

    The calibration flow builds one module per candidate k (cli/calibrate,
    reference scales_calibration.py:91-117); with per-module budgets each
    would happily cache its own bank — at maxsamps=5000 the eight k=3..17
    ELS banks sum to ~23 GB and exhaust a 16 GB chip. Pass one ledger to
    every module so the cumulative-budget rule the modules already apply
    per-instance holds fleet-wide."""

    def __init__(self, budget_bytes: int):
        self.budget = budget_bytes
        self.used = 0

    def try_reserve(self, nbytes: int) -> bool:
        if self.used + nbytes > self.budget:
            return False
        self.used += nbytes
        return True

    def release(self, nbytes: int) -> None:
        """Roll back a reservation whose build failed (e.g. a runtime
        RESOURCE_EXHAUSTED near the budget edge) so retries and sibling
        modules on a shared ledger are not starved by phantom bytes."""
        self.used = max(0, self.used - nbytes)


class BankGeometry(NamedTuple):
    per_img: int  # valid k x k positions per image
    cs: int  # images per chunk
    nblk: int  # number of chunks (images padded up to nblk * cs)
    block: int  # patches per chunk = cs * per_img
    d: int  # patch feature dim = k*k*c


def bank_geometry(n: int, h: int, w: int, c: int, k: int, target_block: int) -> BankGeometry:
    per_img = (h - k + 1) * (w - k + 1)
    # clamp the chunk to the dataset: a target_block larger than the whole
    # bank would otherwise zero-pad the single chunk up to the block size
    # (wasted sweep compute on small/test datasets)
    cs = max(1, min(target_block // max(per_img, 1), n))
    nblk = -(-n // cs)
    return BankGeometry(per_img, cs, nblk, cs * per_img, k * k * c)


def bank_nbytes(n: int, h: int, w: int, c: int, k: int, target_block: int) -> int:
    """True HBM cost of a cached bank (fp32, compact layout — the flat minor
    dims tile exactly, so padding is <0.01% and ignored)."""
    g = bank_geometry(n, h, w, c, k, target_block)
    return g.nblk * g.block * (g.d + c + 1) * 4


class BankCacheMixin:
    """Shared bank-cache plumbing for ELS/bbELS (they cache the same valid-
    patch banks: bbELS's center-region windows ARE the ELS bank).

    Host class must call `_init_bank_cache(...)` in __init__; gains the
    ledger-backed `_bank(k)`, the chunk geometry, and the back-compat
    budget accessors."""

    def _init_bank_cache(self, *, target_block, use_pallas,
                         bank_budget_bytes, bank_ledger,
                         dispatch_target_s=None, prune=None):
        self.target_block = target_block
        self.use_pallas = use_pallas
        # exact block pruning (ops.prune): cluster-sorted cached banks +
        # per-call skip masks. None = env CDT_FLASH_PRUNE (off by default).
        if prune is None:
            import os

            prune = bool(os.environ.get("CDT_FLASH_PRUNE"))
        self.prune = prune
        # per-execution wall-clock target for dispatch segmentation
        # (ops.dispatch; None = env CDT_DISPATCH_TARGET_S or 30 s, <=0 off)
        self.dispatch_target_s = dispatch_target_s
        # bank_ledger: pass ONE BankLedger to several modules (e.g. the
        # per-k calibration fleet) so the budget caps their cached banks
        # cumulatively; by default each module gets its own ledger.
        self.bank_ledger = (
            bank_ledger if bank_ledger is not None
            else BankLedger(bank_budget_bytes)
        )
        self._bank_cache = {}

    # back-compat accessors (tests/tools tune the budget post-construction)
    @property
    def bank_budget_bytes(self) -> int:
        return self.bank_ledger.budget

    @bank_budget_bytes.setter
    def bank_budget_bytes(self, v: int) -> None:
        self.bank_ledger.budget = v

    @property
    def _bank_bytes_used(self) -> int:
        return self.bank_ledger.used

    def _chunk_images(self, k: int) -> int:
        """Images per scan step so the patch block stays ~target_block
        (single source of truth: bank_geometry, so streaming chunking
        always matches the cached-bank layout)."""
        n, h, w, c = self.images.shape
        return bank_geometry(n, h, w, c, k, self.target_block).cs

    def _bank(self, k: int):
        """(bank [nblk, B*d], centers [nblk, B*c], pn [nblk, B]) device
        arrays in the compact chunked layout, or None if the bank exceeds
        the remaining ledger budget (fall back to on-the-fly; NOT cached
        as a miss — a later call may find budget)."""
        if k in self._bank_cache:
            return self._bank_cache[k]
        n, h, w, c = self.images.shape
        nbytes = bank_nbytes(n, h, w, c, k, self.target_block)
        prune = getattr(self, "prune", False)
        if prune:
            # + per-row img_idx (int32) and the per-block stats (few MB)
            g = bank_geometry(n, h, w, c, k, self.target_block)
            nbytes += g.nblk * g.block * 4
        if not self.bank_ledger.try_reserve(nbytes):
            return None
        try:
            self._bank_cache[k] = (
                build_clustered_bank(self.images, k, self.target_block)
                if prune
                else build_bank(self.images, k, self.target_block)
            )
        except Exception:
            self.bank_ledger.release(nbytes)  # failed build must not starve
            raise                             # retries / ledger siblings
        return self._bank_cache[k]


class ClusteredBank(NamedTuple):
    """A cached bank in cluster-sorted patch order, plus the pruning
    geometry (ops.prune): any bank permutation is mathematically a no-op
    for the softmax sums — per-patch weights follow through `img_idx` —
    but coherent blocks make the triangle-inequality block bounds tight."""

    bank: jnp.ndarray  # [nblk, B*d] (cluster-sorted rows)
    centers: jnp.ndarray  # [nblk, B*c]
    pn: jnp.ndarray  # [nblk, B]
    img_idx: jnp.ndarray  # [nblk, B] int32 source-image index per row
    stats: object  # ops.prune.BankBlockStats at PRUNE_BLOCK granularity


def build_clustered_bank(
    images: jnp.ndarray, k: int, target_block: int, *,
    n_centers: int = 4096, sample_size: int = 1 << 18, kmeans_iters: int = 8,
) -> ClusteredBank:
    """build_bank + k-means patch clustering + stable sort by cluster id +
    per-kernel-block (centroid, radius) stats. One-time cost per (k,
    dataset): one bank build, one assignment sweep (~J/PRUNE_BLOCK of a
    score sweep's pair work), one argsort + gather."""
    from ..ops.prune import (
        PRUNE_BLOCK,
        assign_clusters,
        block_stats,
        gather_rows,
        kmeans_centers,
        permute_bank,
    )

    import os
    import time as _time

    verbose = bool(os.environ.get("CDT_PRUNE_VERBOSE"))

    def _fence(x):
        # axon's block_until_ready returns early (CLAUDE.md); a 1-element
        # device_get is the honest completion fence for diagnostics
        if verbose:
            jax.device_get(x.ravel()[:1])

    def _tick(label, t0):
        if verbose:
            print(f"[clustered-bank] {label}: {_time.perf_counter()-t0:.1f}s",
                  flush=True)
        return _time.perf_counter()

    n, h, w, c = images.shape
    g = bank_geometry(n, h, w, c, k, target_block)
    t0 = _time.perf_counter()
    bank, _, _ = build_bank(images, k, target_block)
    _fence(bank)
    t0 = _tick("build_bank", t0)
    total = g.nblk * g.block
    n_real = n * g.per_img  # rows from real (non-pad) images

    # k-means on an evenly strided subsample of the REAL rows
    S = min(sample_size, n_real)
    sample_ids = jnp.linspace(0, n_real - 1, S).astype(jnp.int32)
    # real rows are a prefix only before padding; map prefix id -> layout id
    # (layout is image-major within chunks of cs images; real images fill
    # the first n slots, so prefix id == layout id until the pad chunk)
    sample = gather_rows(bank, sample_ids, g.d)
    centers = kmeans_centers(sample, n_centers, iters=kmeans_iters)
    del sample
    _fence(centers)
    t0 = _tick("kmeans", t0)
    ids = assign_clusters(bank, centers, g.block, g.d)  # [nblk, B]
    _fence(ids)
    t0 = _tick("assign", t0)
    # pad-image rows (zero patches) sort wherever their cluster lands; their
    # weights are always zero and `row_valid` excludes them from stats
    perm = jnp.argsort(ids.reshape(-1), stable=True).astype(jnp.int32)
    del ids
    _fence(perm)
    t0 = _tick("argsort", t0)
    bank_c = permute_bank(bank, perm, g.block, g.d)
    del bank  # free the unsorted copy before the stats pass
    _fence(bank_c)
    t0 = _tick("permute", t0)
    src_img = (perm // g.block) * g.cs + (perm % g.block) // g.per_img
    img_idx = src_img.astype(jnp.int32).reshape(g.nblk, g.block)
    del perm, src_img

    @jax.jit
    def derive(bank_c):
        def one(row):
            p = row.reshape(g.block, g.d)
            return (
                patch_centers(p, k, c).reshape(g.block * c),
                jnp.sum(p * p, axis=-1),
            )

        return jax.lax.map(one, bank_c)

    centers_c, pn_c = derive(bank_c)
    row_valid = img_idx < n
    stats = block_stats(bank_c, row_valid, g.block, g.d, block=PRUNE_BLOCK)
    _fence(stats.radii)
    _tick("derive+stats", t0)
    return ClusteredBank(bank_c, centers_c, pn_c, img_idx,
                         jax.tree_util.tree_map(jnp.asarray, stats))


def build_bank(images: jnp.ndarray, k: int, target_block: int):
    """images [n, h, w, c] -> (bank [nblk, B*d], centers [nblk, B*c],
    pn [nblk, B]) on device, chunk-at-a-time (peak transient = one chunk's
    padded [cs, hp, wp, d], a few MB)."""
    n, h, w, c = images.shape
    g = bank_geometry(n, h, w, c, k, target_block)
    pad = g.nblk * g.cs - n

    @jax.jit
    def build(images):
        flat = images.reshape(n, h * w * c)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, h * w * c), images.dtype)]
            )
        chunks = flat.reshape(g.nblk, g.cs, h * w * c)

        def one(chunk):
            imgs = chunk.reshape(g.cs, h, w, c)
            p = extract_patches(imgs, k).reshape(g.block, g.d)
            ctr = patch_centers(p, k, c)
            pn = jnp.sum(p**2, axis=-1)
            return p.reshape(g.block * g.d), ctr.reshape(g.block * c), pn

        return jax.lax.map(one, chunks)

    return build(images)
