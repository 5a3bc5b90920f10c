"""LocalEquivScoreModule (ELS): locality + translation equivariance.

Counterpart of `/root/reference/src/utils/idealscore.py:375-473`. Every k x k
patch of every training image (all spatial positions) forms one patch bank;
each pixel of x attends over the bank with Gaussian weights on the distance
between its circularly-padded k x k query window and the bank patch, and the
posterior mean of the bank patches' CENTER pixels gives the score.

TPU formulation — this is flash attention on the MXU:
  Q = circular windows of x            [b*h*w, d],  d = k*k*c
  K = all valid patches of train imgs  [P, d]
  V = patch center pixels              [P, c]
  logit = -(||q||^2 - 2 a_t qk + a_t^2 ||k||^2) / (2 beta_t)
streamed over image chunks with the shared online softmax, never
materializing [b, P, h, w] (the torch version's memory wall — it builds the
x-patch dot products as a conv2d with P filters, idealscore.py:454).

Reference parity: per-batch `torch.mean` over NP = n_kept * (h-k+1)^2 entries
and the UNFILTERED max_samples cutoff (idealscore.py:430-444) are reproduced
by `image_weights(per_image_bank=(h-k+1)^2)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.dispatch import plan_segments
from ..ops.patches import center_index, extract_patches, pad_image, patch_centers
from .bank import BankCacheMixin, bank_geometry
from .base import ScoreModuleBase
from .common import (
    CutoffRule,
    SoftmaxState,
    Weighting,
    image_weights,
    init_state,
    update_state,
)


# Per-tier padded-d ceilings for the kernel's 'inbank' strategy, set from
# the TPU A/B (tools/measure_round3.py inbank, measure_round3_out.json):
# fast mode at dp=128 (k<=5 RGB) ON wins +22% (134.5 vs 109.9 Gpairs/s at
# k3; 133.2 vs 109.6 at k5) exactly as the small-k roofline predicted
# (PERFORMANCE.md); at dp=256 (k7/k9) it is noise-level (+0.8%), left off.
# 'high' ON LOSES everywhere (94.3 vs 129.2 at k3 — it sits on a joint
# VPU/MXU roofline and inbank doubles its MXU passes), and 'highest' pays
# 6 extra fp32-rate passes (roofline ceiling 64 G < its measured 89.7 G):
# both stay 0.
_INBANK_DEFAULT_MAX_DP = {"default": 128, "high": 0, "highest": 0}


def _inbank_max_dp(precision: str = "highest") -> int:
    """Padded-d ceiling for the kernel's 'inbank' strategy (patch-center
    values sliced from the bank basis instead of a separate V operand —
    see ops.flash_score). Trades the c per-channel VPU accumulation passes
    for extra MXU passes, so it pays where the kernel is VPU-bound with
    MXU headroom (fast mode at small d) and costs where it is MXU-bound.
    Env CDT_ELS_INBANK_MAX_DP (read at trace time) overrides ALL tiers —
    the A/B lever; 0 disables. The strategy is numerically pinned either
    way (interpret-mode equivalence in tests/test_flash_score.py, hardware
    cases in tools/parity_tpu.py)."""
    import os

    raw = os.environ.get("CDT_ELS_INBANK_MAX_DP")
    if raw:
        try:
            return int(raw)
        except ValueError:
            return 0
    return _INBANK_DEFAULT_MAX_DP.get(precision, 0)


def _interpret_flag() -> bool:
    """CDT_FLASH_INTERPRET=1 (read at trace time) routes the module-level
    Pallas sweeps through the kernel's interpret mode, which executes on
    CPU — lets dryrun_multichip exercise the REAL kernel path (not the jnp
    fallback) on the virtual device mesh without TPU hardware."""
    import os

    return bool(os.environ.get("CDT_FLASH_INTERPRET"))


def els_sweep(
    images_p,  # [n_chunks, cs, h*w*c] — images FLATTENED per chunk: a scan
    # operand with a c=3 minor dim would be layout-canonicalized to T(8,128)
    # tiles, padding 3 -> 128 lanes (42x HBM bloat — a 50k CIFAR set becomes
    # a 26 GB buffer). The flat 3072-lane form tiles exactly; each step
    # reshapes its own small chunk back to NHWC in-register.
    w_img_p,  # [n_chunks, cs]
    xq_flat,  # [M, d] query windows
    qn_flat,  # [M]
    at,
    bt,
    *,
    k: int,
    cs: int,
    hwc: tuple,  # (h, w, c) of one image
    per_img: int,
    c: int,
    use_pallas: bool,
    precision: str = "highest",
    state0=None,  # (m [M], s1 [M], s2 [M, c]) -inf convention; None = empty
):
    """Stream the chunked patch bank through the online softmax; returns the
    flat running state (m [M], s1 [M], s2 [M, c]) with -inf empty convention.

    Shared by the single-device module and the dataset-sharded parallel
    module (each device sweeps its shard, then states merge over ICI).
    `state0` lets dispatch segmentation (ops.dispatch) chain several sweeps
    over slices of the chunk axis — bit-exact vs one sweep, because the scan
    is sequential either way."""
    d = xq_flat.shape[1]
    M = xq_flat.shape[0]
    beta2 = 2.0 * bt**2

    if use_pallas:
        from ..ops.flash_score import flash_score_update, state_from_pallas, state_to_pallas

        inbank = -(-d // 128) * 128 <= _inbank_max_dp(precision)
        ib_kw = (
            dict(v_strategy="inbank", inbank_cols=(center_index(k, c).start, c))
            if inbank
            else {}
        )

        def step(state, chunk):
            imgs_c, w_c = chunk
            imgs_c = imgs_c.reshape(cs, *hwc)
            patches = extract_patches(imgs_c, k).reshape(cs * per_img, d)
            # inbank: the kernel slices centers from the bank basis — the
            # per-chunk centers gather disappears along with the V operand
            centers = None if inbank else patch_centers(patches, k, c)
            pn = jnp.sum(patches**2, axis=-1)
            w_p = jnp.repeat(w_c, per_img)
            return (
                flash_score_update(
                    xq_flat, qn_flat, patches, pn, centers, w_p, at, bt, state,
                    # precision ladder: 'highest' fp32 dots; 'high' bf16x3
                    # dots + fp32 elementwise; 'default' adds bf16 exp for
                    # the VPU-bound elementwise (never pure-bf16 dots — the
                    # 1/(2 beta) logit scaling amplifies their rounding)
                    precision=precision,
                    fast_exp=(precision == "default"),
                    interpret=_interpret_flag(),
                    **ib_kw,
                ),
                None,
            )

        if state0 is None:
            state0 = (
                jnp.full((M,), -jnp.inf, jnp.float32),
                jnp.zeros((M,), jnp.float32),
                jnp.zeros((M, c), jnp.float32),
            )
        state, _ = jax.lax.scan(
            step, state_to_pallas(*state0), (images_p, w_img_p)
        )
        return state_from_pallas(*state)

    # jnp fallback path: honor the precision ladder like the kernel —
    # HIGH (bf16x3) for the non-parity tiers, never pure bf16 (DEFAULT)
    jnp_prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.HIGH
    )

    def step(state, chunk):
        imgs_c, w_c = chunk
        imgs_c = imgs_c.reshape(cs, *hwc)
        patches = extract_patches(imgs_c, k).reshape(cs * per_img, d)
        centers = patch_centers(patches, k, c)
        pn = jnp.sum(patches**2, axis=-1)
        w_p = jnp.repeat(w_c, per_img)
        dots = jnp.einsum(
            "qd,pd->qp", xq_flat, patches, precision=jnp_prec
        )
        logits = -(qn_flat[:, None] - 2.0 * at * dots + at**2 * pn) / beta2
        return update_state(state, logits, w_p[None, :], centers), None

    init = SoftmaxState(*state0) if state0 is not None else init_state((M,), c)
    state, _ = jax.lax.scan(step, init, (images_p, w_img_p))
    return state.m, state.s1, state.s2


def banked_sweep(
    q_flat,  # [M, d] query windows
    qn_flat,  # [M]
    bank,  # [nblk, B*d] PREBUILT compact chunks (scores.bank layout)
    centers,  # [nblk, B*c]
    pn,  # [nblk, B]
    w_b,  # [nblk, B] weights, or [nblk, S, B] per-seed (vector-label mode)
    at,
    bt,
    *,
    B: int,
    d: int,
    c: int,
    use_pallas: bool,
    precision: str,
    rows_per_seed: int | None = None,  # required when w_b is per-seed
    state0=None,  # (m, s1, s2) -inf convention; None = empty
    return_m: bool = False,  # also return m (for segment chaining)
    inbank_col: int | None = None,  # centers == bank[:, col:col+c] (ELS/bbELS
    # center banks) — enables the kernel's 'inbank' strategy under the
    # CDT_ELS_INBANK_MAX_DP gate, dropping the centers stream entirely
    masks=None,  # [nblk, nQb, nPb] int32 per-chunk exact-skip tiles
    # (ops.prune; clustered banks only). Applied on the pallas path; the
    # jnp fallback ignores them — pruning is exact, so results agree.
):
    """Scan prebuilt bank chunks through the online softmax; returns
    (s1 [M], s2 [M, c]) — or (m, s1, s2) with return_m, so dispatch
    segmentation (ops.dispatch) can chain sweeps over nblk slices via
    `state0`. The single sweep implementation behind both the ELS bank
    mode and the bbELS center region (their banks are identical: the valid
    k x k patches of the training images). Each step reshapes its own flat
    block back to [B, d] — a transient few-MB padded copy."""
    M = q_flat.shape[0]
    beta2 = 2.0 * bt**2
    vector = w_b.ndim == 3

    if use_pallas:
        from ..ops.flash_score import (
            flash_score_update,
            state_from_pallas,
            state_to_pallas,
        )

        inbank = (
            inbank_col is not None
            and -(-d // 128) * 128 <= _inbank_max_dp(precision)
        )
        ib_kw = (
            dict(v_strategy="inbank", inbank_cols=(inbank_col, c))
            if inbank
            else {}
        )

        def step(state, blk):
            if masks is None:
                kb, vb, pnb, wb = blk
                mk = None
            else:
                kb, vb, pnb, wb, mk = blk
            return (
                flash_score_update(
                    q_flat, qn_flat, kb.reshape(B, d), pnb,
                    None if inbank else vb.reshape(B, c), wb, at, bt, state,
                    precision=precision,
                    fast_exp=(precision == "default"),
                    rows_per_seed=rows_per_seed if vector else None,
                    interpret=_interpret_flag(),
                    prune_mask=mk,
                    **ib_kw,
                ),
                None,
            )

        if state0 is None:
            state0 = (
                jnp.full((M,), -jnp.inf, jnp.float32),
                jnp.zeros((M,), jnp.float32),
                jnp.zeros((M, c), jnp.float32),
            )
        # inbank: the centers chunks stay OUT of the scan operands — their
        # HBM stream (B*c fp32 per block) disappears with the V operand
        xs = (
            (bank, jnp.zeros((bank.shape[0], 1), bank.dtype), pn, w_b)
            if inbank
            else (bank, centers, pn, w_b)
        )
        if masks is not None:
            xs = xs + (masks,)
        state, _ = jax.lax.scan(step, state_to_pallas(*state0), xs)
        m, s1, s2 = state_from_pallas(*state)
        return (m, s1, s2) if return_m else (s1, s2)

    jnp_prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.HIGH  # bf16x3, never pure bf16
    )

    def step(state, blk):
        kb, vb, pnb, wb = blk
        kb = kb.reshape(B, d)
        vb = vb.reshape(B, c)
        dots = jnp.einsum("qd,pd->qp", q_flat, kb, precision=jnp_prec)
        logits = -(qn_flat[:, None] - 2.0 * at * dots + at**2 * pnb) / beta2
        if vector:
            # per-seed weights: rows of seed s use wb[s]
            wrow = jnp.repeat(wb, rows_per_seed, axis=0)  # [M, B]
            return update_state(state, logits, wrow, vb), None
        return update_state(state, logits, wb[None, :], vb), None

    init = SoftmaxState(*state0) if state0 is not None else init_state((M,), c)
    state, _ = jax.lax.scan(step, init, (bank, centers, pn, w_b))
    return (
        (state.m, state.s1, state.s2) if return_m else (state.s1, state.s2)
    )


class LocalEquivScoreModule(BankCacheMixin, ScoreModuleBase):
    """mode: boundary condition of the QUERY padding (the paper's ELS uses
    circular; the bank always uses valid patches).

    use_pallas: route the bank sweep through the fused flash-score Pallas
    kernel (ops.flash_score). None (default) = auto: on for TPU backends,
    off for CPU (where the jnp path is used; the kernel itself is also
    CPU-testable via interpret mode)."""

    # label may be a [b] vector (one label per seed) — batched conditional
    # generation in ONE sweep; the reference can only filter per scalar call
    supports_vector_label = True

    def __init__(
        self,
        dataset,
        *,
        batch_size: int = 64,
        target_block: int = 65536,
        use_pallas: bool | None = None,
        bank_budget_bytes: int = 8 << 30,
        bank_ledger=None,
        dispatch_target_s: float | None = None,
        prune: bool | None = None,  # exact block pruning for cached banks
        # (ops.prune): clustered bank layout + per-call skip masks. None =
        # env CDT_FLASH_PRUNE; off by default.
        **kw,
    ):
        super().__init__(dataset, batch_size=batch_size, **kw)
        # Patch banks are immutable per (k, dataset): cache the extracted
        # bank in HBM when it fits the ledger budget, so extraction
        # amortizes to zero across ScheduledScoreMachine steps and samples
        # (the sweep becomes pure MXU matmuls over bank blocks). The budget
        # is CUMULATIVE across kernel sizes — a 20-step scales schedule
        # touches up to 8 distinct k's and their banks would otherwise sum
        # past HBM. Default 8 GiB: at 50k-CIFAR scale this caches the k=3
        # bank (5.58 GB) and streams the rest — the 12.39 GB k=5 bank fits
        # a 16 GB v5e on paper but RESOURCE_EXHAUSTs at runtime next to the
        # image set + per-call transients (measured, round 2). Banks are
        # stored fp32: bf16 storage would round patch values at 2^-9, which
        # the 1/(2 beta^2) logit scaling amplifies to ~19% posterior error
        # at low noise — the same failure mode that forces fp32 QK dots
        # (PERFORMANCE.md). At 50k-image scale the uncached path's
        # on-the-fly extraction is amortized to noise by the per-sweep
        # softmax work anyway.
        self._init_bank_cache(
            target_block=target_block, use_pallas=use_pallas,
            bank_budget_bytes=bank_budget_bytes, bank_ledger=bank_ledger,
            dispatch_target_s=dispatch_target_s, prune=prune,
        )

    def _build_bank_mode(self, *, k: int, x_shape, has_label: bool,
                         vector_label: bool = False):
        """Jitted scorer over a precomputed (padded) patch bank.

        vector_label=True: `lab` is a [b] vector — one label PER SEED
        (batched conditional generation, a capability the reference lacks:
        its modules filter by one scalar label per call, idealscore.py:435).
        Per-seed weights ride into the flash kernel as per-seed bias rows
        (each h*w-query block maps to its seed's row — zero per-pair cost)."""
        batch_size = self.batch_size
        max_samples = self.max_samples
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        n_img, h, w, c = self.images.shape
        g = bank_geometry(n_img, h, w, c, k, self.target_block)
        per_img, B, d = g.per_img, g.block, g.d
        pad_img = g.nblk * g.cs - n_img
        b = x_shape[0]
        # dispatch segmentation: bound each device execution's wall-clock
        # (ops.dispatch — the axon tunnel kills executions over ~60 s)
        n_seg = plan_segments(
            float(g.nblk) * B * (b * h * w),
            precision=self.precision, d=d, n_chunks=g.nblk,
            target_s=self.dispatch_target_s,
        )

        hw = h * w
        M = b * hw

        # exact block pruning (ops.prune): clustered cached banks carry
        # per-row image indices (weights follow the permutation) and
        # per-kernel-block stats; per call a skip-mask marks tiles whose
        # posterior weights provably underflow to exact fp32 zero.
        clustered = getattr(self, "prune", False)
        mask_idx = None
        if clustered and use_pallas and not vector_label \
                and self.precision in ("high", "highest") \
                and -(-d // 128) * 128 > _inbank_max_dp(self.precision):
            from ..ops.flash_score import resolve_blocks
            from ..ops.prune import PRUNE_BLOCK

            bq_k, bp_k = resolve_blocks(M, B, d, self.precision, "vpu")
            if M % bq_k == 0 and PRUNE_BLOCK % bp_k == 0:
                import numpy as np

                npb_kernel = -(-B // bp_k)
                # kernel block j of each chunk sits inside stats block
                # (j*bp)//PRUNE_BLOCK (bp divides PRUNE_BLOCK, grids share
                # origin 0 — no straddle)
                mask_idx = np.array(
                    [(j * bp_k) // PRUNE_BLOCK for j in range(npb_kernel)]
                )

        def build_inputs(labels, order, x, lab, img_idx=None):
            """Bank weights + flattened queries — the SINGLE source for both
            the one-shot fn and the segmented prep jit (the two dispatch
            paths must stay bit-identical; ops.dispatch tests pin it).
            img_idx (clustered banks): per-row source-image index — weights
            gather through it instead of the image-major repeat."""

            def weights_for(one_lab):
                w_img = image_weights(
                    labels,
                    one_lab,
                    batch_size=batch_size,
                    max_samples=max_samples,
                    cutoff=CutoffRule.UNFILTERED,
                    weighting=Weighting.MEAN,
                    per_image_bank=per_img,
                    order=order,
                )
                if pad_img:  # chunk-padding images get zero weight
                    w_img = jnp.concatenate(
                        [w_img, jnp.zeros((pad_img,), w_img.dtype)]
                    )
                if img_idx is not None:
                    return w_img[img_idx.reshape(-1)]  # [nblk * B] permuted
                return jnp.repeat(w_img, per_img)  # [nblk * B]

            if vector_label:
                w_patch = jax.vmap(weights_for)(lab)  # [b, nblk * B]
                w_b = w_patch.reshape(b, -1, B).transpose(1, 0, 2)  # [nblk, b, B]
            else:
                w_b = weights_for(lab if has_label else None).reshape(-1, B)
            xq = extract_patches(pad_image(x, k // 2, "circular"), k)
            xq_flat = xq.reshape(M, d)
            qn_flat = jnp.sum(xq_flat**2, axis=-1)
            return w_b, xq_flat, qn_flat

        def build_masks(w_b, xq_flat, qn_flat, at, bt, stats):
            """[nblk, M/bq, npb_kernel] int32 skip tiles (see ops.prune)."""
            from ..ops.prune import logw_block_stats, prune_masks

            lmax, lmin, anyinc = logw_block_stats(w_b, B)
            mk = prune_masks(
                xq_flat, qn_flat, at, bt, stats, lmax, lmin, anyinc,
                block_q=bq_k,
            )  # [M/bq, J]
            mk = mk.reshape(M // bq_k, g.nblk, -1)[:, :, mask_idx]
            return mk.transpose(1, 0, 2)

        def fn(bank, centers, pn, labels, order, x, lab, at, bt,
               img_idx=None, stats=None):
            # bank/centers/pn arrive in the compact chunked layout
            # ([nblk, B*d] etc. — see scores.bank); each scan step below
            # reshapes its own block back to [B, d] (a transient small copy)
            w_b, xq_flat, qn_flat = build_inputs(
                labels, order, x, lab, img_idx=img_idx
            )
            masks = (
                build_masks(w_b, xq_flat, qn_flat, at, bt, stats)
                if mask_idx is not None and stats is not None
                else None
            )

            s1_, s2_ = banked_sweep(
                xq_flat, qn_flat, bank, centers, pn, w_b, at, bt,
                B=B, d=d, c=c, use_pallas=use_pallas,
                precision=self.precision,
                rows_per_seed=hw if vector_label else None,
                inbank_col=center_index(k, c).start,
                masks=masks,
            )

            mean_center = (s2_ / s1_[:, None]).reshape(b, h * w, c)
            score = -(x.reshape(b, h * w, c) - at * mean_center) / (bt**2)
            return score.reshape(x.shape)

        if n_seg == 1:
            return jax.jit(fn, static_argnames=())

        # --- segmented dispatch (n_seg > 1): the sweep splits into n_seg
        # back-to-back executions over nblk slices, softmax state carried on
        # device between them — bit-exact vs the one-shot path (the scan is
        # sequential either way), but no single execution outlives the
        # dispatch target (ops.dispatch; the axon tunnel kills ~60 s+ calls).
        # Slicing the cached bank per segment is a transient device copy of
        # 1/n_seg of the bank; the last segment may be shorter (at most two
        # distinct compile shapes).
        precision = self.precision
        qsz = -(-g.nblk // n_seg)
        edges = list(range(0, g.nblk, qsz)) + [g.nblk]

        @jax.jit
        def prep(labels, order, x, lab, img_idx=None, stats=None, at=None,
                 bt=None):
            w_b, xq_flat, qn_flat = build_inputs(
                labels, order, x, lab, img_idx=img_idx
            )
            masks = (
                build_masks(w_b, xq_flat, qn_flat, at, bt, stats)
                if mask_idx is not None and stats is not None
                else None
            )
            return w_b, xq_flat, qn_flat, masks

        def make_seg(with_masks):
            @jax.jit
            def seg(bank_s, centers_s, pn_s, w_s, masks_s, xq_flat, qn_flat,
                    at, bt, state):
                return banked_sweep(
                    xq_flat, qn_flat, bank_s, centers_s, pn_s, w_s, at, bt,
                    B=B, d=d, c=c, use_pallas=use_pallas, precision=precision,
                    rows_per_seed=hw if vector_label else None,
                    state0=state, return_m=True,
                    inbank_col=center_index(k, c).start,
                    masks=masks_s if with_masks else None,
                )

            return seg

        seg_plain = make_seg(False)
        seg_masked = make_seg(True)

        @jax.jit
        def finish(s1_, s2_, x, at, bt):
            mean_center = (s2_ / s1_[:, None]).reshape(b, hw, c)
            score = -(x.reshape(b, hw, c) - at * mean_center) / (bt**2)
            return score.reshape(x.shape)

        def host_fn(bank, centers, pn, labels, order, x, lab, at, bt,
                    img_idx=None, stats=None):
            w_b, xq_flat, qn_flat, masks = prep(
                labels, order, x, lab, img_idx=img_idx, stats=stats,
                at=at, bt=bt,
            )
            state = (
                jnp.full((M,), -jnp.inf, jnp.float32),
                jnp.zeros((M,), jnp.float32),
                jnp.zeros((M, c), jnp.float32),
            )
            for i0, i1 in zip(edges[:-1], edges[1:]):
                if masks is None:
                    state = seg_plain(
                        bank[i0:i1], centers[i0:i1], pn[i0:i1], w_b[i0:i1],
                        None, xq_flat, qn_flat, at, bt, state,
                    )
                else:
                    state = seg_masked(
                        bank[i0:i1], centers[i0:i1], pn[i0:i1], w_b[i0:i1],
                        masks[i0:i1], xq_flat, qn_flat, at, bt, state,
                    )
            return finish(state[1], state[2], x, at, bt)

        return host_fn

    def __call__(self, t, x, label=None, device=None, k=None, order=None):
        kk = int(k) if k is not None else self.kernel_size
        if kk % 2 == 0 or kk < 1:
            raise ValueError(
                f"kernel size must be odd and positive, got {kk}"
            )
        import numpy as np

        vector_label = (
            label is not None and getattr(np.asarray(label), "ndim", 0) == 1
        )
        bank = self._bank(kk)
        if bank is None:
            if vector_label:
                # streaming fallback: group seeds by unique label and stitch
                # (semantically identical; the bank path batches them truly).
                # Resolve the stream order ONCE so a shuffle=True module uses
                # the same permutation for every group, like the bank path.
                order = self._stream_order(order)
                x = jnp.asarray(x, jnp.float32)
                labs_np = np.asarray(label)
                out = jnp.zeros_like(x)
                for lab_val in np.unique(labs_np):
                    sel = np.nonzero(labs_np == lab_val)[0]
                    # pad the group to the next power of two: otherwise
                    # every distinct group size is a fresh x.shape -> a
                    # fresh jit compile (minutes each on the remote
                    # tunnel); padded zero seeds cost compute, not compiles
                    m = len(sel)
                    size = 1 << (m - 1).bit_length()
                    xg = x[sel]
                    if size > m:
                        xg = jnp.concatenate(
                            [xg, jnp.zeros((size - m, *x.shape[1:]), x.dtype)]
                        )
                    part = super().__call__(
                        t, xg, label=int(lab_val), k=kk, order=order
                    )
                    out = out.at[sel].set(part[:m])
                return out
            return super().__call__(t, x, label=label, k=kk, order=order)
        from .base import _as_scalar_t

        x = jnp.asarray(x, jnp.float32)
        t = _as_scalar_t(t)
        beta = self.schedule(t)
        at = jnp.sqrt(1.0 - beta)
        bt = jnp.sqrt(beta)
        has_label = label is not None
        key = ("bank", kk, x.shape, has_label, vector_label)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_bank_mode(
                k=kk, x_shape=x.shape, has_label=has_label,
                vector_label=vector_label,
            )
        if vector_label:
            lab = jnp.asarray(label, jnp.int32)
        else:
            lab = jnp.asarray(label if has_label else -1, jnp.int32)
        from .bank import ClusteredBank

        if isinstance(bank, ClusteredBank):
            return self._jit_cache[key](
                bank.bank, bank.centers, bank.pn, self.labels,
                self._stream_order(order), x, lab, at, bt,
                img_idx=bank.img_idx, stats=bank.stats,
            )
        return self._jit_cache[key](
            *bank, self.labels, self._stream_order(order), x, lab, at, bt
        )

    def _build(self, *, k: int, x_shape, has_label: bool):
        """Streaming (bank-less) scorer. Mesh-aware: when the subclass sets
        `mesh`/`axis` (parallel.ShardedLocalEquivScoreModule), the dataset
        shards over the mesh axis and each device's partial softmax state
        merges with the pmax/psum collective — the single source for both
        the single-device and sharded sweeps (same pattern as bbELS)."""
        batch_size = self.batch_size
        max_samples = self.max_samples
        cs = self._chunk_images(k)
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        precision = self.precision
        mesh = getattr(self, "mesh", None)
        shard_axis = getattr(self, "axis", "data")
        n_dev = mesh.shape[shard_axis] if mesh is not None else 1

        # dispatch segmentation plan (single-device only). A sharded sweep
        # runs unsegmented by design: the ~60 s execution kill is an
        # axon-TUNNEL artifact (ops/dispatch.py) and the tunnel exposes one
        # chip — real multi-chip runtimes don't impose it, and per-device
        # work is already 1/n_dev there. If a watchdog-limited multi-chip
        # tunnel ever appears, segmenting would need the per-device softmax
        # states threaded across shard_map boundaries (deferring the
        # merge_collective to the last segment).
        n_img, hh, ww, cc = self.images.shape
        b_ = x_shape[0]
        per_img_ = (hh - k + 1) * (ww - k + 1)
        n_chunks_ = -(-n_img // cs)
        n_seg = 1 if mesh is not None else plan_segments(
            float(n_chunks_) * cs * per_img_ * (b_ * hh * ww),
            precision=precision, d=k * k * cc, n_chunks=n_chunks_,
            target_s=self.dispatch_target_s,
        )

        h, w, c = hh, ww, cc
        per_img = per_img_
        d = k * k * cc
        b = b_
        M = b * h * w

        def stream_inputs(labels, order, x, lab):
            """Stream weights + flattened queries — the SINGLE source for
            both the one-shot fn and the segmented prep jit (the two
            dispatch paths must stay bit-identical; ops.dispatch tests pin
            it). The chunk padding/reshape stays per-path: the one-shot fn
            is mesh-aware (leading n_dev dim) while the segmented prep must
            keep arrays 2-D across its jit boundary (layout note below)."""
            w_img = image_weights(
                labels,
                lab if has_label else None,
                batch_size=batch_size,
                max_samples=max_samples,
                cutoff=CutoffRule.UNFILTERED,
                weighting=Weighting.MEAN,
                per_image_bank=per_img,
                order=order,
            )
            xq = extract_patches(pad_image(x, k // 2, "circular"), k)
            xq_flat = xq.reshape(M, d)
            qn_flat = jnp.sum(xq_flat**2, axis=-1)  # [M]
            return w_img, xq_flat, qn_flat

        def fn(images, labels, order, x, lab, at, bt):
            n = images.shape[0]
            w_img, xq_flat, qn_flat = stream_inputs(labels, order, x, lab)
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

            if mesh is None:
                _, s1_, s2_ = els_sweep(
                    images_p, w_img_p, xq_flat, qn_flat, at, bt,
                    k=k, cs=cs, hwc=(h, w, c), per_img=per_img, c=c,
                    use_pallas=use_pallas,
                    precision=precision,
                )
            else:
                from jax.sharding import PartitionSpec as P

                from ..parallel.sharded_score import merge_collective

                def local(images_s, w_s, xq_flat, qn_flat, at, bt):
                    # shard_map adds a leading device dim of size 1 per spec
                    m, s1, s2 = els_sweep(
                        images_s[0], w_s[0], xq_flat, qn_flat, at, bt,
                        k=k, cs=cs, hwc=(h, w, c), per_img=per_img, c=c,
                        use_pallas=use_pallas,
                        precision=precision,
                    )
                    m, s1, s2 = merge_collective(m, s1, s2, shard_axis)
                    return s1, s2

                s1_, s2_ = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P(shard_axis), P(shard_axis), P(), P(), P(), P()),
                    out_specs=(P(), P()),
                    # the scan carry starts replicated and becomes device-
                    # varying after folding in the shard — skip vma checks
                    check_vma=False,
                )(images_p, w_img_p, xq_flat, qn_flat, at, bt)

            mean_center = (s2_ / s1_[:, None]).reshape(b, h * w, c)
            score = -(x.reshape(b, h * w, c) - at * mean_center) / (bt**2)
            return score.reshape(x.shape)

        if n_seg == 1:
            return jax.jit(fn)

        # --- segmented dispatch (n_seg > 1, single device): the chunk scan
        # splits into n_seg back-to-back executions, the online-softmax state
        # carried on device between them — bit-exact vs the one-shot scan
        # (sequential either way), but each execution stays under the
        # dispatch target (ops.dispatch; the axon tunnel kills ~60 s+ calls).
        qsz = -(-n_chunks_ // n_seg)
        edges = list(range(0, n_chunks_, qsz)) + [n_chunks_]

        @jax.jit
        def prep(images, labels, order, x, lab):
            # NOTE: arrays crossing this jit boundary stay 2-D with the big
            # flat dim minor. A [n_chunks, cs, hwc] OUTPUT leaves its layout
            # to XLA's output-layout assignment, which (measured, k=9@64x64)
            # can pick the cs dim as minor — T(8,128) lane-pads cs=20 to 128,
            # a 6.4x/14.7 GB HBM blowup that OOMs the compile. Inside the
            # one-shot fn the same reshape sits next to its scan consumer
            # and gets the sane flat-minor layout; the segment fn therefore
            # re-does the [rows, hwc] -> [chunks, cs, hwc] reshape itself.
            n = images.shape[0]
            w_img, xq_flat, qn_flat = stream_inputs(labels, order, x, lab)
            pad = (-n) % cs
            images_flat = jnp.concatenate(
                [images.reshape(n, h * w * c),
                 jnp.zeros((pad, h * w * c), images.dtype)]
            )
            w_flat = jnp.concatenate([w_img, jnp.zeros((pad,), w_img.dtype)])
            return images_flat, w_flat, xq_flat, qn_flat

        @jax.jit
        def seg(images_s, w_s, xq_flat, qn_flat, at, bt, state):
            return els_sweep(
                images_s.reshape(-1, cs, h * w * c), w_s.reshape(-1, cs),
                xq_flat, qn_flat, at, bt,
                k=k, cs=cs, hwc=(h, w, c), per_img=per_img, c=c,
                use_pallas=use_pallas, precision=precision, state0=state,
            )

        @jax.jit
        def finish(s1_, s2_, x, at, bt):
            mean_center = (s2_ / s1_[:, None]).reshape(b, h * w, c)
            score = -(x.reshape(b, h * w, c) - at * mean_center) / (bt**2)
            return score.reshape(x.shape)

        def host_fn(images, labels, order, x, lab, at, bt):
            images_flat, w_flat, xq_flat, qn_flat = prep(
                images, labels, order, x, lab
            )
            state = (
                jnp.full((M,), -jnp.inf, jnp.float32),
                jnp.zeros((M,), jnp.float32),
                jnp.zeros((M, c), jnp.float32),
            )
            for i0, i1 in zip(edges[:-1], edges[1:]):
                state = seg(
                    images_flat[i0 * cs : i1 * cs], w_flat[i0 * cs : i1 * cs],
                    xq_flat, qn_flat, at, bt, state,
                )
            return finish(state[1], state[2], x, at, bt)

        return host_fn
