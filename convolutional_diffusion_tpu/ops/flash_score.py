"""Fused flash-score Pallas TPU kernel — the ELS inner loop.

Computes, for a block of queries Q (x's k x k windows) against a bank K of
training patches with values V (patch centers) and per-patch weights w, the
running online-softmax statistics

    logit(q, p) = -(||q||^2 - 2 a_t <q, p> + a_t^2 ||p||^2) / (2 beta_t)
    m  = max_p logit,   s1 = sum_p w_p e^{logit - m},
    s2 = sum_p w_p e^{logit - m} V_p

without ever materializing the [M, P] logit matrix in HBM: the QK^T dot rides
the MXU, and max/exp/accumulate fuse in VMEM (flash-attention structure; this
replaces the reference's conv2d-with-P-filters formulation of the patch dot
products, /root/reference/src/utils/idealscore.py:454, whose [b, P, h, w]
tensor is the torch version's memory wall).

Grid = (query blocks, patch blocks) with the patch dimension innermost; the
output state block for a fixed query block stays VMEM-resident across patch
visits (initialized from the carried input state at the first visit), so the
kernel chains across dataset chunks exactly like `scores.common.update_state`
— same math, same streaming-merge semantics.

Dimensions are padded: d (patch features) to a multiple of 128 with zeros
(zero features do not change distances), the value dim c to 128 lanes, P to
the patch block with w=0 padding, M to the query block (masked rows).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float(-1e30)  # finite -inf stand-in: keeps exp()/rescale exact at fp32

# Large-M x large-d VMEM-guard thresholds (see the guard comments in
# flash_score_update). Module-level so tests can exercise the chunked path
# at CPU-sized shapes (tests/test_flash_score.py::test_query_chunking).
QCHUNK = 16384  # query rows per chunked call
QCHUNK_MIN_DP = 640  # padded d at/above which chunking engages
# At dp >= 1152 the kernel tiles are ~2.6 MB bigger than the dp=896 configs
# the 16384-row chunk was validated on, and the chunk outputs XLA places in
# scoped VMEM (S(1), [Q,128] plus two [Q,1] columns) tip the 16 MB stack
# over by ~0.8 MB (measured AOT error, k=19@64x64 'high' 256x1024 blocks).
# Halve the chunk there: outputs shrink ~4.2 MB, rate impact is noise (the
# grid already re-reads K per 256-row query block either way).
QCHUNK_BIG_DP = 1152  # padded d at/above which the chunk halves


def _env_int(name: str) -> int | None:
    """Optional integer override from the environment (A/B experiments on
    the remote TPU without code edits: CDT_FLASH_QCHUNK overrides the
    chunked-path query-chunk rows, CDT_FLASH_BQ_CHUNK its query block,
    CDT_FLASH_BP the patch block wherever the policy would choose)."""
    val = os.environ.get(name)
    return int(val) if val else None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def resolve_blocks(
    M: int, P: int, d: int, precision: str,
    v_strategy: str = "vpu",
) -> Tuple[int, int]:
    """The (block_q, block_p) the non-chunked kernel path will choose for
    these shapes (exported so ops.prune mask builders can size the
    [nQb, nPb] skip matrix without duplicating the policy). Mirrors the
    default-policy branches of flash_score_update exactly (env overrides
    CDT_FLASH_BP etc. intentionally included)."""
    block_q = block_p = None
    if M > 32768 and 384 <= _round_up(d, 128) < 640:
        block_q = 256
    if M > 65536 and 256 <= _round_up(d, 128) < 384:
        block_q = 256
    dp_est = _round_up(d, 128)
    if precision == "highest":
        if dp_est <= 512:
            bq_d, bp_d = 256, 2048
            if v_strategy == "inbank" and dp_est >= 256:
                bp_d = 1024
        elif dp_est <= 1152:
            bq_d, bp_d = 256, 1024
        elif dp_est <= 2048:
            bq_d, bp_d = 256, 512
        else:
            bq_d, bp_d = 256, 256
    else:
        if dp_est <= 384:
            bq_d, bp_d = 512, 2048
            if v_strategy == "inbank" and dp_est >= 384:
                bp_d = 1024
        elif dp_est <= 896:
            bq_d, bp_d = 512, 1024
        elif dp_est <= 1152:
            bq_d, bp_d = 256, 1024
        elif dp_est <= 2048:
            bq_d, bp_d = 512, 512
        else:
            bq_d, bp_d = 256, 512
    if block_q is None:
        block_q = max(256, min(bq_d, _round_up(M, 256)))
    block_p = _env_int("CDT_FLASH_BP")
    if block_p is None:
        block_p = max(min(512, bp_d), min(bp_d, _round_up(P, 512)))
    return block_q, block_p


def _kernel(
    bias_ref, q_ref, k_ref, *refs,
    precision, c, v_strategy, fast_exp, s1_fused=False, prune=False,
):
    # Everything stays 2D in natural orientation (m/s1: [BQ, 1] columns;
    # bias: [1, BP] rows) — 1-wide column extractions would force Mosaic
    # sublane<->lane relayouts that blow the VMEM stack.
    from jax.experimental import pallas as pl

    skip_ref = None
    if prune:
        # exact block pruning (ops.prune): an SMEM (1,1) skip bit per grid
        # position; skipped tiles provably underflow to exact fp32 zero, so
        # the whole body (MXU dot + VPU softmax passes) is gated off. The
        # tile DMAs still run (the pipeline is unconditional) — the win is
        # compute, which dominates at the small-k steps this targets.
        skip_ref, *refs = refs
    if v_strategy == "inbank":
        # no separate values operand: V IS a column slice of the bank, so
        # s2 accumulates in the bank basis as one MXU dot e @ K (the
        # wrapper slices the center columns on exit)
        v_ref = None
        scale_ref, m_in, s1_in, s2_in, m_ref, s1_ref, s2_ref = refs
    else:
        v_ref, scale_ref, m_in, s1_in, s2_in, m_ref, s1_ref, s2_ref = refs

    pj = pl.program_id(1)

    @pl.when(pj == 0)
    def _():  # first patch block for this query block: load carried state
        m_ref[:, :] = m_in[:, :]
        s1_ref[:, :] = s1_in[:, :]
        s2_ref[:, :] = s2_in[:, :]

    if prune:
        qi = pl.program_id(0)

        @pl.when(skip_ref[qi, pj] == 0)
        def _():
            _kernel_body(
                bias_ref, q_ref, k_ref, v_ref, scale_ref,
                m_ref, s1_ref, s2_ref,
                precision=precision, c=c, v_strategy=v_strategy,
                fast_exp=fast_exp, s1_fused=s1_fused,
            )
        return
    _kernel_body(
        bias_ref, q_ref, k_ref, v_ref, scale_ref, m_ref, s1_ref, s2_ref,
        precision=precision, c=c, v_strategy=v_strategy,
        fast_exp=fast_exp, s1_fused=s1_fused,
    )


def _kernel_body(
    bias_ref, q_ref, k_ref, v_ref, scale_ref, m_ref, s1_ref, s2_ref,
    *, precision, c, v_strategy, fast_exp, s1_fused,
):
    from jax.experimental import pallas as pl  # noqa: F401

    dotscale = scale_ref[0, 0]  # (2 a_t / (2 beta_t^2)) * log2(e)

    if precision != jax.lax.Precision.HIGHEST:
        # manual bf16x3 (the 'HIGH' algorithm — Mosaic kernels only expose
        # DEFAULT/HIGHEST): split into hi/lo bf16 parts; error ~2^-16 rel,
        # harmless even under the 1/(2 beta) logit amplification, at half
        # the MXU passes of HIGHEST. Used by BOTH the 'high' middle tier
        # (bf16x3 dots + fp32 elementwise) and 'default' fast mode (bf16x3
        # dots + bf16 exp) — a pure-bf16 dot is never emitted: the logit
        # scaling amplifies its 2^-9 rounding to ~19% posterior error.
        q = q_ref[:, :]
        kt = k_ref[:, :].T
        qh = q.astype(jnp.bfloat16)
        ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        kh = kt.astype(jnp.bfloat16)
        kl = (kt - kh.astype(jnp.float32)).astype(jnp.bfloat16)
        dots = (
            jnp.dot(qh, kh, preferred_element_type=jnp.float32)
            + jnp.dot(qh, kl, preferred_element_type=jnp.float32)
            + jnp.dot(ql, kh, preferred_element_type=jnp.float32)
        )
    else:
        dots = jnp.dot(
            q_ref[:, :], k_ref[:, :].T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [BQ, BP]
    # The per-pair logit assembly is ONE fma: everything per-patch — the
    # -a_t^2 ||p||^2 / (2 beta^2) term AND the log-space weight (log2 w, or
    # NEG_INF for excluded/padded entries; uniform weights are free) — is
    # pre-folded into the bias row by the wrapper, and the per-QUERY
    # -||q||^2 / (2 beta^2) term is dropped entirely: it is constant along
    # the softmax axis, so the wrapper shifts the carried m by it on entry
    # and back on exit (an exact change of the online-softmax offset; s2/s1
    # and the external state convention are unchanged). The kernel works in
    # BASE-2 log space (log2(e) folded into dotscale/bias by the wrapper):
    # exp lowers to exp2(x * log2e) on the VPU anyway, so exp2 saves one
    # [BQ, BP] multiply pass per block visit.
    logits = dots * dotscale + bias_ref[:, :]

    m_old = m_ref[:, :]  # [BQ, 1]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=1, keepdims=True))
    # guard fully-empty rows (m == NEG_INF): exp offsets from 0
    m_safe = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
    fast = fast_exp
    if fast:
        # fast mode: the exp elementwise work dominates (VPU-bound); bf16
        # doubles VPU lanes. logits - m_safe <= 0 so exp2 in [0, 1] — bf16's
        # ~3 decimal digits cost ~4e-3 relative on posterior means.
        e = jnp.exp2((logits - m_safe).astype(jnp.bfloat16))
    else:
        e = jnp.exp2(logits - m_safe)  # [BQ, BP]; excluded entries underflow
    scale = jnp.where(m_old <= NEG_INF * 0.5, 0.0, jnp.exp2(m_old - m_safe))

    if v_strategy == "mxu1":
        # fused fast path: V carries a ones column at lane c, so ONE bf16
        # MXU dot e @ [V|1] accumulates s2 AND s1 (the s1 lane) together —
        # zero per-channel VPU passes, and the MXU is nearly idle at small d
        s2_ref[:, :] = s2_ref[:, :] * scale + jnp.dot(
            e.astype(jnp.bfloat16), v_ref[:, :],
            preferred_element_type=jnp.float32,
        )
        m_ref[:, :] = m_new
        return

    if not s1_fused:
        s1_ref[:, :] = s1_ref[:, :] * scale + jnp.sum(
            e, axis=1, keepdims=True, dtype=jnp.float32
        )
    if v_strategy == "inbank":
        # The patch CENTER values are columns of the bank itself, so the
        # s2 accumulation sum_p w_p e_p V_p is (e @ K)[:, center_cols] —
        # one MXU dot against the K tile already in VMEM. This removes the
        # separate values operand entirely (its HBM stream, its VMEM tile,
        # and the per-chunk centers gather) AND the c per-channel VPU
        # reduction passes of the 'vpu' strategy — the dominant VPU cost at
        # small d, where the MXU is mostly idle. s2 carries dp lanes; only
        # the center columns are meaningful (the rest never leave the
        # wrapper). Precision mirrors the QK dot's tier: fp32 HIGHEST /
        # manual bf16x3 / single bf16 pass in fast mode.
        kb = k_ref[:, :]
        if precision == jax.lax.Precision.HIGHEST:
            acc = jnp.dot(
                e, kb, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        elif fast:
            acc = jnp.dot(
                e, kb.astype(jnp.bfloat16), preferred_element_type=jnp.float32
            )
        else:
            eh = e.astype(jnp.bfloat16)
            el = (e - eh.astype(jnp.float32)).astype(jnp.bfloat16)
            kbh = kb.astype(jnp.bfloat16)
            kbl = (kb - kbh.astype(jnp.float32)).astype(jnp.bfloat16)
            acc = (
                jnp.dot(eh, kbh, preferred_element_type=jnp.float32)
                + jnp.dot(eh, kbl, preferred_element_type=jnp.float32)
                + jnp.dot(el, kbh, preferred_element_type=jnp.float32)
            )
        s2_ref[:, :] = s2_ref[:, :] * scale + acc
        m_ref[:, :] = m_new
        return
    if v_strategy == "vpu":
        # c is tiny (1-3 image channels): an MXU e @ V with V padded to 128
        # lanes would waste 128/c of the array. Instead V arrives TRANSPOSED
        # as rows ([c_pad8, BP]); accumulate per channel on the VPU with a
        # lane-select write into the s2 tile.
        bq = e.shape[0]
        cp = s2_ref.shape[1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (bq, cp), 1)
        s2_acc = s2_ref[:, :] * scale
        for ci in range(c):
            vrow = v_ref[ci : ci + 1, :]
            if fast:
                vrow = vrow.astype(jnp.bfloat16)
            contrib = jnp.sum(
                e * vrow, axis=1, keepdims=True, dtype=jnp.float32
            )  # [BQ, 1]
            s2_acc = s2_acc + jnp.where(lane == ci, contrib, 0.0)
        s2_ref[:, :] = s2_acc
    else:
        v = v_ref[:, :].astype(jnp.bfloat16) if fast else v_ref[:, :]
        # Mosaic only lowers DEFAULT/HIGHEST dots — clamp the 'high' tier's
        # enum to HIGHEST here (fp32 operands; the e @ V accumulation is not
        # the tier's bottleneck, the QK dot above is, and that one uses the
        # manual bf16x3 split)
        ev_prec = (
            jax.lax.Precision.HIGHEST
            if precision == jax.lax.Precision.HIGH
            else precision
        )
        s2_ref[:, :] = s2_ref[:, :] * scale + jnp.dot(
            e, v, preferred_element_type=jnp.float32, precision=ev_prec
        )
    m_ref[:, :] = m_new


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_q", "block_p", "interpret", "precision", "v_strategy",
        "fast_exp", "rows_per_seed", "inbank_cols",
    ),
)
def flash_score_update(
    q: jnp.ndarray,  # [M, d]
    qn: jnp.ndarray,  # [M]
    bank: jnp.ndarray,  # [P, d]
    pn: jnp.ndarray,  # [P]
    values: jnp.ndarray,  # [P, c]
    w: jnp.ndarray,  # [P], or [S, P] per-seed weights (see rows_per_seed)
    at: jnp.ndarray,  # scalar sqrt(1-beta)
    bt: jnp.ndarray,  # scalar sqrt(beta)
    state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],  # m [M], s1 [M], s2 [M, c]
    *,
    block_q: int | None = None,
    block_p: int | None = None,
    interpret: bool = False,
    precision: str = "highest",
    v_strategy: str = "auto",
    fast_exp: bool | None = None,
    rows_per_seed: int | None = None,
    inbank_cols: Tuple[int, int] | None = None,  # (start, c) for 'inbank'
    prune_mask: jnp.ndarray | None = None,  # int32 [Mp/block_q, Pp/block_p]
):
    """One fused bank sweep; returns updated (m, s1, s2) with the finite
    NEG_INF sentinel convention (see state_to_pallas/state_from_pallas).

    precision ladder:
      'highest' — fp32 6-pass MXU dots + fp32 elementwise (the <1e-3
        torch-parity configuration);
      'high'    — bf16x3 3-pass dots (~2^-16 rel dot error) + fp32
        elementwise: ~2x the dot throughput of 'highest' at near-parity;
      'default' — bf16x3 dots + bf16 exp elementwise (fast_exp), ~3e-3
        relative error on posterior means.

    v_strategy: 'mxu' computes e @ V on the MXU (V lane-padded to 128 — a
    128/c waste for image channels); 'vpu' accumulates the c channels as
    VPU row-reductions over transposed V rows (the win for c<=3);
    'mxu1' (fast mode only) fuses s1 INTO the MXU dot via a ones column —
    e @ [V|1] in bf16 — removing all per-channel VPU accumulation passes
    (the MXU is nearly idle at small d, so this rides free capacity);
    'inbank' (requires inbank_cols=(start, c)) exploits that the values
    ARE a contiguous column slice of the bank (patch centers): s2
    accumulates as e @ K against the K tile already in VMEM — the mxu1
    VPU win with NO extra operand at all (no values HBM stream, no
    lane-padded build), at the cost of a dp-wide (instead of 128-wide)
    s2 accumulator and an extra [BQ,BP]x[BP,dp] MXU pass per tier pass —
    profitable where dp is small and the kernel is VPU-bound (dp<=256
    measured; values must equal bank[:, start:start+c], which the wrapper
    slices out on exit so the external state stays [M, c]);
    'auto' picks 'mxu1' for fast-mode sweeps of P >= 2^18 patches (below
    that the per-call [V|1] lane-padding build outweighs the kernel win —
    measured -6% end-to-end in the machines' ~16k-patch chunked scans)
    and otherwise 'vpu' when c <= 8.

    fast_exp (default: precision == 'default'): bf16 exp/mask elementwise —
    the VPU-bound part — with fp32 reductions (~1% posterior-mean error at
    sharp softmax temperatures, ~2x faster). NOTE: the QK dot itself should
    stay 'highest' in diffusion score machines — at low noise the logits are
    scaled by 1/(2 beta) and bf16 DOT error explodes (measured 19% at
    t=0.05), while bf16 EXP error stays bounded."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m0, s10, s20 = state
    M, d = q.shape
    P = bank.shape[0]
    if v_strategy == "inbank":
        if inbank_cols is None:
            raise ValueError("v_strategy='inbank' requires inbank_cols=(start, c)")
        col0, c = inbank_cols
        if not (0 <= col0 and col0 + c <= d):
            raise ValueError(f"inbank_cols {inbank_cols} out of range for d={d}")
        values = None  # V == bank[:, col0:col0+c]; no separate operand
    else:
        c = values.shape[1]

    if prune_mask is not None and (w.ndim == 2 or (
            M > (_env_int("CDT_FLASH_QCHUNK") or (
                QCHUNK if _round_up(d, 128) < QCHUNK_BIG_DP else QCHUNK // 2))
            and _round_up(d, 128) >= QCHUNK_MIN_DP)):
        raise ValueError(
            "prune_mask is unsupported on the vector-label and chunked "
            "paths (ops.prune targets the small-dp banked sweeps)"
        )

    if w.ndim == 2:
        # Per-seed weights [S, P] (one label per seed — batched conditional
        # generation): vmap the single-seed kernel over the seed axis. A
        # per-seed bias ROW BlockSpec over an [S, Pp] array is rejected by
        # the Mosaic lowering for S > 1 (the second-minor block would be 1,
        # neither divisible by 8 nor equal to S); under vmap each inner
        # call's bias is [1, Pp] (valid) and the batch becomes an extra
        # leading grid dim. Bank traffic is unchanged — every (seed, query
        # block) pair visits every bank block either way.
        S = w.shape[0]
        if rows_per_seed is None or M != S * rows_per_seed:
            raise ValueError(
                "2-D weights need rows_per_seed with M == S * rows_per_seed"
            )
        rps = rows_per_seed
        m_, s1_, s2_ = jax.vmap(
            lambda q_s, qn_s, w_s, st_s: flash_score_update(
                q_s, qn_s, bank, pn, values, w_s, at, bt, st_s,
                block_q=block_q, block_p=block_p, interpret=interpret,
                precision=precision, v_strategy=v_strategy,
                fast_exp=fast_exp, inbank_cols=inbank_cols,
            ),
            in_axes=(0, 0, 0, 0),
        )(
            q.reshape(S, rps, d),
            qn.reshape(S, rps),
            w,
            (m0.reshape(S, rps), s10.reshape(S, rps), s20.reshape(S, rps, c)),
        )
        return m_.reshape(M), s1_.reshape(M), s2_.reshape(M, c)

    # Large-M x large-d VMEM guard: inside a lax.scan, XLA can place the
    # whole carried state (notably s2 [Mp, 128]) in scoped VMEM next to the
    # kernel's tiles — at M=32768/dp>=768 that overflows the 16 MB stack at
    # compile time (measured: the b>=32 capacity machines at k>=15), while
    # the SAME kernel standalone compiles fine. Query rows are independent,
    # so split the call into <=16384-row chunks — bit-exact, and the K
    # traffic is unchanged (the grid already re-reads K per query block).
    # At M=65536/dp=384 the (512,2048) 'high' tiles (~16M) plus the carried
    # m/s1 tip the scoped stack 464K over: halve the query block instead of
    # chunking (256x2048 measured 58.5 vs 60.0 Gpairs/s at k=11).
    if M > 32768 and 384 <= _round_up(d, 128) < 640 and block_q is None:
        block_q = 256
    # Same stack pressure one octave down: at M=131072/dp=256 the 512x2048
    # 'high' tiles sit ~1M over the scoped limit inside the chunk scan
    # (k=9 64x64 at seed batch 32, offline-AOT; k=7 at the same dp squeaks
    # by, so the whole band is marginal). The 256-row query block drops the
    # 4M f32 accumulator tile to 2M.
    if M > 65536 and 256 <= _round_up(d, 128) < 384 and block_q is None:
        block_q = 256

    qchunk = QCHUNK if _round_up(d, 128) < QCHUNK_BIG_DP else QCHUNK // 2
    qchunk = _env_int("CDT_FLASH_QCHUNK") or qchunk
    if M > qchunk and _round_up(d, 128) >= QCHUNK_MIN_DP:
        # The chunked calls' outputs get VMEM-placed by XLA (it fuses the
        # concatenate), so the default 512-row query tiles push the scoped
        # stack over 16M (by 220K at 2 chunks/dp=896; by 2.5M at 4
        # chunks/dp=768) — use 256-row tiles for every chunked call
        # (measured ~4% below 512 standalone, and it compiles everywhere).
        bq_chunk = block_q if block_q is not None else 256
        bq_chunk = _env_int("CDT_FLASH_BQ_CHUNK") or bq_chunk
        bp_chunk = block_p
        if bp_chunk is None and _round_up(d, 128) >= QCHUNK_BIG_DP:
            # The chunked-call scoped stack is tighter still at dp>=1152:
            # the default policy's K tiles (1024/512 wide) overflow by
            # 1.6-4.7 MB once XLA parks the per-chunk outputs alongside
            # (measured offline-AOT for v5e, tools/aot_check.py: k=19
            # 'high' 17.6M, k=27 'high' 19.7M / 'highest' 18.1M at bp=256
            # vs the 16 MB limit). Cap the K tile here — 'high': 512 up
            # to dp=2048 then 256; 'highest' (whose 6-pass fp32 emulation
            # carries 3-way bf16 operand splits): 512 up to dp=1152, 256
            # to dp=2048, then 128. All sixteen 64x64 k<=27 configs
            # compile under this cap (aot_check --sweep); env knobs
            # above still win for A/B.
            dp_e = _round_up(d, 128)
            if dp_e <= 1152:
                # round-4 hardware A/B at k=19 64x64 (tools/ab_k19_bp.py,
                # n=12500): bp=768 beats the old 512 cap by +7.2% 'high'
                # (56.74 vs 60.84 s/step) and +2.0% 'highest' (85.64 vs
                # 87.36); bp=1024 overflows the scoped stack (offline-AOT:
                # 1.62M 'high' / 176K 'highest').
                bp_chunk = 768
            elif dp_e <= 2048:
                # 'highest' overflows 512-wide K tiles past dp=1152 (k=23:
                # 17.14M vs the 16M stack, offline-AOT) — its 6-pass split
                # carries 3x bf16 operand copies per tile. Wider tiles at
                # this band FAIL AOT for both tiers (640/768 at dp=1664,
                # round 4) — the k19 widening does not extend here.
                if precision == "highest":
                    bp_chunk = 256
                else:
                    bp_chunk = 512
            elif precision == "highest":
                # 640/768 at dp=2304 overflow by 2.0-9.2M (round-4 AOT):
                # the dp>2048 caps stand.
                bp_chunk = 128
            else:
                bp_chunk = 256
        bp_chunk = _env_int("CDT_FLASH_BP") or bp_chunk
        # (An optimization_barrier on per-chunk outputs was tried to evict
        # the S(1)-placed carry and unlock bp=1024 here — outputs moved to
        # HBM but the scoped stack GREW: it is dominated by the kernel's own
        # operand tiles, not the carry. Offline-AOT, round 3; don't retry.)
        outs = [
            flash_score_update(
                q[i : i + qchunk], qn[i : i + qchunk], bank, pn, values, w,
                at, bt,
                (m0[i : i + qchunk], s10[i : i + qchunk], s20[i : i + qchunk]),
                block_q=bq_chunk, block_p=bp_chunk, interpret=interpret,
                precision=precision, v_strategy=v_strategy, fast_exp=fast_exp,
                inbank_cols=inbank_cols,
            )
            for i in range(0, M, qchunk)
        ]
        return tuple(jnp.concatenate(parts) for parts in zip(*outs))

    # Block policy, measured on v5e (tools/measure_blocks.py, round 3;
    # pipelined-dispatch timing, M=8192, P=2M). The d>256 regime previously
    # pinned 256x512 and ran at 40-60% of its achievable rate: each K tile
    # streams from HBM once per QUERY block, so taller/wider blocks cut
    # that re-read and fill the MXU pipeline — k=11 'high' 40.9 -> 60.0
    # Gpairs/s (+47%), k=13 +34%, k=17 +22%, k=7 +12%. The bf16x3 tiers
    # carry 4 extra split operand tiles in VMEM, so their feasible blocks
    # are smaller at large d than fp32-HIGHEST's (e.g. 512x2048 compiles at
    # dp<=384 for 'high' but OOMs Mosaic at dp=512, where HIGHEST's
    # 256x2048 still fits).
    # The dp>896 rows come from the 64x64-regime sweep (k=19/23/27, i.e.
    # dp 1152/1664/2304; BLOCKS_SMALL=1 tools/measure_blocks.py): 'high'
    # 256x1024 at k19 +13% (20.8 vs 18.4 Gpairs/s) and 512x512 at k23 +5%
    # (14.0 vs 13.3); anything larger fails Mosaic VMEM there. fp32-HIGHEST
    # is tighter still — its 6-pass MXU emulation carries 3-way bf16
    # operand splits, so at dp>2048 even 256x512 overflows the 16 MB scoped
    # stack by 2.3M (k=27 measured) and the k-tile must drop to 256.
    # (Per-band constants and their measured rationale live in
    # resolve_blocks above — exported so ops.prune mask builders can size
    # the skip matrix without duplicating the policy; inbank's narrower
    # bp bands are VMEM-driven, see the round-3 offline-AOT notes there.)
    bq_res, bp_res = resolve_blocks(M, P, d, precision, v_strategy)
    if block_q is None:
        block_q = bq_res
    if block_p is None:
        block_p = bp_res

    Mp = _round_up(M, block_q)
    Pp = _round_up(P, block_p)
    dp = _round_up(d, 128)
    cp = _round_up(c, 128)

    if prune_mask is not None and prune_mask.shape != (
        Mp // block_q, Pp // block_p
    ):
        raise ValueError(
            f"prune_mask shape {prune_mask.shape} != grid "
            f"{(Mp // block_q, Pp // block_p)} — size it with "
            "resolve_blocks()"
        )

    if fast_exp is None:
        fast_exp = precision == "default"
    if v_strategy == "auto":
        if fast_exp and c + 1 <= 128 and P >= (1 << 18):
            # mxu1 measures +9-28% over vpu on big single sweeps (1M-patch
            # microbench), but building its lane-padded bf16 [V|1] costs
            # 128/c ~ 42x the V payload in HBM writes PER CALL — in the
            # machines' ~16k-patch chunked scans that overhead flips the
            # sign (measured -6% end-to-end at 50k). Amortized only when
            # one call sweeps a big bank.
            v_strategy = "mxu1"
        else:
            v_strategy = "vpu" if c <= 8 else "mxu"
    if v_strategy == "mxu1":
        if not fast_exp:
            raise ValueError(
                "v_strategy='mxu1' is a fast-mode path (bf16 e @ [V|1]); "
                "parity mode keeps the fp32 VPU accumulation"
            )
        if c + 1 > cp:
            raise ValueError(f"no spare lane for s1 (c={c}, cp={cp})")

    LOG2E = jnp.float32(1.4426950408889634)
    LN2 = jnp.float32(0.6931471805599453)
    at = at.astype(jnp.float32)
    inv2bt2 = (1.0 / (2.0 * bt * bt)).astype(jnp.float32)
    qp = jnp.zeros((Mp, dp), jnp.float32).at[:M, :d].set(q)
    bankp = jnp.zeros((Pp, dp), jnp.float32).at[:P, :d].set(bank)
    # inbank + spare padded column: a ones column at lane d makes the e @ K
    # accumulation produce s1 in that lane for free (the query's padded
    # column is zero, so the QK dot is untouched) — the kernel then skips
    # its VPU row-sum entirely, mirroring the mxu1 s1-lane trick with no
    # extra operand at all
    s1_fused = v_strategy == "inbank" and d < dp
    if s1_fused:
        bankp = bankp.at[:P, d].set(1.0)
    # kernel-internal logits live in BASE-2 log space (see _kernel): weights
    # enter as log2 w and the distance scale carries a log2(e) factor
    logw = jnp.where(w > 0.0, jnp.log2(jnp.maximum(w, 1e-38)), NEG_INF)
    # per-patch bias: (-a_t^2 ||p||^2 / (2 beta^2)) * log2e + log2 w (NEG_INF
    # excluded); computed once per sweep (P or S*P work) so the kernel's
    # per-pair logit is a single fma on top of the MXU dot
    bias = jnp.maximum(-(at * at) * inv2bt2 * LOG2E * pn + logw, NEG_INF)
    # the per-query -||q||^2/(2 beta^2) softmax offset is handled OUTSIDE the
    # kernel: shift the carried m into the kernel's qn-less log2 convention
    # on the way in and back out (exact in real arithmetic; the residual
    # fp32 rounding only perturbs the m offset, never s2/s1)
    qn_s = (qn * inv2bt2).astype(jnp.float32)
    m0 = jnp.where(m0 <= NEG_INF * 0.5, m0, (m0 + qn_s) * LOG2E)
    if v_strategy == "inbank":
        vp = None  # V == bank columns; the K tile doubles as the V operand
        v_block = v_index = None
    elif v_strategy == "vpu":
        c8 = _round_up(c, 8)  # sublane-aligned transposed values [c8, Pp]
        vp = jnp.zeros((c8, Pp), jnp.float32).at[:c, :P].set(values.T)
        v_block = (c8, block_p)
        v_index = lambda qi, pj: (0, pj)
    elif v_strategy == "mxu1":
        # fused fast path: bf16 [V | 1] so one MXU dot accumulates s2 + s1
        vp = (
            jnp.zeros((Pp, cp), jnp.bfloat16)
            .at[:P, :c].set(values.astype(jnp.bfloat16))
            .at[:P, c].set(jnp.bfloat16(1.0))
        )
        v_block = (block_p, cp)
        v_index = lambda qi, pj: (pj, 0)
    else:
        vp = jnp.zeros((Pp, cp), jnp.float32).at[:P, :c].set(values)
        v_block = (block_p, cp)
        v_index = lambda qi, pj: (pj, 0)
    biasp = jnp.full((1, Pp), NEG_INF, jnp.float32).at[0, :P].set(bias)
    bias_index = lambda qi, pj: (0, pj)
    mp = jnp.full((Mp, 1), NEG_INF, jnp.float32).at[:M, 0].set(m0)
    s1p = jnp.zeros((Mp, 1), jnp.float32).at[:M, 0].set(s10)
    if v_strategy == "inbank":
        # s2 lives in the BANK basis inside the kernel: the carried center
        # state scatters into the center columns on entry and slices back
        # out on exit; the other dp-c columns accumulate values nobody
        # reads (their rescale is columnwise, so they never contaminate) —
        # the external [M, c] state convention is unchanged, including
        # across chunk scans and dispatch segments.
        s2w = dp
        s2p = jnp.zeros((Mp, dp), jnp.float32).at[:M, col0 : col0 + c].set(s20)
        if s1_fused:
            s2p = s2p.at[:M, d].set(s10)  # s1 rides the s2 tile's lane d
    else:
        s2w = cp
        s2p = jnp.zeros((Mp, cp), jnp.float32).at[:M, :c].set(s20)
        if v_strategy == "mxu1":
            s2p = s2p.at[:M, c].set(s10)  # s1 rides the s2 tile's lane c

    # NOTE: lane [0,1] (inv2bt2) is vestigial — the per-query softmax
    # offset moved to the wrapper's m shift and the kernel reads only
    # [0,0]. Kept in place because shrinking the operand would change the
    # kernel HLO and invalidate every cached compile for zero benefit.
    scale = jnp.stack([2.0 * at * inv2bt2 * LOG2E, inv2bt2]).reshape(1, 2)

    grid = (Mp // block_q, Pp // block_p)

    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,  # 3-pass bf16 (~6e-6 rel dot error)
        "default": jax.lax.Precision.DEFAULT,
    }[precision]
    in_specs = [
        pl.BlockSpec((1, block_p), bias_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_q, dp), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_p, dp), lambda qi, pj: (pj, 0), memory_space=pltpu.VMEM),
    ]
    operands = [biasp, qp, bankp]
    if prune_mask is not None:
        # whole-array SMEM operand (a (1,1) blocked spec does not lower on
        # hardware Mosaic: block dims must divide (8,128) or equal the
        # array's); the kernel indexes [qi, pj] directly — a few KB/call
        in_specs.append(
            pl.BlockSpec((Mp // block_q, Pp // block_p),
                         lambda qi, pj: (0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(prune_mask.astype(jnp.int32))
    if vp is not None:
        in_specs.append(pl.BlockSpec(v_block, v_index, memory_space=pltpu.VMEM))
        operands.append(vp)
    in_specs += [
        pl.BlockSpec((1, 2), lambda qi, pj: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((block_q, 1), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_q, 1), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_q, s2w), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
    ]
    operands += [scale, mp, s1p, s2p]
    out_m, out_s1, out_s2 = pl.pallas_call(
        functools.partial(
            _kernel, precision=prec, c=c, v_strategy=v_strategy,
            fast_exp=fast_exp, s1_fused=s1_fused,
            prune=prune_mask is not None,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_q, 1), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, s2w), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, s2w), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    m_out = out_m[:M, 0]
    m_out = jnp.where(m_out <= NEG_INF * 0.5, m_out, m_out * LN2 - qn_s)
    if v_strategy == "inbank":
        s1_out = out_s2[:M, d] if s1_fused else out_s1[:M, 0]
        return m_out, s1_out, out_s2[:M, col0 : col0 + c]
    if v_strategy == "mxu1":
        return m_out, out_s2[:M, c], out_s2[:M, :c]
    return m_out, out_s1[:M, 0], out_s2[:M, :c]


def state_to_pallas(m, s1, s2):
    """common.SoftmaxState convention (-inf empties) -> finite sentinel."""
    return (jnp.where(jnp.isneginf(m), NEG_INF, m), s1, s2)


def state_from_pallas(m, s1, s2):
    """finite-sentinel state -> -inf convention."""
    return (jnp.where(m <= NEG_INF * 0.5, -jnp.inf, m), s1, s2)
