"""Flash-score Pallas kernel vs the jnp online-softmax reference
(interpret mode on CPU; the real-TPU path is exercised by bench/els)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu.ops.flash_score import (
    NEG_INF,
    flash_score_update,
    state_from_pallas,
    state_to_pallas,
)
from convolutional_diffusion_tpu.scores.common import init_state, update_state


def reference_state(q, qn, bank, pn, values, w, at, bt, state):
    logits = -(qn[:, None] - 2 * at * (q @ bank.T) + at**2 * pn[None, :]) / (
        2 * bt**2
    )
    return update_state(state, logits, w[None, :], values)


@pytest.mark.parametrize("shapes", [
    (64, 27, 200, 3),    # k=3 c=3: unaligned everything
    (100, 75, 513, 1),   # k=5 c=3 grayscale-ish odd sizes
    (256, 128, 512, 3),  # fully aligned
])
def test_matches_reference(shapes):
    M, d, P, c = shapes
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    bank = jnp.asarray(rs.normal(size=(P, d)).astype(np.float32))
    values = jnp.asarray(rs.normal(size=(P, c)).astype(np.float32))
    w = jnp.asarray(rs.uniform(0.5, 1.5, size=(P,)).astype(np.float32))
    qn = jnp.sum(q**2, axis=1)
    pn = jnp.sum(bank**2, axis=1)
    at, bt = jnp.float32(0.8), jnp.float32(0.6)

    ref = reference_state(
        q, qn, bank, pn, values, w, at, bt, init_state((M,), c)
    )

    st = state_to_pallas(jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c)))
    m, s1, s2 = flash_score_update(
        q, qn, bank, pn, values, w, at, bt, st,
        block_q=64, block_p=128, interpret=True,
    )
    m, s1, s2 = state_from_pallas(m, s1, s2)
    # the kernel folds log(w) into its running max, so compare the
    # subtraction-invariant quantities: log total weight (m + log s1) and
    # the posterior mean (s2/s1)
    np.testing.assert_allclose(
        np.asarray(m + jnp.log(s1)),
        np.asarray(ref.m + jnp.log(ref.s1)),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s2 / s1[:, None]),
        np.asarray(ref.s2 / ref.s1[:, None]),
        rtol=1e-4, atol=1e-5,
    )


def test_chaining_matches_single_sweep():
    """Two chained kernel calls over bank halves == one call over the full
    bank (the streaming-merge contract used by the chunk scan)."""
    M, d, P, c = 32, 27, 256, 3
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    bank = jnp.asarray(rs.normal(size=(P, d)).astype(np.float32))
    values = jnp.asarray(rs.normal(size=(P, c)).astype(np.float32))
    w = jnp.ones((P,), jnp.float32)
    qn = jnp.sum(q**2, axis=1)
    pn = jnp.sum(bank**2, axis=1)
    at, bt = jnp.float32(0.7), jnp.float32(0.71)

    def run(bank, pn, values, w, st):
        return flash_score_update(
            q, qn, bank, pn, values, w, at, bt, st,
            block_q=32, block_p=64, interpret=True,
        )

    st0 = state_to_pallas(jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c)))
    full = run(bank, pn, values, w, st0)
    half1 = run(bank[:128], pn[:128], values[:128], w[:128], st0)
    half2 = run(bank[128:], pn[128:], values[128:], w[128:], half1)
    for a, b in zip(full, half2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_zero_weight_bank_entries_ignored():
    M, d, P, c = 16, 12, 64, 2
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    bank = jnp.asarray(rs.normal(size=(P, d)).astype(np.float32))
    values = jnp.asarray(rs.normal(size=(P, c)).astype(np.float32))
    qn = jnp.sum(q**2, axis=1)
    pn = jnp.sum(bank**2, axis=1)
    at, bt = jnp.float32(0.9), jnp.float32(0.44)
    st0 = state_to_pallas(jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c)))

    w_half = jnp.concatenate([jnp.ones((32,)), jnp.zeros((32,))])
    a = flash_score_update(q, qn, bank, pn, values, w_half, at, bt, st0,
                           block_q=16, block_p=32, interpret=True)
    b = flash_score_update(q, qn, bank[:32], pn[:32], values[:32],
                           jnp.ones((32,)), at, bt, st0,
                           block_q=16, block_p=32, interpret=True)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)


def test_mxu1_fused_matches_vpu_fast_mode():
    """mxu1: one bf16 MXU dot e @ [V|1] accumulates s2 AND s1 (ones lane).
    Must match the fast-mode VPU accumulation within bf16 product error."""
    from convolutional_diffusion_tpu.ops.flash_score import (
        NEG_INF,
        flash_score_update,
    )

    key = jax.random.PRNGKey(0)
    M, P, d, c = 64, 96, 12, 3
    q = jax.random.normal(key, (M, d))
    qn = jnp.sum(q**2, -1)
    bank = jax.random.normal(jax.random.PRNGKey(1), (P, d))
    pn = jnp.sum(bank**2, -1)
    vals = bank[:, :c]
    w = jnp.full((P,), 1.0 / P).at[:7].set(0.0)
    at, bt = jnp.float32(0.8), jnp.float32(0.6)
    state = (jnp.full((M,), NEG_INF), jnp.zeros((M,)), jnp.zeros((M, c)))

    outs = {}
    for strat in ("vpu", "mxu1"):
        m, s1, s2 = flash_score_update(
            q, qn, bank, pn, vals, w, at, bt, state,
            interpret=True, precision="default", fast_exp=True,
            v_strategy=strat,
        )
        outs[strat] = (np.asarray(s2 / s1[:, None]), np.asarray(m))
    np.testing.assert_allclose(
        outs["mxu1"][0], outs["vpu"][0], rtol=2e-2, atol=2e-3
    )
    np.testing.assert_allclose(outs["mxu1"][1], outs["vpu"][1], rtol=1e-6)


def test_mxu1_requires_fast_mode():
    from convolutional_diffusion_tpu.ops.flash_score import (
        NEG_INF,
        flash_score_update,
    )

    z = jnp.zeros((8, 4))
    state = (jnp.full((8,), NEG_INF), jnp.zeros((8,)), jnp.zeros((8, 2)))
    with pytest.raises(ValueError, match="mxu1"):
        flash_score_update(
            z, jnp.zeros(8), jnp.zeros((8, 4)), jnp.zeros(8),
            jnp.zeros((8, 2)), jnp.ones(8), jnp.float32(0.9), jnp.float32(0.4),
            state, interpret=True, precision="highest", fast_exp=False,
            v_strategy="mxu1",
        )


@pytest.mark.parametrize(
    "M,P,d,c",
    [
        (8, 24, 12, 1),        # tiny everything
        (300, 700, 128, 3),    # d exactly one lane tile; ragged M/P
        (256, 512, 129, 3),    # d just over a tile boundary
        (1025, 513, 27, 2),    # M/P just over block multiples
        (64, 2048, 75, 4),     # wide bank, k=5-ish d
        (64, 600, 1083, 3),    # k=19@64x64 d: the dp<=1152 256x1024 branch
        (32, 300, 2187, 3),    # k=27@64x64 d: the dp>2048 256-wide branch
    ],
)
def test_fuzz_shapes_interpret(M, P, d, c):
    """Padding/blocking edges: kernel (interpret) == update_state exactly
    up to fp tolerance for arbitrary (M, P, d, c)."""
    from convolutional_diffusion_tpu.ops.flash_score import (
        NEG_INF,
        flash_score_update,
        state_from_pallas,
    )
    from convolutional_diffusion_tpu.scores.common import (
        init_state,
        update_state,
    )

    kq, kb, kw_ = jax.random.split(jax.random.PRNGKey(M * 7 + P), 3)
    q = jax.random.normal(kq, (M, d))
    qn = jnp.sum(q**2, -1)
    bank = jax.random.normal(kb, (P, d))
    pn = jnp.sum(bank**2, -1)
    vals = bank[:, :c]
    w = jax.random.uniform(kw_, (P,))
    w = jnp.where(w < 0.2, 0.0, w)  # some excluded entries
    at, bt = jnp.float32(0.85), jnp.float32(0.55)

    m, s1, s2 = state_from_pallas(
        *flash_score_update(
            q, qn, bank, pn, vals, w, at, bt,
            (jnp.full((M,), NEG_INF), jnp.zeros((M,)), jnp.zeros((M, c))),
            interpret=True,
        )
    )
    logits = -(qn[:, None] - 2 * at * (q @ bank.T) + at**2 * pn) / (2 * bt**2)
    ref = update_state(init_state((M,), c), logits, w[None, :], vals)
    # scale-aware tolerance (the framework parity target is 1e-3 on
    # [-1,1]-scale pixels; the kernel's restructured arithmetic rounds
    # differently from the jnp reference at ~1e-5 absolute). Logit
    # magnitudes grow ~d for unit-variance data (qn ~ d amplified by
    # 1/(2 beta^2)), so the fp32 max-subtraction rounding — and with it the
    # kernel-vs-jnp divergence — scales with d past a couple of lane tiles
    # (measured 2.4e-4 at d=1083 vs <5e-5 at d<=129; both formulations are
    # equally rounded, they just round differently).
    ours = np.asarray(s2 / s1[:, None])
    want = np.asarray(ref.s2 / ref.s1[:, None])
    scale = max(np.abs(want).max(), 1.0) * max(1.0, d / 128)
    np.testing.assert_allclose(ours, want, atol=5e-5 * scale)
    # m+log(s1) is offset-invariant: compare the true log-sum-exp
    np.testing.assert_allclose(
        np.asarray(m + jnp.log(s1)),
        np.asarray(ref.m + jnp.log(ref.s1)),
        rtol=1e-5, atol=1e-4,
    )


def test_high_precision_tier():
    """'high' = bf16x3 3-pass dots + fp32 elementwise: a middle tier whose
    posterior means stay within ~1e-4 of 'highest' (vs ~3e-3 for fast mode),
    and whose fast_exp default is OFF (bf16 exp is 'default'-only)."""
    M, d, P, c = 128, 75, 512, 3
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    bank = jnp.asarray(rs.normal(size=(P, d)).astype(np.float32))
    values = jnp.asarray(rs.normal(size=(P, c)).astype(np.float32))
    w = jnp.full((P,), 1.0 / P, jnp.float32)
    qn = jnp.sum(q**2, axis=1)
    pn = jnp.sum(bank**2, axis=1)
    at, bt = jnp.float32(0.9), jnp.float32(jnp.sqrt(1 - 0.81))
    st = state_to_pallas(
        jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c))
    )
    outs = {}
    for prec in ("highest", "high"):
        m, s1, s2 = flash_score_update(
            q, qn, bank, pn, values, w, at, bt, st,
            block_q=64, block_p=128, interpret=True, precision=prec,
        )
        outs[prec] = np.asarray(s2 / s1[:, None])
    scale = np.max(np.abs(outs["highest"]))
    dev = np.max(np.abs(outs["high"] - outs["highest"])) / scale
    assert dev < 1e-4, dev


def test_base_precision_ladder_validation():
    from convolutional_diffusion_tpu.scores import LocalEquivScoreModule

    imgs = np.zeros((4, 8, 8, 3), np.float32)
    labs = np.zeros((4,), np.int32)
    m = LocalEquivScoreModule((imgs, labs), precision="high")
    assert m.prec == jax.lax.Precision.HIGH
    with pytest.raises(ValueError, match="precision"):
        LocalEquivScoreModule((imgs, labs), precision="bf16")


def test_query_chunking_matches_whole_call(monkeypatch):
    """The large-M/large-d VMEM guard splits the call into QCHUNK-row query
    chunks (flash_score.py QCHUNK); rows are independent, so the chunked
    path must reproduce the whole-M call row-for-row. (On hardware the two
    paths run the identical Mosaic kernel per block and agree bit-exactly;
    on CPU the inner chunk calls run under jit while the whole call here is
    eager interpret, so XLA reassociation leaves ~1-ulp dot differences —
    compare at tight tolerance, which still catches any slicing bug.)"""
    import convolutional_diffusion_tpu.ops.flash_score as fs

    M, d, P, c = 160, 130, 200, 3
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    bank = jnp.asarray(rs.normal(size=(P, d)).astype(np.float32))
    values = jnp.asarray(rs.normal(size=(P, c)).astype(np.float32))
    w = jnp.asarray(rs.uniform(0.5, 1.5, size=(P,)).astype(np.float32))
    qn = jnp.sum(q**2, axis=1)
    pn = jnp.sum(bank**2, axis=1)
    at, bt = jnp.float32(0.8), jnp.float32(0.6)
    st = state_to_pallas(
        jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c))
    )
    # bypass the jit wrapper: both calls share shapes/statics, and jit would
    # otherwise serve the pre-patch compilation to the post-patch call
    raw = fs.flash_score_update.__wrapped__
    args = (q, qn, bank, pn, values, w, at, bt, st)
    kw = dict(block_q=64, block_p=128, interpret=True)
    whole = raw(*args, **kw)
    monkeypatch.setattr(fs, "QCHUNK", 64)
    monkeypatch.setattr(fs, "QCHUNK_MIN_DP", 128)  # dp(130) = 256 engages
    chunked = raw(*args, **kw)
    for name, a, b, rtol in zip(
        ("m", "s1", "s2"), whole, chunked, (1e-6, 1e-4, 5e-4)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=1e-6, err_msg=name
        )
    # env A/B knobs (flash_score._env_int): CDT_FLASH_QCHUNK overrides the
    # chunk rows, CDT_FLASH_BQ_CHUNK the per-chunk query block — both must
    # stay row-exact vs the policy defaults (used for remote-TPU OOM triage
    # without code edits)
    monkeypatch.setattr(fs, "QCHUNK", 16384)  # default would not engage
    monkeypatch.setenv("CDT_FLASH_QCHUNK", "96")
    monkeypatch.setenv("CDT_FLASH_BQ_CHUNK", "32")
    kw_env = dict(block_q=None, block_p=128, interpret=True)
    env_chunked = raw(*args, **kw_env)
    whole_env = raw(*args, block_q=32, block_p=128, interpret=True)
    for name, a, b, rtol in zip(
        ("m", "s1", "s2"), whole_env, env_chunked, (1e-6, 1e-4, 5e-4)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=1e-6, err_msg=name
        )


@pytest.mark.parametrize(
    "d,precision",
    [(1200, "high"), (2100, "high"), (1700, "highest"), (2100, "highest")],
    ids=["dp1280-high", "dp2176-high", "dp1792-highest", "dp2176-highest"],
)
def test_query_chunking_bigdp_bp_cap(monkeypatch, d, precision):
    """At dp >= QCHUNK_BIG_DP the chunked path caps block_p below the
    standalone policy (512 / 256 / 128 by tier+dp — the scoped-VMEM fix
    measured offline-AOT for v5e, tools/aot_check.py). The cap must be
    numerically inert: chunked-capped output == whole-call output."""
    import convolutional_diffusion_tpu.ops.flash_score as fs

    M, P, c = 160, 300, 3
    rs = np.random.RandomState(11)
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    bank = jnp.asarray(rs.normal(size=(P, d)).astype(np.float32))
    values = jnp.asarray(rs.normal(size=(P, c)).astype(np.float32))
    w = jnp.asarray(rs.uniform(0.5, 1.5, size=(P,)).astype(np.float32))
    qn = jnp.sum(q**2, axis=1)
    pn = jnp.sum(bank**2, axis=1)
    at, bt = jnp.float32(0.8), jnp.float32(0.6)
    st = state_to_pallas(
        jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c))
    )
    raw = fs.flash_score_update.__wrapped__
    args = (q, qn, bank, pn, values, w, at, bt, st)
    whole = raw(*args, block_q=64, block_p=128, interpret=True,
                precision=precision)
    # engage chunking at this tiny M; block_p=None routes through the cap
    monkeypatch.setenv("CDT_FLASH_QCHUNK", "64")
    monkeypatch.setenv("CDT_FLASH_BQ_CHUNK", "64")
    monkeypatch.setattr(fs, "QCHUNK_MIN_DP", 128)
    chunked = raw(*args, block_q=None, block_p=None, interpret=True,
                  precision=precision)
    # s2 tolerance scales with the reduction length: at d>=1200 the jit'd
    # chunk calls vs the eager whole call differ by reassociation alone
    # (worst observed 1/480 elements at ~1e-3 rel) — a slicing bug would
    # show O(1) errors across whole rows, far outside these bounds.
    for name, a, b, rtol in zip(
        ("m", "s1", "s2"), whole, chunked, (1e-6, 5e-4, 5e-3)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=1e-6, err_msg=name
        )


# --------------------------- 'inbank' strategy ---------------------------
# V is a contiguous column slice of the bank (the patch centers), so the
# kernel can accumulate s2 as e @ K on the MXU with NO separate values
# operand; the wrapper scatters/slices the center columns at the state
# boundary so the external [M, c] convention is unchanged.


def _inbank_fixture(M=96, d=27, P=300, c=3, col0=12, seed=7):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    bank = jnp.asarray(rs.normal(size=(P, d)).astype(np.float32))
    w = jnp.asarray(rs.uniform(0.5, 1.5, size=(P,)).astype(np.float32))
    qn = jnp.sum(q**2, axis=1)
    pn = jnp.sum(bank**2, axis=1)
    st = state_to_pallas(
        jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c))
    )
    return q, qn, bank, pn, bank[:, col0 : col0 + c], w, st, (col0, c)


@pytest.mark.parametrize("precision", ["highest", "high", "default"])
def test_inbank_matches_vpu(precision):
    q, qn, bank, pn, values, w, st, cols = _inbank_fixture()
    at, bt = jnp.float32(0.8), jnp.float32(0.6)
    kw = dict(block_q=32, block_p=128, interpret=True, precision=precision)
    ref = flash_score_update(
        q, qn, bank, pn, values, w, at, bt, st, v_strategy="vpu", **kw
    )
    ib = flash_score_update(
        q, qn, bank, pn, None, w, at, bt, st,
        v_strategy="inbank", inbank_cols=cols, **kw
    )
    # m takes the identical code path — exact; s1/s2 differ only in
    # accumulation route (MXU dot vs VPU reductions; s1 rides the bank's
    # spare padded lane as a ones column): fp32 HIGHEST reassociation
    # ~1e-6, bf16x3 ~2^-15
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(ib[0]))
    # 'default' keeps bf16 operands through the fused dot — its tier
    # tolerates ~3e-3 on posterior stats by design
    rtol = {"highest": 1e-5, "high": 2e-4, "default": 4e-3}[precision]
    np.testing.assert_allclose(
        np.asarray(ref[1]), np.asarray(ib[1]), rtol=rtol, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref[2]), np.asarray(ib[2]), rtol=rtol, atol=1e-6
    )


def test_inbank_chunk_chaining():
    """Two chained inbank calls (the machines' per-chunk scan) must equal
    one whole-bank call: the wrapper's center-column scatter/slice is an
    exact state round-trip (garbage in the non-center lanes never leaks)."""
    q, qn, bank, pn, _, w, st, cols = _inbank_fixture(P=256)
    at, bt = jnp.float32(0.7), jnp.float32(0.5)
    kw = dict(
        block_q=32, block_p=128, interpret=True, precision="highest",
        v_strategy="inbank", inbank_cols=cols,
    )
    whole = flash_score_update(q, qn, bank, pn, None, w, at, bt, st, **kw)
    half = flash_score_update(
        q, qn, bank[:128], pn[:128], None, w[:128], at, bt, st, **kw
    )
    chained = flash_score_update(
        q, qn, bank[128:], pn[128:], None, w[128:], at, bt, half, **kw
    )
    for name, a, b in zip(("m", "s1", "s2"), whole, chained):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6, err_msg=name
        )


def test_inbank_vector_label():
    """Per-seed weights ([S, P] + rows_per_seed) vmap the wrapper; the
    inbank scatter/slice must compose with that batching."""
    S, rps = 3, 32
    q, qn, bank, pn, values, _, _, cols = _inbank_fixture(M=S * rps)
    rs = np.random.RandomState(11)
    w2 = jnp.asarray(rs.uniform(0.2, 1.2, size=(S, 300)).astype(np.float32))
    M, c = S * rps, cols[1]
    st = state_to_pallas(
        jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c))
    )
    at, bt = jnp.float32(0.8), jnp.float32(0.6)
    kw = dict(
        block_q=32, block_p=128, interpret=True, precision="highest",
        rows_per_seed=rps,
    )
    ref = flash_score_update(
        q, qn, bank, pn, values, w2, at, bt, st, v_strategy="vpu", **kw
    )
    ib = flash_score_update(
        q, qn, bank, pn, None, w2, at, bt, st,
        v_strategy="inbank", inbank_cols=cols, **kw
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(ib[0]))
    np.testing.assert_allclose(
        np.asarray(ref[1]), np.asarray(ib[1]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref[2]), np.asarray(ib[2]), rtol=1e-5, atol=1e-6
    )


def test_inbank_sweep_wiring(monkeypatch):
    """banked_sweep + els_sweep route through the inbank strategy under the
    CDT_ELS_INBANK_MAX_DP gate: force interpret mode and compare against
    the jnp fallback paths (pins the center-column computation, the scan
    xs change, and the env gating)."""
    import convolutional_diffusion_tpu.ops.flash_score as fs
    import convolutional_diffusion_tpu.scores.els as els_mod
    from convolutional_diffusion_tpu.ops.patches import center_index

    orig = fs.flash_score_update

    def forced_interpret(*a, **kw):
        kw["interpret"] = True
        kw.setdefault("block_q", 32)
        kw.setdefault("block_p", 128)
        return orig(*a, **kw)

    monkeypatch.setattr(fs, "flash_score_update", forced_interpret)
    monkeypatch.setenv("CDT_ELS_INBANK_MAX_DP", "128")

    rs = np.random.RandomState(3)
    k, c = 3, 3
    d = k * k * c
    B, nblk = 128, 2
    bank_rows = jnp.asarray(rs.normal(size=(nblk * B, d)).astype(np.float32))
    centers = bank_rows[:, center_index(k, c)]
    pn = jnp.sum(bank_rows**2, axis=1).reshape(nblk, B)
    w_b = jnp.asarray(
        rs.uniform(0.5, 1.5, size=(nblk, B)).astype(np.float32)
    )
    M = 64
    q = jnp.asarray(rs.normal(size=(M, d)).astype(np.float32))
    qn = jnp.sum(q**2, axis=1)
    at, bt = jnp.float32(0.8), jnp.float32(0.6)

    args = (q, qn, bank_rows.reshape(nblk, B * d),
            centers.reshape(nblk, B * c), pn, w_b, at, bt)
    kw = dict(B=B, d=d, c=c, precision="highest", return_m=True,
              inbank_col=center_index(k, c).start)
    m_ib, s1_ib, s2_ib = els_mod.banked_sweep(*args, use_pallas=True, **kw)
    m_ref, s1_ref, s2_ref = els_mod.banked_sweep(*args, use_pallas=False, **kw)
    # the kernel folds log w into its running max — compare the
    # subtraction-invariant quantities (log total weight, posterior mean)
    np.testing.assert_allclose(
        np.asarray(m_ib + jnp.log(s1_ib)),
        np.asarray(m_ref + jnp.log(s1_ref)), rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s2_ib / s1_ib[:, None]),
        np.asarray(s2_ref / s1_ref[:, None]), rtol=1e-4, atol=1e-5,
    )

    # els_sweep (streaming): tiny image chunks, same gate
    n, h, wdt = 8, 6, 6
    imgs = rs.normal(size=(n, h, wdt, c)).astype(np.float32)
    per_img = (h - k + 1) * (wdt - k + 1)
    cs = 4
    images_p = jnp.asarray(imgs.reshape(2, cs, h * wdt * c))
    w_img_p = jnp.asarray(
        rs.uniform(0.5, 1.5, size=(2, cs)).astype(np.float32)
    )
    Mq = 32
    xq = jnp.asarray(rs.normal(size=(Mq, d)).astype(np.float32))
    qn2 = jnp.sum(xq**2, axis=1)
    common = dict(k=k, cs=cs, hwc=(h, wdt, c), per_img=per_img, c=c,
                  precision="highest")
    m_i, s1_i, s2_i = els_mod.els_sweep(
        images_p, w_img_p, xq, qn2, at, bt, use_pallas=True, **common
    )
    m_r, s1_r, s2_r = els_mod.els_sweep(
        images_p, w_img_p, xq, qn2, at, bt, use_pallas=False, **common
    )
    np.testing.assert_allclose(
        np.asarray(m_i + jnp.log(s1_i)), np.asarray(m_r + jnp.log(s1_r)),
        rtol=1e-5, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s2_i / s1_i[:, None]), np.asarray(s2_r / s1_r[:, None]),
        rtol=1e-4, atol=1e-5,
    )


def test_inbank_default_gate(monkeypatch):
    """The production gate (no env override): fast mode routes inbank at
    dp<=128 (+22% measured, PERFORMANCE.md small-k A/B), the parity tiers
    never do ('high' sits on a joint VPU/MXU roofline; 'highest' pays
    fp32-rate extra passes)."""
    import convolutional_diffusion_tpu.ops.flash_score as fs
    import convolutional_diffusion_tpu.scores.els as els_mod
    from convolutional_diffusion_tpu.ops.patches import center_index

    monkeypatch.delenv("CDT_ELS_INBANK_MAX_DP", raising=False)
    assert els_mod._inbank_max_dp("default") == 128
    assert els_mod._inbank_max_dp("high") == 0
    assert els_mod._inbank_max_dp("highest") == 0

    seen = []
    orig = fs.flash_score_update

    def recording(*a, **kw):
        seen.append(kw.get("v_strategy", "auto"))
        kw["interpret"] = True
        kw.setdefault("block_q", 32)
        kw.setdefault("block_p", 128)
        return orig(*a, **kw)

    monkeypatch.setattr(fs, "flash_score_update", recording)

    rs = np.random.RandomState(5)
    k, c = 3, 3
    d = k * k * c  # dp=128: inside the fast-mode gate
    B, nblk = 128, 1
    bank_rows = jnp.asarray(rs.normal(size=(nblk * B, d)).astype(np.float32))
    centers = bank_rows[:, center_index(k, c)]
    args = (
        jnp.asarray(rs.normal(size=(16, d)).astype(np.float32)),
        None, bank_rows.reshape(nblk, B * d),
        centers.reshape(nblk, B * c),
        jnp.sum(bank_rows**2, axis=1).reshape(nblk, B),
        jnp.ones((nblk, B), jnp.float32),
        jnp.float32(0.8), jnp.float32(0.6),
    )
    args = (args[0], jnp.sum(args[0] ** 2, axis=1)) + args[2:]
    kw = dict(B=B, d=d, c=c, use_pallas=True,
              inbank_col=center_index(k, c).start)
    for precision, expect in (
        ("default", "inbank"), ("high", "auto"), ("highest", "auto")
    ):
        seen.clear()
        els_mod.banked_sweep(*args, precision=precision, **kw)
        assert seen and all(s == expect for s in seen), (precision, seen)


def test_inbank_exact_lane_multiple_d():
    """d == dp leaves no spare padded lane: the s1 ones-column fusion must
    fall back to the VPU row-sum (s1_fused=False) and stay correct."""
    q, qn, bank, pn, values, w, st, _ = _inbank_fixture(d=128, col0=60)
    at, bt = jnp.float32(0.8), jnp.float32(0.6)
    kw = dict(block_q=32, block_p=128, interpret=True, precision="highest")
    ref = flash_score_update(
        q, qn, bank, pn, values, w, at, bt, st, v_strategy="vpu", **kw
    )
    ib = flash_score_update(
        q, qn, bank, pn, None, w, at, bt, st,
        v_strategy="inbank", inbank_cols=(60, 3), **kw
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(ib[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(ib[1]))
    np.testing.assert_allclose(
        np.asarray(ref[2]), np.asarray(ib[2]), rtol=1e-5, atol=1e-6
    )
