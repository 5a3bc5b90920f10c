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
