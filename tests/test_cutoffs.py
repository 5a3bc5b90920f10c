"""max_samples / label / shuffle cutoff semantics vs the torch reference.

Goldens (tests/goldens/cutoffs.npz, recorded by tools/make_goldens.py
make_cutoff_goldens) pin the four modules' DISTINCT cutoff rules
(scores/common.py CutoffRule; reference src/utils/idealscore.py:184-187,
432-444, 524-535, 602-615) at discriminating values: mid-batch cutoffs,
exact boundaries, the partial last batch, label x max_samples interplay,
and the shuffled LS/ELS streams with the reference DataLoader's recorded
permutations (idealscore.py:489)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
from convolutional_diffusion_tpu.scores import (
    IdealScoreModule,
    LocalEquivBordersScoreModule,
    LocalEquivScoreModule,
    LocalScoreModule,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "cutoffs.npz")
BS = 5  # reference batch size: batches [5, 5, 2] over N=12


@pytest.fixture(scope="module")
def z():
    if not os.path.exists(GOLDEN):
        pytest.skip("goldens missing — run tools/make_goldens.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def data(z):
    imgs = np.transpose(z["imgs"], (0, 2, 3, 1))  # NCHW -> NHWC
    labs = z["labs"].astype(np.int32)
    x = np.transpose(z["x"], (0, 2, 3, 1))
    t = float(z["t"][0])
    return imgs, labs, x, t


def check(ours, z, key, atol=2e-4):
    expect = np.transpose(z[key], (0, 2, 3, 1))
    scale = max(np.abs(expect).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(ours), expect, atol=atol * scale, err_msg=key
    )


class TestFilteredCutoff:  # IdealScoreModule
    def test_partial_last_batch_edge(self, z, data):
        imgs, labs, x, t = data
        mod = IdealScoreModule(
            (imgs, labs), batch_size=BS, schedule=cosine_noise_schedule,
            max_samples=11,
        )
        check(mod(t, x), z, "is/max11/out")

    def test_label_and_max_samples(self, z, data):
        # FILTERED: the cutoff counts label-kept images, so label=1 +
        # max_samples=6 admits two batches (kept cumsum 3, 5) where the
        # UNFILTERED rule would admit one (raw cumsum 5, 10)
        imgs, labs, x, t = data
        mod = IdealScoreModule(
            (imgs, labs), batch_size=BS, schedule=cosine_noise_schedule,
            max_samples=6,
        )
        check(mod(t, x, label=1), z, "is/label1max6/out")


class TestUnfilteredCutoff:  # LocalEquivScoreModule (ELS)
    @pytest.mark.parametrize(
        "max_samples,tag", [(8, "max8"), (10, "max10"), (11, "max11")]
    )
    def test_raw_count_cutoff(self, z, data, max_samples, tag):
        imgs, labs, x, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, max_samples=max_samples,
        )
        check(mod(t, x), z, f"els/{tag}/out")

    def test_label_and_max_samples(self, z, data):
        # UNFILTERED: raw batch sizes drive the cutoff even under a label
        # filter (reference counts i += images.shape[0] BEFORE filtering)
        imgs, labs, x, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, max_samples=6,
        )
        check(mod(t, x, label=1), z, "els/label1max6/out")

    def test_streaming_mode_matches(self, z, data):
        # same cutoff through the on-the-fly (bank-less) path
        imgs, labs, x, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, max_samples=11,
            bank_budget_bytes=0,
        )
        check(mod(t, x), z, "els/max11/out")

    def test_shuffled_stream(self, z, data):
        # reference --shuffle: random subset under max_samples; replay the
        # recorded DataLoader permutation through the order argument
        imgs, labs, x, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, max_samples=8,
        )
        check(mod(t, x, order=z["els/max8shuf/perm"]), z, "els/max8shuf/out")


class TestBatchQuotaCutoff:  # LocalEquivBordersScoreModule (bbELS)
    @pytest.mark.parametrize(
        "max_samples,tag",
        [(4, "max4"), (5, "max5"), (11, "max11")],
        ids=["below-quota", "exact-quota", "off-by-one-vs-unfiltered"],
    )
    def test_quota(self, z, data, max_samples, tag):
        # batch i runs iff i*batch_size <= max_samples: max=5 admits TWO
        # batches (1*5 <= 5) and max=11 admits all three (2*5=10 <= 11),
        # where the UNFILTERED rule would stop at two (12 > 11)
        imgs, labs, x, t = data
        mod = LocalEquivBordersScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, max_samples=max_samples,
        )
        check(mod(t, x), z, f"bbels/{tag}/out")


class TestShuffledLocalScore:  # LocalScoreModule (always-shuffled in ref)
    def test_max_samples_random_subset(self, z, data):
        imgs, labs, x, t = data
        mod = LocalScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, max_samples=8,
        )
        check(mod(t, x, order=z["ls/max8shuf/perm"]), z, "ls/max8shuf/out")

    def test_label_and_max_samples_shuffled(self, z, data):
        imgs, labs, x, t = data
        mod = LocalScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, max_samples=4,
        )
        check(
            mod(t, x, label=0, order=z["ls/label0max4shuf/perm"]),
            z,
            "ls/label0max4shuf/out",
        )


class TestShuffleDeterminism:
    def test_key_deterministic_and_fresh_per_call(self, data):
        imgs, labs, x, t = data
        kw = dict(
            kernel_size=3, batch_size=BS, schedule=cosine_noise_schedule,
            max_samples=8, shuffle=True,
        )
        a = LocalEquivScoreModule((imgs, labs), shuffle_key=jax.random.PRNGKey(4), **kw)
        b = LocalEquivScoreModule((imgs, labs), shuffle_key=jax.random.PRNGKey(4), **kw)
        o1, o2 = a(t, x), a(t, x)  # two calls -> two permutations
        r1 = b(t, x)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(r1))  # same key+index
        assert not np.allclose(np.asarray(o1), np.asarray(o2))  # reshuffled

    def test_shuffle_noop_without_cutoff_or_partial_batches(self, data):
        # order only matters through batch composition: with full batches,
        # no label and no max_samples, a shuffled stream is exact-equal math
        imgs, labs, x, t = data
        base = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=6,
            schedule=cosine_noise_schedule,
        )
        perm = np.random.RandomState(0).permutation(12)
        np.testing.assert_allclose(
            np.asarray(base(t, x, order=perm)),
            np.asarray(base(t, x)),
            rtol=2e-5, atol=2e-6,
        )


class TestVectorLabelELS:
    """Batched conditional ELS: label=[b] vector, one label per seed (a
    capability the reference lacks — its modules filter per scalar call).
    Must equal the per-label scalar calls exactly in every mode."""

    def _mods_and_inputs(self, data, **kw):
        imgs, labs, _, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=BS,
            schedule=cosine_noise_schedule, **kw,
        )
        key = jax.random.PRNGKey(5)
        x = jax.random.normal(key, (4, 8, 8, 3))
        vec = np.array([0, 2, 1, 0], np.int32)
        return mod, x, vec, t

    def _expect(self, mod, t, x, vec):
        rows = [
            np.asarray(mod(t, x[i : i + 1], label=int(vec[i])))
            for i in range(len(vec))
        ]
        return np.concatenate(rows, axis=0)

    def test_bank_mode(self, data):
        mod, x, vec, t = self._mods_and_inputs(data)
        got = np.asarray(mod(t, x, label=vec))
        np.testing.assert_allclose(
            got, self._expect(mod, t, x, vec), rtol=2e-5, atol=2e-6
        )

    def test_streaming_fallback(self, data):
        mod, x, vec, t = self._mods_and_inputs(data, bank_budget_bytes=0)
        got = np.asarray(mod(t, x, label=vec))
        np.testing.assert_allclose(
            got, self._expect(mod, t, x, vec), rtol=2e-5, atol=2e-6
        )

    def test_with_max_samples(self, data):
        mod, x, vec, t = self._mods_and_inputs(data, max_samples=8)
        got = np.asarray(mod(t, x, label=vec))
        np.testing.assert_allclose(
            got, self._expect(mod, t, x, vec), rtol=2e-5, atol=2e-6
        )


def test_vector_label_flash_kernel_interpret(data):
    """Per-seed bias rows through the Pallas kernel (interpret mode) must
    match the jnp bank path."""
    from convolutional_diffusion_tpu.ops.flash_score import (
        NEG_INF,
        flash_score_update,
        state_from_pallas,
    )
    from convolutional_diffusion_tpu.scores.common import (
        init_state,
        update_state,
    )

    S, hw, P, d, c = 3, 16, 40, 12, 3
    key = jax.random.PRNGKey(0)
    M = S * hw
    q = jax.random.normal(key, (M, d))
    qn = jnp.sum(q**2, -1)
    bank = jax.random.normal(jax.random.PRNGKey(1), (P, d))
    pn = jnp.sum(bank**2, -1)
    vals = bank[:, :c]
    w = jax.random.uniform(jax.random.PRNGKey(2), (S, P), minval=0.0, maxval=1.0)
    w = jnp.where(w < 0.3, 0.0, w)  # some excluded entries
    at, bt = jnp.float32(0.8), jnp.float32(0.6)

    m, s1, s2 = state_from_pallas(
        *flash_score_update(
            q, qn, bank, pn, vals, w[:, :P], at, bt,
            (jnp.full((M,), NEG_INF), jnp.zeros((M,)), jnp.zeros((M, c))),
            interpret=True, rows_per_seed=hw,
        )
    )

    logits = -(qn[:, None] - 2 * at * (q @ bank.T) + at**2 * pn) / (2 * bt**2)
    wrow = jnp.repeat(w, hw, axis=0)
    ref = update_state(init_state((M,), c), logits, wrow, vals)
    np.testing.assert_allclose(np.asarray(s2 / s1[:, None]),
                               np.asarray(ref.s2 / ref.s1[:, None]),
                               rtol=2e-5, atol=2e-6)


def test_vector_label_shuffled_streaming_matches_bank(data):
    """With shuffle=True the streaming fallback must use ONE permutation for
    all unique-label groups (same as the bank path's single order)."""
    imgs, labs, _, t = data
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 3))
    vec = np.array([0, 2, 1, 0], np.int32)
    kw = dict(
        kernel_size=3, batch_size=BS, schedule=cosine_noise_schedule,
        max_samples=8, shuffle=True,
    )
    stream = LocalEquivScoreModule(
        (imgs, labs), shuffle_key=jax.random.PRNGKey(7),
        bank_budget_bytes=0, **kw,
    )
    banked = LocalEquivScoreModule(
        (imgs, labs), shuffle_key=jax.random.PRNGKey(7), **kw
    )
    np.testing.assert_allclose(
        np.asarray(stream(t, x, label=vec)),
        np.asarray(banked(t, x, label=vec)),
        rtol=2e-5, atol=2e-6,
    )
