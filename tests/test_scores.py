"""Analytic score machine parity vs the torch reference (goldens recorded by
tools/make_goldens.py from /root/reference/src/utils/idealscore.py), plus
structural unit tests of the streaming-softmax scaffold."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu.schedules import (
    cosine_noise_schedule,
    exponential_schedule,
)
from convolutional_diffusion_tpu.scores import (
    IdealScoreModule,
    LocalEquivBordersScoreModule,
    LocalEquivScoreModule,
    LocalScoreModule,
    ScheduledScoreMachine,
    init_state,
    merge_states,
    update_state,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "scores.npz")


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


class TestIdealScore:
    def test_uneven_batches(self, z, data):
        imgs, labs, x, t = data
        mod = IdealScoreModule((imgs, labs), batch_size=5, schedule=cosine_noise_schedule)
        check(mod(t, x), z, "is/b5/out")

    def test_single_batch(self, z, data):
        imgs, labs, x, t = data
        mod = IdealScoreModule((imgs, labs), batch_size=12, schedule=cosine_noise_schedule)
        check(mod(t, x), z, "is/b12/out")

    def test_label_filter(self, z, data):
        imgs, labs, x, t = data
        mod = IdealScoreModule((imgs, labs), batch_size=5, schedule=cosine_noise_schedule)
        check(mod(t, x, label=1), z, "is/label1/out")

    def test_max_samples(self, z, data):
        imgs, labs, x, t = data
        mod = IdealScoreModule(
            (imgs, labs), batch_size=5, schedule=cosine_noise_schedule, max_samples=8
        )
        check(mod(t, x), z, "is/max8/out")


class TestLocalScore:
    @pytest.mark.parametrize("k", [3, 5])
    def test_kernel_sizes(self, z, data, k):
        imgs, labs, x, t = data
        mod = LocalScoreModule(
            (imgs, labs), kernel_size=k, batch_size=12, schedule=cosine_noise_schedule
        )
        check(mod(t, x), z, f"ls/k{k}/out")

    def test_exponential_default_schedule(self, z, data):
        imgs, labs, x, t = data
        mod = LocalScoreModule((imgs, labs), kernel_size=3, batch_size=12)
        assert mod.schedule is exponential_schedule  # reference default quirk
        check(mod(t, x), z, "ls/k3exp/out")


class TestELS:
    @pytest.mark.parametrize("k", [3, 5])
    @pytest.mark.parametrize("bs", [5, 12])
    def test_kernel_and_batch(self, z, data, k, bs):
        imgs, labs, x, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=k, batch_size=bs, schedule=cosine_noise_schedule
        )
        check(mod(t, x), z, f"els/k{k}b{bs}/out")

    def test_label_filter(self, z, data):
        imgs, labs, x, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=5, schedule=cosine_noise_schedule
        )
        check(mod(t, x, label=2), z, "els/k3label2/out")

    def test_k_override_arg(self, z, data):
        imgs, labs, x, t = data
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=12, schedule=cosine_noise_schedule
        )
        check(mod(t, x, k=5), z, "els/k5b12/out")


class TestBbELS:
    @pytest.mark.parametrize("k", [3, 5])
    @pytest.mark.parametrize("bs", [5, 12])
    def test_kernel_and_batch(self, z, data, k, bs):
        imgs, labs, x, t = data
        mod = LocalEquivBordersScoreModule(
            (imgs, labs),
            kernel_size=k,
            batch_size=bs,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x), z, f"bbels/k{k}b{bs}/out")

    def test_fallback_when_k_geq_h(self, data):
        imgs, labs, x, t = data
        mod = LocalEquivBordersScoreModule(
            (imgs, labs), kernel_size=9, batch_size=12, schedule=cosine_noise_schedule
        )
        ls = LocalScoreModule(
            (imgs, labs), kernel_size=9, batch_size=12, schedule=cosine_noise_schedule
        )
        np.testing.assert_allclose(
            np.asarray(mod(t, x)), np.asarray(ls(t, x)), rtol=1e-6, atol=1e-6
        )

    def test_batched_matches_single(self, data):
        """Our bbELS lifts the reference's b=1 restriction; batched rows must
        equal independent single-sample runs."""
        imgs, labs, x, t = data
        mod = LocalEquivBordersScoreModule(
            (imgs, labs), kernel_size=3, batch_size=12, schedule=cosine_noise_schedule
        )
        x2 = np.concatenate([x, x[::-1] * 0.5], axis=0)
        batched = np.asarray(mod(t, x2))
        for i in range(2):
            single = np.asarray(mod(t, x2[i : i + 1]))
            np.testing.assert_allclose(batched[i : i + 1], single, rtol=2e-4, atol=1e-4)


class TestLargerBorders:
    def test_bbels_k7_on_12x12(self, z):
        """3-pixel border bands: stresses the region decomposition beyond
        the k=3/5-on-8x8 goldens."""
        imgs = np.transpose(z["big/imgs"], (0, 2, 3, 1))
        labs = z["big/labs"].astype(np.int32)
        x = np.transpose(z["big/x"], (0, 2, 3, 1))
        t = float(z["t"][0])
        mod = LocalEquivBordersScoreModule(
            (imgs, labs), kernel_size=7, batch_size=4, image_size=12,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x), z, "big/bbels_k7/out")


class TestBatchedX:
    def test_els_b2(self, z, data):
        imgs, labs, x, t = data
        x2 = np.transpose(z["x2"], (0, 2, 3, 1))
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=5,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x2), z, "els/k3b5x2/out")

    def test_is_b2_lifts_reference_crash(self, z, data):
        """The reference IS module cannot run b>1 (broadcast bug at
        idealscore.py:636); ours must handle it, consistent with the b=1
        results row by row."""
        imgs, labs, x, t = data
        x2 = np.transpose(z["x2"], (0, 2, 3, 1))
        mod = IdealScoreModule(
            (imgs, labs), batch_size=12, schedule=cosine_noise_schedule
        )
        batched = np.asarray(mod(t, x2))
        for i in range(2):
            single = np.asarray(mod(t, x2[i : i + 1]))
            np.testing.assert_allclose(
                batched[i : i + 1], single, rtol=1e-5, atol=1e-5
            )


class TestMachine:
    def test_els_machine(self, z, data):
        imgs, labs, x, t = data
        scales = [int(s) for s in z["machine/scales"]]
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=6, schedule=cosine_noise_schedule
        )
        machine = ScheduledScoreMachine(
            mod, in_channels=3, imsize=8, scales=scales, score_backbone=True
        )
        check(machine(jnp.asarray(x)), z, "machine/els/out", atol=5e-4)

    def test_bbels_machine(self, z, data):
        imgs, labs, x, t = data
        scales = [int(s) for s in z["machine/scales"]]
        mod = LocalEquivBordersScoreModule(
            (imgs, labs), kernel_size=3, batch_size=6, schedule=cosine_noise_schedule
        )
        machine = ScheduledScoreMachine(
            mod, in_channels=3, imsize=8, scales=scales, score_backbone=True
        )
        check(machine(jnp.asarray(x)), z, "machine/bbels/out", atol=5e-4)


class TestGrayscale:
    """c=1 regime goldens (16x16): the MNIST/FashionMNIST workload family —
    4 of the reference's 10 stored scales files are single-channel — and
    d = k^2 (not k^2*3) exercises different kernel lane-padding bands
    (k=7 -> d=49, dp=128). Recorded with the reference's `channels=1` ctor
    arg (idealscore.py:133,381)."""

    @pytest.fixture(scope="class")
    def data16(self, z):
        imgs = np.transpose(z["gray/imgs16"], (0, 2, 3, 1))
        labs = z["gray/labs16"].astype(np.int32)
        x = np.transpose(z["gray/x16"], (0, 2, 3, 1))
        return imgs, labs, x, float(z["t"][0])

    @pytest.mark.parametrize("k", [3, 7])
    def test_els_gray(self, z, data16, k):
        imgs, labs, x, t = data16
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=k, batch_size=4,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x), z, f"gray/els_k{k}/out")

    def test_bbels_gray_k5(self, z, data16):
        imgs, labs, x, t = data16
        mod = LocalEquivBordersScoreModule(
            (imgs, labs), kernel_size=5, batch_size=4,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x), z, "gray/bbels_k5/out")

    def test_ls_gray_k3(self, z, data16):
        imgs, labs, x, t = data16
        mod = LocalScoreModule(
            (imgs, labs), kernel_size=3, batch_size=10,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x), z, "gray/ls_k3/out")

    def test_is_gray(self, z, data16):
        imgs, labs, x, t = data16
        mod = IdealScoreModule(
            (imgs, labs), batch_size=4, schedule=cosine_noise_schedule
        )
        check(mod(t, x), z, "gray/is/out")

    def test_machine_gray(self, z, data16):
        imgs, labs, x, t = data16
        scales = [int(v) for v in z["gray/machine/scales"]]
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=4,
            schedule=cosine_noise_schedule,
        )
        machine = ScheduledScoreMachine(
            mod, in_channels=1, imsize=16, scales=scales
        )
        check(machine(x), z, "gray/machine/out", atol=5e-4)


class TestEvenKernelGuard:
    @pytest.mark.parametrize("cls", [
        LocalScoreModule, LocalEquivScoreModule, LocalEquivBordersScoreModule
    ])
    def test_even_k_rejected(self, data, cls):
        imgs, labs, x, t = data
        mod = cls((imgs, labs), kernel_size=3, batch_size=12,
                  schedule=cosine_noise_schedule)
        with pytest.raises(ValueError, match="odd"):
            mod(t, x, k=4)


class TestStreamingSoftmax:
    def test_online_equals_dense(self):
        rs = np.random.RandomState(0)
        logits = jnp.asarray(rs.normal(size=(4, 64)) * 10)
        values = jnp.asarray(rs.normal(size=(64, 3)))
        w = jnp.asarray(rs.uniform(0.5, 1.5, size=(64,)))
        state = init_state((4,), 3)
        for s in range(0, 64, 16):
            state = update_state(
                state, logits[:, s : s + 16], w[None, s : s + 16], values[s : s + 16]
            )
        e = np.exp(np.asarray(logits) - np.asarray(logits).max(1, keepdims=True))
        e = e * np.asarray(w)[None, :]
        expect = (e @ np.asarray(values)) / e.sum(1, keepdims=True)
        got = np.asarray(state.s2 / state.s1[:, None])
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    def test_merge_associative(self):
        rs = np.random.RandomState(1)
        logits = jnp.asarray(rs.normal(size=(2, 48)) * 5)
        values = jnp.asarray(rs.normal(size=(48, 2)))
        w = jnp.ones((48,))
        full = update_state(init_state((2,), 2), logits, w[None], values)
        a = update_state(init_state((2,), 2), logits[:, :20], w[None, :20], values[:20])
        b = update_state(init_state((2,), 2), logits[:, 20:], w[None, 20:], values[20:])
        merged = merge_states(a, b)
        np.testing.assert_allclose(
            np.asarray(merged.s2 / merged.s1[:, None]),
            np.asarray(full.s2 / full.s1[:, None]),
            rtol=1e-5,
        )

    def test_zero_weight_entries_ignored(self):
        logits = jnp.asarray([[0.0, 100.0]])
        values = jnp.asarray([[1.0], [2.0]])
        w = jnp.asarray([[1.0, 0.0]])
        st = update_state(init_state((1,), 1), logits, w, values)
        np.testing.assert_allclose(np.asarray(st.s2 / st.s1[:, None]), [[1.0]])


class TestBankBudgetAccounting:
    """Sizing logic of the HBM bank cache at reference (50k CIFAR) scale —
    pure accounting, no sweeps."""

    def _mod(self, budget):
        # shape-only dataset: 64 images stand in; the budget math uses n
        imgs = np.zeros((64, 32, 32, 3), np.float32)
        labs = np.zeros((64,), np.int32)
        mod = LocalEquivScoreModule(
            (imgs, labs), batch_size=256, bank_budget_bytes=budget
        )
        return mod

    def test_misses_are_not_poisoned(self):
        mod = self._mod(budget=0)
        assert mod._bank(3) is None
        assert 3 not in mod._bank_cache  # retried next call
        mod.bank_budget_bytes = 1 << 30
        assert mod._bank(3) is not None

    def test_cumulative_budget(self):
        from convolutional_diffusion_tpu.scores.bank import bank_nbytes

        # exact compact-layout cost (images padded to whole chunks), at the
        # module's own target_block
        tb = self._mod(budget=0).target_block
        k3 = bank_nbytes(64, 32, 32, 3, 3, tb)
        k5 = bank_nbytes(64, 32, 32, 3, 5, tb)
        mod = self._mod(budget=k3 + k5 // 2)
        assert mod._bank(3) is not None  # fits
        assert mod._bank(5) is None  # cumulative budget exceeded
        assert mod._bank_bytes_used == k3

    def test_bank_nbytes_is_layout_honest(self):
        # the accounting must equal the stored arrays' actual HBM payload:
        # flat [nblk, B*d]/[nblk, B*c]/[nblk, B] rows tile exactly (a 2-D
        # [P, d=27] store would pad 27 -> 128 lanes, a silent 4.7x bloat —
        # the round-2 50k-bank OOM)
        from convolutional_diffusion_tpu.scores.bank import (
            bank_geometry,
            bank_nbytes,
        )

        mod = self._mod(budget=1 << 30)
        bank, ctr, pn = mod._bank(3)
        stored = (bank.size + ctr.size + pn.size) * 4
        assert stored == bank_nbytes(64, 32, 32, 3, 3, mod.target_block)
        g = bank_geometry(64, 32, 32, 3, 3, mod.target_block)
        assert bank.shape == (g.nblk, g.block * g.d)
        assert ctr.shape == (g.nblk, g.block * 3)
        assert pn.shape == (g.nblk, g.block)

    def test_50k_scale_fit_profile(self):
        # the machine requests banks in DESCENDING k (scales[19..1]); at 50k
        # CIFAR images with the 8 GiB default, only the k=3 bank (5.58 GB
        # compact) caches — the 12.39 GB k=5 bank fits a 16 GB chip on paper
        # but RESOURCE_EXHAUSTs at runtime next to the image set and per-call
        # transients (measured on v5e), which is why the default is 8 GiB
        from convolutional_diffusion_tpu.scores.bank import bank_nbytes

        n, h, c = 50000, 32, 3
        budget = 8 << 30
        used = 0
        fits = {}
        for k in (17, 15, 13, 11, 9, 7, 5, 3):
            nbytes = bank_nbytes(n, h, h, c, k, 16384)
            fits[k] = used + nbytes <= budget
            if fits[k]:
                used += nbytes
        assert fits[3]
        assert not any(fits[k] for k in (17, 15, 13, 11, 9, 7, 5))
        # and the cached k=3 bank leaves ample headroom on a 16 GB chip
        # next to the 0.61 GB image set
        assert used + 50000 * h * h * c * 4 < 7 << 30

    def test_chunk_clamped_to_dataset(self):
        # a target_block larger than the whole bank must not zero-pad the
        # single chunk up to the block (wasted sweep compute on small sets)
        from convolutional_diffusion_tpu.scores.bank import bank_geometry

        g = bank_geometry(4, 12, 12, 3, 3, 65536)
        assert g.cs == 4 and g.nblk == 1 and g.block == 4 * 100

    def test_shared_ledger_across_modules(self):
        # the calibration fleet passes ONE ledger to all per-k modules so
        # cached banks are capped cumulatively across instances (at
        # maxsamps=5000 the eight per-k ELS banks would otherwise sum to
        # ~23 GB on a 16 GB chip)
        from convolutional_diffusion_tpu.scores.bank import (
            BankLedger,
            bank_nbytes,
        )

        imgs = np.zeros((64, 32, 32, 3), np.float32)
        labs = np.zeros((64,), np.int32)
        k3 = bank_nbytes(64, 32, 32, 3, 3, 65536)
        ledger = BankLedger(k3)
        m1 = LocalEquivScoreModule((imgs, labs), bank_ledger=ledger)
        m2 = LocalEquivScoreModule((imgs, labs), bank_ledger=ledger)
        assert m1._bank(3) is not None
        assert m2._bank(3) is None  # fleet budget exhausted by m1
        assert m1._bank_bytes_used == m2._bank_bytes_used == k3


class TestReviewGuards:
    def _data(self):
        imgs = np.random.RandomState(0).normal(size=(12, 8, 8, 3)).astype(np.float32)
        labs = np.arange(12, dtype=np.int32) % 3
        x = np.random.RandomState(1).normal(size=(2, 8, 8, 3)).astype(np.float32)
        return imgs, labs, x

    def test_ideal_accepts_any_k(self):
        # the reference IS forward swallows k via **kwargs
        # (idealscore.py:600); an even scales entry must not raise, and all
        # k share one compiled entry
        imgs, labs, x = self._data()
        mod = IdealScoreModule((imgs, labs), batch_size=12)
        a = np.asarray(mod(0.4, x, k=4))
        b = np.asarray(mod(0.4, x, k=7))
        np.testing.assert_allclose(a, b)
        assert len(mod._jit_cache) == 1

    def test_vector_label_rejected_outside_els(self):
        imgs, labs, x = self._data()
        vec = np.array([0, 1])
        for mod in (
            IdealScoreModule((imgs, labs), batch_size=12),
            LocalScoreModule((imgs, labs), batch_size=12),
            LocalEquivBordersScoreModule((imgs, labs), batch_size=12),
        ):
            with pytest.raises(ValueError, match="scalar label"):
                mod(0.4, x, label=vec, k=3)

    def test_ledger_released_on_failed_build(self, monkeypatch):
        from convolutional_diffusion_tpu.scores import bank as bank_mod

        imgs, labs, x = self._data()
        mod = LocalEquivScoreModule((imgs, labs), batch_size=12)

        def boom(images, k, target_block):
            raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")

        monkeypatch.setattr(bank_mod, "build_bank", boom)
        with pytest.raises(RuntimeError):
            mod._bank(3)
        assert mod._bank_bytes_used == 0  # reservation rolled back
        monkeypatch.undo()
        assert mod._bank(3) is not None  # retry succeeds

    def test_bbels_local_fallback_lazy_and_shared(self):
        imgs, labs, x = self._data()
        mod = LocalEquivBordersScoreModule((imgs, labs), batch_size=12)
        assert mod._local_fallback_cache is None  # not built eagerly
        out = mod(0.4, x, k=9)  # k >= h triggers the fallback
        assert mod._local_fallback_cache is not None
        # shares the device arrays — no duplicate dataset copy
        assert mod._local_fallback.images is mod.images
        assert np.isfinite(np.asarray(out)).all()


class TestLargeK:
    """Large-d regime goldens (k=13/19 on 24x24, k=27 on 28x28): the padded-d
    bands the TPU kernel's block policy / chunking treat separately, pinned
    against the reference. Goldens are b=1: at b>1 the reference shares its
    max-subtraction across the batch per pixel (idealscore.py:458-465), so
    the weaker seed's denominators go subnormal at large d and ~1% of its
    entries come out NaN/garbage — verified while recording. Our per-query
    online softmax has no such coupling; test_batched_matches_single_large_k
    pins that b=2 stays finite and row-identical to b=1."""

    @pytest.fixture(scope="class")
    def data24(self, z):
        imgs = np.transpose(z["bigk/imgs24"], (0, 2, 3, 1))
        labs = z["bigk/labs24"].astype(np.int32)
        x = np.transpose(z["bigk/x24"], (0, 2, 3, 1))
        return imgs, labs, x, float(z["t"][0])

    @pytest.mark.parametrize("k", [13, 19])
    def test_els_large_k(self, z, data24, k):
        imgs, labs, x, t = data24
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=k, batch_size=5,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x[:1]), z, f"bigk/els_k{k}/out")

    def test_bbels_k13(self, z, data24):
        imgs, labs, x, t = data24
        mod = LocalEquivBordersScoreModule(
            (imgs, labs), kernel_size=13, batch_size=5,
            schedule=cosine_noise_schedule,
        )
        check(mod(t, x[:1]), z, "bigk/bbels_k13/out")

    def test_machine_large_k_schedule(self, z, data24):
        """End-to-end machine across the dp<=512 / dp=1152 bands (k groups
        3/13/19). Tolerance 1e-3: four sequential large-d steps compound
        the fp32 reassociation differences (single-step cases hold 2e-4)."""
        imgs, labs, x, t = data24
        scales = [int(v) for v in z["bigk/machine/scales"]]
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=3, batch_size=5,
            schedule=cosine_noise_schedule,
        )
        machine = ScheduledScoreMachine(
            mod, in_channels=3, imsize=24, scales=scales
        )
        check(machine(x[:1]), z, "bigk/machine/out", atol=1e-3)

    def test_els_k27(self, z):
        imgs = np.transpose(z["bigk/imgs28"], (0, 2, 3, 1))
        labs = z["bigk/labs28"].astype(np.int32)
        x = np.transpose(z["bigk/x28"], (0, 2, 3, 1))
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=27, batch_size=6,
            schedule=cosine_noise_schedule,
        )
        check(mod(float(z["t"][0]), x[:1]), z, "bigk/els_k27/out")

    def test_batched_matches_single_large_k(self, z, data24):
        """The robustness delta vs the reference: at b=2 / k=19 the
        reference NaNs ~3% of entries (cross-seed shared subtraction);
        ours must stay finite and bit-consistent with the b=1 rows."""
        imgs, labs, x, t = data24
        mod = LocalEquivScoreModule(
            (imgs, labs), kernel_size=19, batch_size=5,
            schedule=cosine_noise_schedule,
        )
        batched = np.asarray(mod(t, x))
        assert np.isfinite(batched).all()
        single0 = np.asarray(mod(t, x[:1]))
        np.testing.assert_allclose(
            batched[:1], single0, rtol=2e-4, atol=1e-5
        )
