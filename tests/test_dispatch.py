"""Dispatch segmentation (ops.dispatch): long dataset sweeps split into
several back-to-back executions with device-carried softmax state.

The split exists because the image's remote-TPU tunnel kills any single
execution over ~60 s (measured round 3: a 57.6 s ELS machine step passes, a
~72 s one reproducibly crashes the worker). Splitting a sequential scan at
chunk boundaries is bit-exact, which is exactly what these tests pin: a
module forced to segment (tiny dispatch_target_s) must produce bitwise the
same scores as the one-shot path (dispatch_target_s=0 disables).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu.data import synthetic_dataset
from convolutional_diffusion_tpu.ops.dispatch import (
    est_gpairs_per_s,
    plan_segments,
)
from convolutional_diffusion_tpu.scores import (
    LocalEquivBordersScoreModule,
    LocalEquivScoreModule,
)


def test_plan_segments_basics():
    # small work -> one segment
    assert plan_segments(1e6, precision="high", d=27, n_chunks=100) == 1
    # target <= 0 disables
    assert (
        plan_segments(1e18, precision="high", d=27, n_chunks=100, target_s=0)
        == 1
    )
    # huge work splits, capped at the chunk count
    n = plan_segments(1e15, precision="highest", d=2187, n_chunks=7)
    assert n == 7
    # a 72 s 'high' dp=256 call (the measured crash config) must split:
    # 5.51e12 pairs at 82 Gpairs/s ~ 67 s > 30 s target
    assert (
        plan_segments(5.51e12, precision="high", d=147, n_chunks=2632) >= 2
    )
    # single chunk can never split
    assert plan_segments(1e18, precision="high", d=27, n_chunks=1) == 1


def test_rate_table_monotone_conservative():
    for prec in ("highest", "high", "default"):
        rates = [est_gpairs_per_s(prec, dp) for dp in
                 (128, 256, 384, 512, 896, 1152, 2048, 2304, 4096)]
        assert all(a >= b for a, b in zip(rates, rates[1:]))
        # in-between dp resolves to the slower (larger) bucket
        assert est_gpairs_per_s(prec, 300) == est_gpairs_per_s(prec, 384)


@pytest.fixture(scope="module")
def data():
    ds = synthetic_dataset(num_samples=37, image_size=8, num_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    return ds, x


def _pair(cls, ds, **kw):
    one = cls((ds.images, ds.labels), batch_size=8, target_block=64,
              dispatch_target_s=0.0, **kw)
    seg = cls((ds.images, ds.labels), batch_size=8, target_block=64,
              dispatch_target_s=1e-12, **kw)
    return one, seg


@pytest.mark.parametrize("cls", [LocalEquivScoreModule,
                                 LocalEquivBordersScoreModule])
@pytest.mark.parametrize("budget", [8 << 30, 0])
def test_segmented_bitexact(cls, budget, data):
    ds, x = data
    one, seg = _pair(cls, ds, bank_budget_bytes=budget)
    # the forced-segment module really segments (not a vacuous test)
    fn = seg._jit_cache
    a = one(0.45, x, k=3)
    b = seg(0.45, x, k=3)
    assert seg._jit_cache and not all(
        hasattr(v, "lower") for v in seg._jit_cache.values()
    ), "expected at least one host-side segmented closure"
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a second k (different geometry) too
    a = one(0.3, x, label=2, k=5)
    b = seg(0.3, x, label=2, k=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmented_vector_label(data):
    ds, x = data
    one, seg = _pair(LocalEquivScoreModule, ds)
    lab = np.array([1, 3])
    a = one(0.45, x, label=lab, k=3)
    b = seg(0.45, x, label=lab, k=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmented_shuffle(data):
    """Shuffled streams resolve the permutation once per call, outside the
    segment loop — same order for every segment, same result."""
    ds, x = data
    key = jax.random.PRNGKey(7)
    one = LocalEquivScoreModule(
        (ds.images, ds.labels), batch_size=8, target_block=64,
        bank_budget_bytes=0, shuffle=True, shuffle_key=key,
        dispatch_target_s=0.0,
    )
    seg = LocalEquivScoreModule(
        (ds.images, ds.labels), batch_size=8, target_block=64,
        bank_budget_bytes=0, shuffle=True, shuffle_key=key,
        dispatch_target_s=1e-12,
    )
    a = one(0.45, x, k=3)  # call 0 permutation
    b = seg(0.45, x, k=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
