"""Exact block pruning (ops.prune + the kernel's skip-mask path).

The contract under test: with a valid skip mask, the pruned kernel/module
output is BIT-EQUAL to the unpruned run over the same (clustered) bank —
every skipped tile's posterior weights would underflow to exact fp32 zero
(ops.prune module docstring derives the bound). Clustering itself only
permutes fp32 summation order, so clustered-vs-plain agrees to kernel
rounding. Reference anchor: /root/reference/src/utils/idealscore.py:447-471
(the ELS hot loop whose math is unchanged)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convolutional_diffusion_tpu.data import synthetic_dataset
from convolutional_diffusion_tpu.ops import prune as pr
from convolutional_diffusion_tpu.ops.flash_score import (
    flash_score_update,
    state_to_pallas,
)
from convolutional_diffusion_tpu.scores import LocalEquivScoreModule


@pytest.fixture(autouse=True)
def _interpret_kernel():
    os.environ["CDT_FLASH_INTERPRET"] = "1"
    yield
    os.environ.pop("CDT_FLASH_INTERPRET", None)


def _clustered_problem(seed=0, M=512, P=4096, d=27, c=3):
    rng = np.random.RandomState(seed)
    means = rng.normal(0, 2.0, (8, d)).astype(np.float32)
    cid = np.repeat(np.arange(8), P // 8)
    bank = (means[cid] + rng.normal(0, 0.2, (P, d))).astype(np.float32)
    qcid = np.repeat(rng.permutation(8)[: M // 256], 256)
    q = (means[qcid] + rng.normal(0, 0.1, (M, d))).astype(np.float32)
    w = np.full((P,), 1.0 / P, np.float32)
    return q, bank, w


def _sweep(q, bank, w, at, bt, mask=None):
    M, d = q.shape
    c = 3
    qn = jnp.sum(jnp.asarray(q) ** 2, axis=1)
    pn = jnp.sum(jnp.asarray(bank) ** 2, axis=1)
    state0 = state_to_pallas(
        jnp.full((M,), -jnp.inf), jnp.zeros((M,)), jnp.zeros((M, c))
    )
    return flash_score_update(
        jnp.asarray(q), qn, jnp.asarray(bank), pn,
        jnp.asarray(bank[:, :c]), jnp.asarray(w), jnp.float32(at),
        jnp.float32(bt), state0, block_q=256, block_p=512, interpret=True,
        precision="highest", v_strategy="vpu", prune_mask=mask,
    )


def test_kernel_mask_bitexact_and_skips():
    q, bank, w = _clustered_problem()
    at, bt = 0.99, 0.08
    base = _sweep(q, bank, w, at, bt)
    P, d = bank.shape
    stats = pr.block_stats(
        jnp.asarray(bank.reshape(1, -1)), jnp.ones((1, P), bool), P, d,
        block=512,
    )
    lmax, lmin, anyinc = pr.logw_block_stats(
        jnp.asarray(w.reshape(1, P)), P, block=512
    )
    qn = jnp.sum(jnp.asarray(q) ** 2, axis=1)
    mask = pr.prune_masks(
        jnp.asarray(q), qn, jnp.float32(at), jnp.float32(bt), stats,
        lmax, lmin, anyinc, block_q=256,
    )
    assert float(jnp.mean(mask.astype(jnp.float32))) > 0.5  # bounds bite
    pruned = _sweep(q, bank, w, at, bt, mask=mask)
    for a, b in zip(base, pruned):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_mask_shape_validated():
    q, bank, w = _clustered_problem()
    with pytest.raises(ValueError, match="prune_mask shape"):
        _sweep(q, bank, w, 0.99, 0.08, mask=jnp.zeros((1, 1), jnp.int32))


def test_module_pruned_bitexact_vs_unmasked():
    ds = synthetic_dataset(num_samples=24, image_size=16, num_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    pruned = LocalEquivScoreModule(
        (ds.images, ds.labels), batch_size=8, use_pallas=True, prune=True
    )
    os.environ["CDT_FLASH_PRUNE_THR"] = "1e9"  # all-zero masks, same order
    try:
        unmasked = LocalEquivScoreModule(
            (ds.images, ds.labels), batch_size=8, use_pallas=True, prune=True
        )
        for t in (0.05, 0.3):
            a = np.asarray(pruned(t, x, k=3))
            b = np.asarray(unmasked(t, x, k=3))
            np.testing.assert_array_equal(a, b)
    finally:
        os.environ.pop("CDT_FLASH_PRUNE_THR", None)


def test_module_clustered_matches_plain():
    """Clustering permutes fp32 summation order only — the clustered module
    (weights gathered through img_idx) agrees with the jnp reference path
    to kernel rounding, for unconditional, scalar- and vector-label calls."""
    ds = synthetic_dataset(num_samples=24, image_size=16, num_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    ref = LocalEquivScoreModule(
        (ds.images, ds.labels), batch_size=8, use_pallas=False
    )
    mod = LocalEquivScoreModule(
        (ds.images, ds.labels), batch_size=8, use_pallas=True, prune=True
    )
    for kwargs in ({}, {"label": 3}, {"label": np.array([1, 4], np.int32)}):
        a = np.asarray(ref(0.2, x, k=3, **kwargs))
        b = np.asarray(mod(0.2, x, k=3, **kwargs))
        assert np.abs(a - b).max() < 5e-4, kwargs


def test_module_pruned_machine_trajectory():
    """A short ScheduledScoreMachine trajectory through the pruned module
    stays within tier tolerance of the jnp reference (the machine hits the
    LOW-noise steps where pruning actually fires)."""
    from convolutional_diffusion_tpu.scores import ScheduledScoreMachine

    ds = synthetic_dataset(num_samples=24, image_size=16, num_channels=3)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))
    scales = [3, 3, 3, 5]
    ref = ScheduledScoreMachine(
        LocalEquivScoreModule(
            (ds.images, ds.labels), batch_size=8, use_pallas=False
        ),
        in_channels=3, imsize=16, scales=scales,
    )
    mod = ScheduledScoreMachine(
        LocalEquivScoreModule(
            (ds.images, ds.labels), batch_size=8, use_pallas=True, prune=True
        ),
        in_channels=3, imsize=16, scales=scales,
    )
    a = np.asarray(ref(x))
    b = np.asarray(mod(x))
    assert np.abs(a - b).max() < 1e-3


def test_cluster_perm_weight_gather():
    """The stored img_idx maps every clustered row to its source image:
    rebuild per-row weights both ways and compare."""
    from convolutional_diffusion_tpu.scores.bank import (
        bank_geometry,
        build_bank,
        build_clustered_bank,
    )

    ds = synthetic_dataset(num_samples=10, image_size=12, num_channels=3)
    imgs = jnp.asarray(ds.images)
    g = bank_geometry(10, 12, 12, 3, 3, 1024)
    plain, _, plain_pn = build_bank(imgs, 3, 1024)
    cb = build_clustered_bank(imgs, 3, 1024, n_centers=16, sample_size=256)
    # every clustered row must exist in the plain bank under its img_idx
    flat_plain = np.asarray(plain).reshape(-1, g.d)
    flat_clus = np.asarray(cb.bank).reshape(-1, g.d)
    idx = np.asarray(cb.img_idx).reshape(-1)
    per_img = g.per_img
    # group plain rows by image: rows of image i live at chunk q=i//cs,
    # offset (i%cs)*per_img
    for r in range(0, flat_clus.shape[0], 997):  # strided spot check
        i = idx[r]
        if i >= 10:
            assert not flat_clus[r].any()  # pad-image rows are zero patches
            continue
        q, j = divmod(int(i), g.cs)
        rows = flat_plain[q * g.block + j * per_img:
                          q * g.block + (j + 1) * per_img]
        assert (rows == flat_clus[r]).all(axis=1).any()


def test_logw_block_stats_exclusion():
    w = jnp.asarray(
        np.array([[0.5, 0.0, 0.25, 0.0]], np.float32)
    )
    lmax, lmin, anyinc = pr.logw_block_stats(w, 4, block=2)
    assert np.isclose(float(lmax[0]), -1.0)  # log2 0.5
    assert np.isclose(float(lmin[0]), -1.0)  # min over INCLUDED rows only
    assert np.isclose(float(lmax[1]), -2.0)
    assert bool(anyinc[0]) and bool(anyinc[1])
    lmax2, lmin2, any2 = pr.logw_block_stats(
        jnp.zeros((1, 4), jnp.float32), 4, block=2
    )
    assert not bool(any2[0]) and float(lmax2[0]) <= -1e29
