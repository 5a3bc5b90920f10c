"""Parallel subsystem tests on the 8-device CPU mesh: dataset-sharded ELS
equals the single-device module, and the collective merge equals the
sequential streaming merge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu.parallel.mesh import make_mesh
from convolutional_diffusion_tpu.parallel.sharded_score import (
    ShardedLocalEquivBordersScoreModule,
    ShardedLocalEquivScoreModule,
    shard_dataset,
)
from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
from convolutional_diffusion_tpu.scores import LocalEquivScoreModule


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(0)
    images = rs.uniform(-1, 1, size=(48, 8, 8, 3)).astype(np.float32)
    labels = rs.randint(0, 3, size=(48,)).astype(np.int32)
    x = rs.normal(size=(2, 8, 8, 3)).astype(np.float32)
    return images, labels, x


def test_sharded_els_matches_single_device(data):
    images, labels, x = data
    assert jax.device_count() == 8
    mesh = make_mesh(8)
    single = LocalEquivScoreModule(
        (images, labels), kernel_size=3, batch_size=12,
        schedule=cosine_noise_schedule,
    )
    sharded = ShardedLocalEquivScoreModule(
        (images, labels), mesh=mesh, kernel_size=3, batch_size=12,
        schedule=cosine_noise_schedule,
    )
    for t in (0.3, 0.7):
        a = np.asarray(single(t, x))
        b = np.asarray(sharded(t, x))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_sharded_els_label_and_max_samples(data):
    images, labels, x = data
    mesh = make_mesh(8)
    kw = dict(kernel_size=3, batch_size=10, schedule=cosine_noise_schedule,
              max_samples=30)
    single = LocalEquivScoreModule((images, labels), **kw)
    sharded = ShardedLocalEquivScoreModule((images, labels), mesh=mesh, **kw)
    a = np.asarray(single(0.5, x, label=1))
    b = np.asarray(sharded(0.5, x, label=1))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_sharded_bbels_matches_single_device(data):
    from convolutional_diffusion_tpu.scores import LocalEquivBordersScoreModule

    images, labels, x = data
    mesh = make_mesh(8)
    kw = dict(kernel_size=3, batch_size=12, schedule=cosine_noise_schedule)
    single = LocalEquivBordersScoreModule((images, labels), **kw)
    sharded = ShardedLocalEquivBordersScoreModule((images, labels), mesh=mesh, **kw)
    for t in (0.35, 0.8):
        a = np.asarray(single(t, x))
        b = np.asarray(sharded(t, x))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_merge_collective_equals_sequential():
    from functools import partial

    from convolutional_diffusion_tpu.parallel.sharded_score import merge_collective
    from convolutional_diffusion_tpu.scores.common import (
        init_state,
        merge_states,
        SoftmaxState,
    )

    rs = np.random.RandomState(1)
    n_dev = 8
    m = jnp.asarray(rs.normal(size=(n_dev, 4)) * 5)
    s1 = jnp.asarray(rs.uniform(0.5, 2, size=(n_dev, 4)))
    s2 = jnp.asarray(rs.normal(size=(n_dev, 4, 2)))

    # sequential merge of the 8 partial states
    acc = SoftmaxState(m[0], s1[0], s2[0])
    for i in range(1, n_dev):
        acc = merge_states(acc, SoftmaxState(m[i], s1[i], s2[i]))

    # collective merge via pmap over 8 CPU devices
    f = jax.pmap(
        lambda mm, ss1, ss2: merge_collective(mm, ss1, ss2, "i"), axis_name="i"
    )
    mg, s1g, s2g = f(m, s1, s2)
    np.testing.assert_allclose(np.asarray(mg[0]), np.asarray(acc.m), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2g[0] / s1g[0][:, None]),
        np.asarray(acc.s2 / acc.s1[:, None]),
        rtol=1e-5,
    )


def test_shard_dataset_placement(data):
    images, labels, _ = data
    mesh = make_mesh(8)
    si, sl = shard_dataset(jnp.asarray(images), jnp.asarray(labels), mesh)
    assert si.sharding.spec == jax.sharding.PartitionSpec("data", None, None, None)
    assert sl.sharding.spec == jax.sharding.PartitionSpec("data")


def test_sharded_els_rejects_vector_label():
    """Vector labels are a single-device bank-mode capability; the sharded
    module must refuse loudly (the pipeline then groups by label)."""
    import numpy as np
    import pytest

    from convolutional_diffusion_tpu.parallel.mesh import make_mesh
    from convolutional_diffusion_tpu.parallel.sharded_score import (
        ShardedLocalEquivScoreModule,
    )

    rs = np.random.RandomState(0)
    imgs = rs.uniform(-1, 1, (16, 8, 8, 1)).astype(np.float32)
    labs = rs.randint(0, 3, 16).astype(np.int32)
    mod = ShardedLocalEquivScoreModule(
        (imgs, labs), mesh=make_mesh(8), kernel_size=3, batch_size=8,
        use_pallas=False,
    )
    assert not mod.supports_vector_label
    with pytest.raises(ValueError, match="scalar label"):
        mod(0.5, jnp.zeros((2, 8, 8, 1)), label=np.array([0, 1]))


def test_sharded_is_matches_single_device(data):
    """Round-3 VERDICT item 7: dataset-sharded IS == single-device on the
    8-device mesh (same FILTERED cutoff + label semantics)."""
    from convolutional_diffusion_tpu.parallel.sharded_score import (
        ShardedIdealScoreModule,
    )
    from convolutional_diffusion_tpu.scores import IdealScoreModule

    images, labels, x = data
    mesh = make_mesh(8)
    kw = dict(batch_size=10, schedule=cosine_noise_schedule, max_samples=30)
    single = IdealScoreModule((images, labels), **kw)
    sharded = ShardedIdealScoreModule((images, labels), mesh=mesh, **kw)
    for t, lab in ((0.3, None), (0.6, 1)):
        a = np.asarray(single(t, x, label=lab))
        b = np.asarray(sharded(t, x, label=lab))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_sharded_ls_matches_single_device(data):
    """Dataset-sharded LS == single-device; the shuffle permutation is
    resolved globally, so an explicit `order` pins both modules to the same
    stream (LS defaults shuffle=True, mirroring the reference DataLoader)."""
    from convolutional_diffusion_tpu.parallel.sharded_score import (
        ShardedLocalScoreModule,
    )
    from convolutional_diffusion_tpu.scores import LocalScoreModule

    images, labels, x = data
    mesh = make_mesh(8)
    order = np.random.RandomState(7).permutation(images.shape[0])
    kw = dict(kernel_size=3, batch_size=10, schedule=cosine_noise_schedule,
              max_samples=25)
    single = LocalScoreModule((images, labels), **kw)
    sharded = ShardedLocalScoreModule((images, labels), mesh=mesh, **kw)
    a = np.asarray(single(0.4, x, order=order))
    b = np.asarray(sharded(0.4, x, order=order))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_build_score_module_mesh_routing(data):
    """cli.common.build_score_module(mesh=...) returns the sharded variant
    for every module kind and the result matches the single-device factory
    output (the els CLI's --ndevices path, all four scoremoduletypes)."""
    from convolutional_diffusion_tpu.cli.common import build_score_module

    images, labels, x = data
    mesh = make_mesh(8)
    for kind in ("IS", "LS", "ELS", "bbELS"):
        kw = dict(batch_size=12, image_size=8, channels=3,
                  schedule=cosine_noise_schedule)
        single = build_score_module(kind, (images, labels), **kw)
        sharded = build_score_module(kind, (images, labels), mesh=mesh, **kw)
        assert sharded.__class__.__name__.startswith("Sharded"), kind
        order = np.arange(images.shape[0])  # pin LS's shuffle
        a = np.asarray(single(0.5, x, order=order))
        b = np.asarray(sharded(0.5, x, order=order))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=kind)


def test_sharded_els_large_d_regime():
    """The 64x64-workload d regime (k=27 -> d=2187, the dp>2048 block-policy
    branch): sharded == single on the 8-device mesh with a tiny bank,
    end-to-end through the sharded merge — the CelebA_UNet_zeros workload's
    hardest step d. imsize 48 keeps the CPU cost test-sized; d (and with it
    every kernel-policy branch) depends only on k."""
    rs = np.random.RandomState(7)
    images = rs.uniform(-1, 1, size=(12, 48, 48, 3)).astype(np.float32)
    labels = rs.randint(0, 2, size=(12,)).astype(np.int32)
    x = rs.normal(size=(1, 48, 48, 3)).astype(np.float32)
    mesh = make_mesh(8)
    kw = dict(kernel_size=27, batch_size=4, schedule=cosine_noise_schedule)
    single = LocalEquivScoreModule((images, labels), **kw)
    sharded = ShardedLocalEquivScoreModule((images, labels), mesh=mesh, **kw)
    a = np.asarray(single(0.5, x))
    b = np.asarray(sharded(0.5, x))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
