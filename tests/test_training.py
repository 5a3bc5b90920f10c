"""Trainer tests: loss goes down, optimizer semantics match torch
AdamW + per-step ExponentialLR (the reference recipe, src/utils/train.py:23-26),
data-parallel step runs on the 8-device CPU mesh, checkpoints round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
from convolutional_diffusion_tpu.parallel.mesh import make_mesh
from convolutional_diffusion_tpu.training import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    train_diffusion,
)


@pytest.fixture
def tiny_model():
    net = MinimalResNet(channels=1, emb_dim=16, num_layers=1, mode="zeros")
    model = DiffusionModel(net, in_channels=1, default_imsize=8)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_loss_decreases(tiny_model, tiny_dataset):
    model, params = tiny_model
    images, labels = tiny_dataset
    config = TrainConfig(epochs=30, batch_size=8, lr=3e-3, log_every=1)
    _, _, history = train_diffusion(
        model, params, (images, labels), config, log_fn=lambda s: None
    )
    assert history[-1] < history[0] * 0.9, history


def test_optimizer_matches_torch_adamw_explr():
    """optax.adamw + exponential_decay(transition_steps=1) must track torch
    AdamW + per-batch ExponentialLR on identical params/grads."""
    import torch

    lr, gamma, wd = 1e-2, 0.9, 0.01
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads_seq = [np.array([0.5, -1.0, 0.25], np.float32) * (i + 1) for i in range(5)]

    # torch
    p = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.AdamW([p], lr=lr, weight_decay=wd)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
        sched.step()
    torch_w = p.detach().numpy()

    # ours
    import optax

    schedule = optax.exponential_decay(init_value=lr, transition_steps=1, decay_rate=gamma)
    tx = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), torch_w, rtol=1e-5, atol=1e-6)


def test_data_parallel_step_on_mesh(tiny_model, tiny_dataset):
    model, params = tiny_model
    images, labels = tiny_dataset
    assert jax.device_count() == 8
    mesh = make_mesh(8)
    config = TrainConfig(epochs=2, batch_size=16, lr=1e-3, log_every=1)
    p2, _, history = train_diffusion(
        model, params, (images, labels), config, mesh=mesh, log_fn=lambda s: None
    )
    assert np.isfinite(history).all()

    # sharded result must match single-device result after the same steps
    p1, _, _ = train_diffusion(
        model, params, (images, labels), config, mesh=None, log_fn=lambda s: None
    )
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(tiny_model, tmp_path):
    from convolutional_diffusion_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    model, params = tiny_model
    path = save_checkpoint(str(tmp_path / "ckpt"), params=params, step=7, epoch=3)
    restored = restore_checkpoint(path)
    assert restored["meta"]["step"] == 7 and restored["meta"]["epoch"] == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored["state"]["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # latest-step discovery from the parent dir
    save_checkpoint(str(tmp_path / "ckpt"), params=params, step=11)
    latest = restore_checkpoint(str(tmp_path / "ckpt"))
    assert latest["meta"]["step"] == 11


def test_graft_entry_contract():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)
    g.dryrun_multichip(8)


def test_resume_restores_optimizer_moments(tiny_model, tiny_dataset, tmp_path):
    """Full resume incl. AdamW moments: orbax restores optax namedtuples as
    plain containers (dicts/None), so the restore path must rebuild the
    optimizer treedef from leaves — regression for the round-2 crash."""
    model, params = tiny_model
    images, labels = tiny_dataset
    config = TrainConfig(epochs=1, batch_size=8, lr=1e-3, log_every=1,
                         save_interval=1)
    ckpt = str(tmp_path / "resume_ckpt")
    p1, opt1, _ = train_diffusion(
        model, params, (images, labels), config, checkpoint_dir=ckpt
    )
    p2, opt2, _ = train_diffusion(
        model, params, (images, labels), config, resume_from=ckpt
    )
    # resumed opt state structure matches the live optimizer and carries the
    # saved moments forward (they must differ from a fresh init's zeros)
    assert jax.tree_util.tree_structure(opt2) == jax.tree_util.tree_structure(opt1)
    mu_leaves = jax.tree_util.tree_leaves(opt2)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in mu_leaves)


def test_mesh_training_ragged_tail_and_divisibility(tiny_model):
    model, params = tiny_model
    mesh = make_mesh(8)
    rs = np.random.RandomState(0)
    # 20 samples, batch 8 over 8 devices, drop_last=False: one ragged tail
    # batch of 4 per epoch must train via the replicated fallback, not crash
    images = rs.normal(size=(20, 8, 8, 1)).astype(np.float32)
    labels = np.zeros((20,), np.int32)
    config = TrainConfig(epochs=1, batch_size=8, lr=1e-3, log_every=1,
                         drop_last=False)
    _, _, history = train_diffusion(
        model, params, (images, labels), config, mesh=mesh
    )
    assert np.isfinite(history).all()
    # a batch size that cannot shard over the mesh fails fast and clearly
    with pytest.raises(ValueError, match="divide"):
        train_diffusion(
            model, params, (images, labels),
            TrainConfig(epochs=1, batch_size=10), mesh=mesh,
        )


def test_dataset_smaller_than_batch_errors(tiny_model):
    model, params = tiny_model
    rs = np.random.RandomState(0)
    images = rs.normal(size=(4, 8, 8, 1)).astype(np.float32)
    labels = np.zeros((4,), np.int32)
    with pytest.raises(ValueError, match="smaller than batch_size"):
        train_diffusion(
            model, params, (images, labels),
            TrainConfig(epochs=1, batch_size=128),
        )


def test_multi_axis_mesh_factoring():
    m = make_mesh(8, ("data", "model"))
    assert dict(m.shape) == {"data": 4, "model": 2}
    m = make_mesh(8, ("data", "model", "pipe"))
    assert dict(m.shape) == {"data": 2, "model": 2, "pipe": 2}
    m = make_mesh(7, ("data", "model"))  # prime degrades, never errors
    assert dict(m.shape) == {"data": 7, "model": 1}
