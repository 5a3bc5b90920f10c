"""Sharded multi-seed sampling + the sample CLI."""

import os

import jax
import numpy as np
import pytest

from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
from convolutional_diffusion_tpu.parallel.mesh import make_mesh
from convolutional_diffusion_tpu.sampling import sample, sample_sharded


@pytest.fixture(scope="module")
def model_and_params():
    net = MinimalResNet(channels=1, emb_dim=16, num_layers=1, mode="zeros")
    model = DiffusionModel(net, in_channels=1, default_imsize=8)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_sharded_matches_single_device(model_and_params):
    model, params = model_and_params
    mesh = make_mesh(8)
    key = jax.random.PRNGKey(3)
    sharded = sample_sharded(
        model, params, mesh, batch_size=16, nsteps=4, key=key
    )
    single = sample(model, params, batch_size=16, nsteps=4, key=key)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=1e-4, atol=1e-5
    )


def test_sharded_batch_divisibility(model_and_params):
    model, params = model_and_params
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        sample_sharded(model, params, mesh, batch_size=9, nsteps=2,
                       key=jax.random.PRNGKey(0))


def test_sample_cli_end_to_end(tmp_path):
    from convolutional_diffusion_tpu.cli import sample as sample_cli
    from convolutional_diffusion_tpu.cli import train

    home = str(tmp_path / "ckpts")
    train.main([
        "--dataset", "synthetic", "--epochs", "1", "--batchsize", "8",
        "--layers", "1", "--mult", "1", "--resnet", "--mode", "zeros",
        "--homedir", home, "--saveinterval", "1", "--suppress",
        "--maxsamps", "32", "--ndevices", "1",
    ])
    model_dir = os.path.join(home, os.listdir(home)[0])
    out_png = str(tmp_path / "grid.png")
    arrays = str(tmp_path / "arrays")
    sample_cli.main([
        "--modelfile", model_dir, "--nsamples", "8", "--nsteps", "3",
        "--out", out_png, "--save_arrays", arrays, "--ndevices", "8",
    ])
    assert os.path.exists(out_png)
    assert len(os.listdir(arrays)) == 8
    a = np.load(os.path.join(arrays, "0000.npy"))
    assert a.shape == (1, 32, 32, 3) and np.abs(a).max() <= 1.0
