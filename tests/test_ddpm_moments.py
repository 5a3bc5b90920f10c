"""Statistical validation of the stochastic DDPM sampler (VERDICT round-1
item 8): per-pixel mean/std over 512 seeds must match the torch reference's
recorded moments (goldens/ddpm_moments.npz, src/models.py:57-64). The RNG
streams cannot match draw-for-draw, so the tolerance is statistical:
the mean of n samples fluctuates with sd ~ sigma/sqrt(n)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu import convert, sampling
from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "ddpm_moments.npz")


@pytest.fixture(scope="module")
def setup():
    if not os.path.exists(GOLDEN):
        pytest.skip("goldens missing — run tools/make_goldens.py")
    z = np.load(GOLDEN)
    sd = {k[len("sd/"):]: z[k] for k in z.files if k.startswith("sd/")}
    net = MinimalResNet(
        channels=3, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3,
        mode="zeros",
    )
    params = convert.resnet_params_from_torch(
        sd, num_layers=2, normalization=None, conditional=False
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=16)
    x0 = jnp.asarray(np.transpose(z["x0"], (0, 2, 3, 1)))
    return z, model, params, x0


def check_moments(ours, mean_key, std_key, z, n=512):
    ours = np.asarray(ours)
    mean = ours.mean(axis=0)
    std = ours.std(axis=0, ddof=1)
    exp_mean = np.transpose(z[mean_key], (1, 2, 0))
    exp_std = np.transpose(z[std_key], (1, 2, 0))
    # mean estimator sd ~ sigma/sqrt(n); 6-sigma per-pixel bound (768 pixels)
    tol_mean = 6.0 * exp_std / np.sqrt(n)
    assert np.all(np.abs(mean - exp_mean) < tol_mean + 1e-6), (
        f"{mean_key}: max dev {np.abs(mean - exp_mean).max():.4g} vs "
        f"tol {tol_mean.max():.4g}"
    )
    # std-of-std ~ sigma/sqrt(2(n-1)); 6-sigma bound catches wrong sigma_t
    tol_std = 6.0 * exp_std / np.sqrt(2 * (n - 1))
    assert np.all(np.abs(std - exp_std) < tol_std + 1e-6), (
        f"{std_key}: max dev {np.abs(std - exp_std).max():.4g}"
    )


def test_final_moments(setup):
    z, model, params, x0 = setup
    out = sampling.sample(
        model, params, x=x0, nsteps=5, ddpm=True, key=jax.random.PRNGKey(123)
    )
    check_moments(out, "final_mean", "final_std", z)


def test_breakstep_moments(setup):
    z, model, params, x0 = setup
    out = sampling.sample(
        model, params, x=x0, nsteps=5, ddpm=True, breakstep=3,
        key=jax.random.PRNGKey(321),
    )
    check_moments(out, "mid_mean", "mid_std", z)


def test_distinct_keys_distinct_samples(setup):
    z, model, params, x0 = setup
    a = sampling.sample(
        model, params, x=x0[:4], nsteps=5, ddpm=True, key=jax.random.PRNGKey(1)
    )
    b = sampling.sample(
        model, params, x=x0[:4], nsteps=5, ddpm=True, key=jax.random.PRNGKey(2)
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))
