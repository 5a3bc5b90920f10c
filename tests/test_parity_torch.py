"""Numeric parity vs the torch reference: forward passes and samplers must
match recorded goldens (produced by tools/make_goldens.py running
/root/reference) after weight conversion. Target: <1e-3 max deviation
(BASELINE.md); we assert much tighter for single forwards."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu import convert, sampling
from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet, MinimalUNet

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load_golden(name):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run tools/make_goldens.py")
    return np.load(path)

def group(z, prefix):
    """Extract arrays under 'prefix/' with the prefix stripped."""
    p = prefix + "/"
    return {k[len(p):]: z[k] for k in z.files if k.startswith(p)}


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


RESNET_CFGS = {
    "zeros_plain": dict(mode="zeros", normalization=None, conditional=False),
    "circular_plain": dict(mode="circular", normalization=None, conditional=False),
    "zeros_norm_cond": dict(
        mode="zeros", normalization="GroupNorm", conditional=True, num_classes=10
    ),
    "zeros_noaddone": dict(
        mode="zeros", normalization=None, conditional=False, add_one=False
    ),
}


@pytest.mark.parametrize("cfg_name", sorted(RESNET_CFGS))
def test_resnet_forward_parity(cfg_name):
    z = load_golden("resnet_forward")
    cfg = RESNET_CFGS[cfg_name]
    sd = group(z, f"{cfg_name}/sd")
    net = MinimalResNet(
        channels=3, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3, **cfg
    )
    params = convert.resnet_params_from_torch(
        sd,
        num_layers=2,
        normalization=cfg["normalization"],
        add_one=cfg.get("add_one", True),
        conditional=cfg["conditional"],
    )
    x = jnp.asarray(nhwc(z["x"]))
    t = jnp.asarray(z["t"])
    label = jnp.asarray(z["label"]) if cfg["conditional"] else None
    out = net.apply({"params": params}, t, x, label)
    expect = nhwc(z[f"{cfg_name}/out"])
    np.testing.assert_allclose(np.asarray(out), expect, atol=5e-5, rtol=2e-4)


UNET_CFGS = {
    "zeros_plain": dict(mode="zeros", normalization=None, conditional=False),
    "circular_plain": dict(mode="circular", normalization=None, conditional=False),
    "zeros_norm_cond": dict(
        mode="zeros",
        normalization="GroupNorm",
        conditional=True,
        num_classes=10,
        last_norm=True,
    ),
}


@pytest.mark.parametrize("cfg_name", sorted(UNET_CFGS))
def test_unet_forward_parity(cfg_name):
    z = load_golden("unet_forward")
    cfg = UNET_CFGS[cfg_name]
    sd = group(z, f"{cfg_name}/sd")
    net = MinimalUNet(
        channels=3, fsizes=(8, 16, 32), emb_dim=16, kernel_size=3, lastksize=1, **cfg
    )
    params = convert.unet_params_from_torch(
        sd,
        n_feature_blocks=2,
        conditional=cfg["conditional"],
        last_norm=cfg.get("last_norm", False),
    )
    x = jnp.asarray(nhwc(z["x"]))
    t = jnp.asarray(z["t"])
    label = jnp.asarray(z["label"]) if cfg["conditional"] else None
    out = net.apply({"params": params}, t, x, label)
    expect = nhwc(z[f"{cfg_name}/out"])
    np.testing.assert_allclose(np.asarray(out), expect, atol=5e-5, rtol=2e-4)


class TestSamplerParity:
    @pytest.fixture(scope="class")
    def setup(self):
        z = load_golden("sample")
        sd = group(z, "sd")
        net = MinimalResNet(
            channels=3, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3,
            mode="zeros",
        )
        params = convert.resnet_params_from_torch(
            sd, num_layers=2, normalization=None, conditional=False
        )
        model = DiffusionModel(net, in_channels=3, default_imsize=16)
        return z, model, params

    def test_ddim(self, setup):
        z, model, params = setup
        out = sampling.sample(
            model, params, x=jnp.asarray(nhwc(z["x0"])), nsteps=5
        )
        # untrained-net outputs reach ~1e2; scale-aware tolerance keeps the
        # effective bound ~50x tighter than the 1e-3-on-[-1,1] parity target
        expect = nhwc(z["out_ddim"])
        atol = 2e-5 * np.abs(expect).max()
        np.testing.assert_allclose(np.asarray(out), expect, atol=atol)

    def test_breakstep(self, setup):
        z, model, params = setup
        out = sampling.sample(
            model, params, x=jnp.asarray(nhwc(z["x0"])), nsteps=5, breakstep=3
        )
        expect = nhwc(z["out_break"])
        atol = 2e-5 * np.abs(expect).max()
        np.testing.assert_allclose(np.asarray(out), expect, atol=atol)

    def test_ddpm_deterministic_part(self, setup):
        z, model, params = setup
        # golden recorded with randn_like zeroed; feed zero noise by keying
        # the sampler but replacing the noise via a wrapper
        import convolutional_diffusion_tpu.sampling as S

        x = jnp.asarray(nhwc(z["x0"]))
        b = x.shape[0]
        nsteps = 5
        for i in range(nsteps, 0, -1):
            t = jnp.full((b,), i / nsteps)
            beta_t = model.noise_schedule(t)
            beta_prev = model.noise_schedule(t - 1 / nsteps)
            eps = model.apply(params, t, x, None)
            x = S.ddpm_step(x, eps, beta_t, beta_prev, jnp.zeros_like(x))
        expect = nhwc(z["out_ddpm0"])
        atol = 2e-5 * max(np.abs(expect).max(), 1.0)
        np.testing.assert_allclose(np.asarray(x), expect, atol=atol)


@pytest.mark.parametrize("k", [2, 3, 4, 5])
@pytest.mark.parametrize("mode", ["zeros", "circular"])
def test_padded_conv_same_matches_torch_even_and_odd_k(k, mode):
    """torch 'same' pads k-1 total, floor-left/ceil-right — asymmetric for
    EVEN kernels (regression: a symmetric 2*(k//2) pad grew even-k outputs
    by one pixel)."""
    import flax
    import torch
    import torch.nn as tnn

    from convolutional_diffusion_tpu.models.layers import PaddedConv

    rs = np.random.RandomState(0)
    x = rs.normal(size=(2, 8, 8, 3)).astype(np.float32)
    tconv = tnn.Conv2d(3, 4, k, padding="same", padding_mode=mode)
    w = tconv.weight.detach().numpy()
    b = tconv.bias.detach().numpy()
    m = PaddedConv(features=4, kernel_size=k, mode=mode)
    init = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    flat = flax.traverse_util.flatten_dict(init)
    for path in list(flat):
        if path[-1] == "kernel":
            flat[path] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        elif path[-1] == "bias":
            flat[path] = jnp.asarray(b)
    params = flax.traverse_util.unflatten_dict(flat)
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    theirs = np.transpose(
        tconv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy(),
        (0, 2, 3, 1),
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
