"""BatchNorm UNet parity and training support (VERDICT round-1 item 5).

Goldens (unet_batchnorm.npz) record the reference BatchNorm UNet
(src/models.py:306-309,232-237) through 3 train-mode forwards (running-stat
updates) and an eval forward. Checks: train-mode outputs, the running
mean/var after training (torch's UNBIASED running update — see
layers.TorchBatchNorm), the eval output through converted stats, and the
end-to-end training loop with mutable batch_stats."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu import convert
from convolutional_diffusion_tpu.models import DiffusionModel, MinimalUNet

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "unet_batchnorm.npz")


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def setup():
    if not os.path.exists(GOLDEN):
        pytest.skip("goldens missing — run tools/make_goldens.py")
    z = np.load(GOLDEN)
    sd = {k[len("sd/"):]: z[k] for k in z.files if k.startswith("sd/")}
    net = MinimalUNet(
        channels=3, fsizes=(8, 16), emb_dim=16, kernel_size=3, lastksize=1,
        mode="zeros", normalization="BatchNorm", last_norm=True,
    )
    variables = convert.unet_variables_from_torch(
        sd, n_feature_blocks=1, conditional=False, last_norm=True
    )
    return z, sd, net, variables


def test_variables_carry_running_stats(setup):
    z, sd, net, variables = setup
    assert "batch_stats" in variables
    got = variables["batch_stats"]["feature_block_0"]["norm_0"]
    np.testing.assert_array_equal(
        got["mean"], sd["feature_blocks.0.model.1.running_mean"]
    )
    np.testing.assert_array_equal(
        got["var"], sd["feature_blocks.0.model.1.running_var"]
    )
    assert "last_normalizer" in variables["batch_stats"]


def test_params_only_api_refuses_batchnorm(setup):
    z, sd, net, variables = setup
    with pytest.raises(ValueError, match="BatchNorm"):
        convert.unet_params_from_torch(
            sd, n_feature_blocks=1, conditional=False, last_norm=True
        )


def test_eval_forward_parity(setup):
    z, sd, net, variables = setup
    t = jnp.asarray(z["t"])
    x = jnp.asarray(nhwc(z["x_eval"]))
    out = net.apply(variables, t, x)
    expect = nhwc(z["out_eval"])
    atol = 5e-5 * max(np.abs(expect).max(), 1.0)
    np.testing.assert_allclose(np.asarray(out), expect, atol=atol)


def test_train_mode_outputs_and_running_stat_updates(setup):
    # replay the reference's 3 train-mode forwards from FRESH stats: outputs
    # must match per step, and the accumulated running mean/var must land on
    # the recorded post-training state_dict values (unbiased-update parity)
    z, sd, net, variables = setup
    fresh = net.init(jax.random.PRNGKey(0), jnp.asarray(z["t"]),
                     jnp.asarray(nhwc(z["x0"])))
    vars_now = {"params": variables["params"], "batch_stats": fresh["batch_stats"]}
    t = jnp.asarray(z["t"])
    for i in range(3):
        x = jnp.asarray(nhwc(z[f"x{i}"]))
        out, updated = net.apply(
            vars_now, t, x, train=True, mutable=["batch_stats"]
        )
        vars_now = {"params": vars_now["params"], **updated}
        expect = nhwc(z[f"train_out{i}"])
        atol = 5e-5 * max(np.abs(expect).max(), 1.0)
        np.testing.assert_allclose(
            np.asarray(out), expect, atol=atol, err_msg=f"train_out{i}"
        )
    got = vars_now["batch_stats"]["feature_block_0"]["norm_0"]
    np.testing.assert_allclose(
        np.asarray(got["mean"]),
        sd["feature_blocks.0.model.1.running_mean"], rtol=2e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(got["var"]),
        sd["feature_blocks.0.model.1.running_var"], rtol=2e-5, atol=1e-6,
    )


def test_training_loop_with_batchnorm(setup):
    from convolutional_diffusion_tpu.training import TrainConfig, train_diffusion

    z, sd, net, variables = setup
    model = DiffusionModel(net, in_channels=3, default_imsize=16)
    init_vars = model.init_variables(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    images = rs.uniform(-1, 1, (16, 16, 16, 3)).astype(np.float32)
    labels = np.zeros((16,), np.int32)
    out_vars, _, history = train_diffusion(
        model, init_vars, (images, labels),
        TrainConfig(epochs=2, batch_size=8, max_t=10, log_every=1),
        log_fn=lambda s: None,
    )
    assert "batch_stats" in out_vars and np.isfinite(history[-1])
    before = init_vars["batch_stats"]["feature_block_0"]["norm_0"]["mean"]
    after = out_vars["batch_stats"]["feature_block_0"]["norm_0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # and the trained variables sample through the standard path
    from convolutional_diffusion_tpu import sampling

    s = sampling.sample(
        model, out_vars, batch_size=2, nsteps=3, key=jax.random.PRNGKey(1)
    )
    assert np.isfinite(np.asarray(s)).all()
