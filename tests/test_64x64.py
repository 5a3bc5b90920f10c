"""64x64 configuration tests (the reference's training_script_64x64 path):
UNet with [64,128,256,512][:layers] fsizes at 64x64, end-to-end trainability
and sampling shape, plus machine visualize hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu import sampling
from convolutional_diffusion_tpu.models import DiffusionModel, MinimalUNet
from convolutional_diffusion_tpu.scores import (
    LocalEquivBordersScoreModule,
    ScheduledScoreMachine,
)


def test_unet_64x64_forward_and_sample():
    # scaled-down channel counts, same 4-level topology as the 64x64 recipe
    net = MinimalUNet(
        channels=3, fsizes=(8, 16, 32, 64), emb_dim=16, mode="zeros", lastksize=3
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=64)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    t = jnp.full((1,), 0.5)
    out = model.apply(params, t, x)
    assert out.shape == (1, 64, 64, 3)
    s = sampling.sample(model, params, batch_size=1, nsteps=3,
                        key=jax.random.PRNGKey(2))
    assert s.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(s)).all()


def test_machine_visualize_hook(tiny_dataset):
    images, labels = tiny_dataset
    mod = LocalEquivBordersScoreModule((images, labels), kernel_size=3, batch_size=16)
    machine = ScheduledScoreMachine(mod, in_channels=1, imsize=8,
                                    scales=[3, 3, 3, 3])
    calls = []
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 1))
    machine(x, visualize_fn=lambda i, imputed: calls.append((i, imputed.shape)))
    assert [c[0] for c in calls] == [3, 2, 1]
    assert all(c[1] == (1, 8, 8, 1) for c in calls)
