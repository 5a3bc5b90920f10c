"""Training with the native C++ loader produces finite decreasing loss."""

import jax
import numpy as np
import pytest

from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
from convolutional_diffusion_tpu.training import TrainConfig, train_diffusion
from convolutional_diffusion_tpu.utils import native_loader


@pytest.mark.skipif(
    not native_loader.is_available(), reason="native loader not buildable"
)
def test_train_with_native_loader(tiny_dataset):
    images, labels = tiny_dataset
    net = MinimalResNet(channels=1, emb_dim=16, num_layers=1, mode="zeros")
    model = DiffusionModel(net, in_channels=1, default_imsize=8)
    params = model.init(jax.random.PRNGKey(0))
    config = TrainConfig(epochs=15, batch_size=8, lr=3e-3, log_every=1)
    _, _, history = train_diffusion(
        model, params, (images, labels), config,
        use_native_loader=True, log_fn=lambda s: None,
    )
    assert np.isfinite(history).all()
    assert history[-1] < history[0]
