"""Whole-pickle checkpoint ingestion: reference backbone_*.pt files load via
stub classes (no reference code imported) and reproduce torch forwards."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu import convert

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
PICKLES = os.path.join(GOLDEN_DIR, "pickles")


@pytest.fixture(scope="module")
def z():
    path = os.path.join(GOLDEN_DIR, "pickle_forward.npz")
    if not os.path.exists(path):
        pytest.skip("goldens missing — run tools/make_goldens.py")
    return np.load(path)


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_resnet_pickle_roundtrip(z):
    model, params = convert.diffusion_model_from_torch_pickle(
        os.path.join(PICKLES, "backbone_resnet_cond.pt")
    )
    assert model.backbone.conditional and model.backbone.num_classes == 10
    assert model.backbone.mode == "zeros"
    assert model.in_channels == 3 and model.default_imsize == 16
    out = model.apply(
        params, jnp.asarray(z["t"]), jnp.asarray(nhwc(z["x"])), jnp.asarray(z["label"])
    )
    np.testing.assert_allclose(
        np.asarray(out), nhwc(z["resnet_out"]), atol=5e-5, rtol=2e-4
    )


def test_unet_pickle_roundtrip(z):
    model, params = convert.diffusion_model_from_torch_pickle(
        os.path.join(PICKLES, "backbone_unet.pt")
    )
    assert model.backbone.normalization == "GroupNorm"
    assert model.backbone.last_norm
    assert model.backbone.mode == "zeros"
    out = model.apply(params, jnp.asarray(z["t"]), jnp.asarray(nhwc(z["x"])), None)
    np.testing.assert_allclose(
        np.asarray(out), nhwc(z["unet_out"]), atol=5e-5, rtol=2e-4
    )


def test_load_scales_from_reference_artifacts():
    ref = "/root/reference/checkpoints/scales_CIFAR10_ResNet_zeros_conditional.pt"
    if not os.path.exists(ref):
        pytest.skip("reference checkpoints not mounted")
    scales = convert.load_scales(ref)
    assert scales == [3, 3, 3, 3, 5, 5, 5, 7, 7, 7, 7, 9, 9, 11, 11, 13, 15, 17, 17, 17]
    assert all(isinstance(s, int) for s in scales)
