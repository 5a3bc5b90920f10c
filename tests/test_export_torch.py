"""Inverse export: Flax params -> torch state_dict round-trip.

Reference users can bring checkpoints trained HERE back into the torch
reference (`backbone.load_state_dict(torch.load(path))`). Round-trip
through the forward converter must be exact (pure transposes), including
BatchNorm running statistics."""

import os

import numpy as np
import pytest

from convolutional_diffusion_tpu import convert

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load_sd(name, prefix):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run tools/make_goldens.py")
    z = np.load(path)
    p = prefix + "/"
    return {k[len(p):]: z[k] for k in z.files if k.startswith(p)}


def assert_sd_equal(got, want, ignore=()):
    missing = set(want) - set(got) - set(ignore)
    extra = set(got) - set(want)
    assert not missing, f"missing keys: {sorted(missing)[:6]}"
    assert not extra - {k for k in extra if k.endswith("num_batches_tracked")}, (
        f"unexpected keys: {sorted(extra)[:6]}"
    )
    for k in want:
        if k in ignore:
            continue
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_resnet_roundtrip_exact():
    sd = load_sd("resnet_forward", "zeros_norm_cond/sd")
    params = convert.resnet_params_from_torch(
        sd, num_layers=2, normalization="GroupNorm", conditional=True
    )
    back = convert.resnet_state_dict_from_params(
        params, num_layers=2, normalization="GroupNorm", conditional=True
    )
    assert_sd_equal(back, sd)


def test_resnet_nonorm_roundtrip_exact():
    sd = load_sd("resnet_forward", "zeros_plain/sd")
    params = convert.resnet_params_from_torch(
        sd, num_layers=2, normalization=None, conditional=False
    )
    back = convert.resnet_state_dict_from_params(
        params, num_layers=2, normalization=None, conditional=False
    )
    assert_sd_equal(back, sd)


def test_unet_groupnorm_roundtrip_exact():
    sd = load_sd("unet_forward", "zeros_norm_cond/sd")
    variables = convert.unet_variables_from_torch(
        sd, n_feature_blocks=2, conditional=True, last_norm=True
    )
    back = convert.unet_state_dict_from_params(
        variables, n_feature_blocks=2, normalization="GroupNorm",
        conditional=True, last_norm=True,
    )
    assert_sd_equal(back, sd)


def test_unet_batchnorm_roundtrip_with_running_stats():
    sd = load_sd("unet_batchnorm", "sd")
    variables = convert.unet_variables_from_torch(
        sd, n_feature_blocks=1, conditional=False, last_norm=True
    )
    back = convert.unet_state_dict_from_params(
        variables, n_feature_blocks=1, normalization="BatchNorm",
        conditional=False, last_norm=True,
    )
    # num_batches_tracked is not representable in Flax (torch uses it only
    # for momentum=None configs); exported as 0
    ignore = {k for k in sd if k.endswith("num_batches_tracked")}
    assert_sd_equal(back, sd, ignore=ignore)
    for k in ignore:
        assert int(back[k]) == 0


def test_saved_state_dict_loads_into_torch(tmp_path):
    import torch

    sd = load_sd("unet_forward", "zeros_plain/sd")
    variables = convert.unet_variables_from_torch(
        sd, n_feature_blocks=2, conditional=False, last_norm=False
    )
    back = convert.unet_state_dict_from_params(
        variables, n_feature_blocks=2, normalization=None,
        conditional=False, last_norm=False,
    )
    path = str(tmp_path / "exported.pt")
    convert.save_torch_state_dict(back, path)
    loaded = torch.load(path, weights_only=True)
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k].numpy(), sd[k], err_msg=k)
