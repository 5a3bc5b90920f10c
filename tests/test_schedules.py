"""Noise schedule unit tests, incl. golden parity vs the torch reference
formulas (values checked against /root/reference/src/utils/noise_schedules.py
semantics computed with torch in float32)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from convolutional_diffusion_tpu import schedules


TS = np.linspace(0.0, 1.0, 21).astype(np.float32)


def torch_cosine(t, mode="legacy"):
    import math

    t = torch.as_tensor(t)
    if mode == "legacy":
        return 1 - torch.cos(t / 1.008 * math.pi / 2) ** 2
    return 1 - torch.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2


def test_cosine_legacy_matches_torch():
    ours = np.asarray(schedules.cosine_noise_schedule(jnp.asarray(TS)))
    ref = torch_cosine(TS).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cosine_offset_mode():
    ours = np.asarray(schedules.cosine_noise_schedule(jnp.asarray(TS), mode="offset"))
    ref = torch_cosine(TS, mode="offset").numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_exponential_matches_torch():
    ours = np.asarray(schedules.exponential_schedule(jnp.asarray(TS)))
    ref = (1 - torch.exp(-2 * torch.as_tensor(TS))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_linear():
    ours = np.asarray(schedules.linear_noise_schedule(jnp.asarray(TS)))
    np.testing.assert_allclose(ours, 0.01 + 0.97 * TS, atol=1e-7)


def test_cosine_legacy_boundary_and_monotone():
    # legacy has NO offset: beta(0) == 0 exactly
    assert float(schedules.cosine_noise_schedule(jnp.asarray(0.0))) == 0.0
    vals = np.asarray(schedules.cosine_noise_schedule(jnp.asarray(TS)))
    assert np.all(np.diff(vals) > 0)
    assert np.all(vals >= 0) and np.all(vals <= 1)


def test_registry():
    assert schedules.get_schedule("cosine") is schedules.cosine_noise_schedule
    with pytest.raises(ValueError):
        schedules.get_schedule("nope")
