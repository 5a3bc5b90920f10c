"""Visualization helper tests (denormalize parity with the reference
formula, image-grid output)."""

import os

import numpy as np

from convolutional_diffusion_tpu.utils.visualize import denormalize, save_image_grid


def test_denormalize_matches_reference_formula():
    # reference: image * std + mean per channel (idealscore.py:17-20), NHWC here
    rs = np.random.RandomState(0)
    img = rs.normal(size=(4, 8, 8, 3)).astype(np.float32)
    out = denormalize(img, [0.5, 0.4, 0.3], [0.5, 0.2, 0.1])
    expect = img * np.array([0.5, 0.2, 0.1]) + np.array([0.5, 0.4, 0.3])
    np.testing.assert_allclose(out, expect, atol=1e-6)
    # 3D single image
    out3 = denormalize(img[0], [0.5], [0.5])
    np.testing.assert_allclose(out3, img[0] * 0.5 + 0.5, atol=1e-6)


def test_save_image_grid(tmp_path):
    rs = np.random.RandomState(1)
    imgs = rs.uniform(-1, 1, size=(5, 8, 8, 1)).astype(np.float32)
    path = save_image_grid(imgs, str(tmp_path / "g.png"), ncols=3)
    assert os.path.exists(path) and os.path.getsize(path) > 0
