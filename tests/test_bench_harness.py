"""The bench harness's machine-construction plumbing (not timing): the
subprocess entry points must build the right machine for each variant row,
including the opt-in 64x64 CelebA_UNet workload (BASELINE.md scales row)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_els_machine_cifar_default():
    m = bench._els_machine("ELS", 32, 16, "high")
    assert m.imsize == 32
    assert list(m.scales) == bench.CIFAR10_SCALES


def test_els_machine_celeba64():
    m = bench._els_machine("ELS", 16, 16, "high", workload="64")
    assert m.imsize == 64
    assert list(m.scales) == bench.CELEBA64_SCALES
    assert max(m.scales) == 27  # the large-d regime rows
    assert m.backbone.images.shape[1:] == (64, 64, 3)


def test_els_machine_mnist():
    # the reference's grayscale workload: MNIST resized to 32x32, c=1
    # (/root/reference/src/utils/data.py:66), MNIST_ResNet_zeros scales
    m = bench._els_machine("ELS", 16, 16, "high", workload="mnist")
    assert m.imsize == 32
    assert m.in_channels == 1
    assert list(m.scales) == bench.MNIST_SCALES
    assert m.backbone.images.shape[1:] == (32, 32, 1)


def test_celeba64_scales_match_baseline_row():
    # BASELINE.md CelebA_UNet_zeros: 20 entries, k in {3,5,7,9,13,19,27}
    s = bench.CELEBA64_SCALES
    assert len(s) == 20
    assert sorted(set(s)) == [3, 5, 7, 9, 13, 19, 27]


def test_mnist_scales_match_baseline_row():
    # BASELINE.md MNIST_ResNet_zeros: 20 entries, k in {3,5,7,9,11,13,15}
    s = bench.MNIST_SCALES
    assert len(s) == 20
    assert sorted(set(s)) == [3, 5, 7, 9, 11, 13, 15]
    assert bench.ELS_WORKLOADS["mnist"][:3] == (32, 1, 60000)


@pytest.mark.parametrize("kind", ["ELS", "bbELS"])
def test_els_machine_kind(kind):
    m = bench._els_machine(kind, 16, 16, "highest")
    name = type(m.backbone).__name__
    assert ("Borders" in name) == (kind == "bbELS")
