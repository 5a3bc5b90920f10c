"""Native C++ data-loader tests: build, IDX/CIFAR parsing, normalization,
shuffling determinism, prefetch liveness."""

import gzip
import os
import struct
import subprocess

import numpy as np
import pytest

from convolutional_diffusion_tpu.utils import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="native loader not buildable"
)


def test_memory_loader_normalization_and_shuffle():
    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, size=(40, 8, 8, 3), dtype=np.uint8)
    labels = np.arange(40, dtype=np.int32)
    ld = native_loader.NativeLoader.from_arrays(
        images, labels, batch_size=16, seed=7
    )
    assert ld.num_samples == 40 and ld.shape == (8, 8, 3)
    xb, yb = ld.next()
    assert xb.shape == (16, 8, 8, 3) and yb.shape == (16,)
    # normalization: x = (u8/255 - 0.5)/0.5, checked against labels as index
    for j in range(16):
        expect = (images[yb[j]].astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(xb[j], expect, atol=1e-6)
    # one epoch covers distinct samples (shuffled without replacement):
    seen = list(yb)
    xb2, yb2 = ld.next()
    seen += list(yb2)
    assert len(set(seen)) == 32
    ld.close()


def test_seed_determinism():
    rs = np.random.RandomState(1)
    images = rs.randint(0, 256, size=(32, 4, 4, 1), dtype=np.uint8)
    labels = np.arange(32, dtype=np.int32)
    a = native_loader.NativeLoader.from_arrays(images, labels, batch_size=8, seed=5)
    b = native_loader.NativeLoader.from_arrays(images, labels, batch_size=8, seed=5)
    c = native_loader.NativeLoader.from_arrays(images, labels, batch_size=8, seed=6)
    ya = np.concatenate([a.next()[1] for _ in range(4)])
    yb = np.concatenate([b.next()[1] for _ in range(4)])
    yc = np.concatenate([c.next()[1] for _ in range(4)])
    np.testing.assert_array_equal(ya, yb)
    assert not np.array_equal(ya, yc)
    for ld in (a, b, c):
        ld.close()


def test_idx_files(tmp_path):
    rs = np.random.RandomState(2)
    images = rs.randint(0, 256, size=(10, 6, 6), dtype=np.uint8)
    labels = rs.randint(0, 10, size=(10,), dtype=np.uint8)
    img_path = tmp_path / "train-images-idx3-ubyte"
    lab_path = tmp_path / "train-labels-idx1-ubyte"
    with open(img_path, "wb") as f:
        f.write(struct.pack(">IIII", 0x803, 10, 6, 6))
        f.write(images.tobytes())
    with open(lab_path, "wb") as f:
        f.write(struct.pack(">II", 0x801, 10))
        f.write(labels.tobytes())
    ld = native_loader.NativeLoader.from_idx(
        str(img_path), str(lab_path), batch_size=10, seed=0
    )
    assert ld.num_samples == 10 and ld.shape == (6, 6, 1)
    xb, yb = ld.next()
    assert sorted(yb) == sorted(labels.astype(np.int32))
    ld.close()


def test_cifar_bin(tmp_path):
    rs = np.random.RandomState(3)
    n = 7
    recs = bytearray()
    chw = rs.randint(0, 256, size=(n, 3, 32, 32), dtype=np.uint8)
    labs = rs.permutation(10)[:n].astype(np.uint8)  # unique labels
    for i in range(n):
        recs.append(labs[i])
        recs.extend(chw[i].tobytes())
    p = tmp_path / "data_batch_1.bin"
    p.write_bytes(bytes(recs))
    ld = native_loader.NativeLoader.from_cifar_bins(
        [str(p)], batch_size=7, seed=0
    )
    assert ld.num_samples == 7 and ld.shape == (32, 32, 3)
    xb, yb = ld.next()
    # find each label's record and check HWC conversion
    order = {int(l): i for i, l in enumerate(labs)}
    for j in range(7):
        src = chw[order[int(yb[j])]]
        expect = (src.transpose(1, 2, 0).astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(xb[j], expect, atol=1e-6)
    ld.close()


def test_bad_path_raises():
    with pytest.raises(RuntimeError):
        native_loader.NativeLoader.from_idx("/nope/img", "/nope/lab", batch_size=4)
