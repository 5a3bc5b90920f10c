"""Dataset layer tests: metadata parity with the reference table, raw-binary
parsers (IDX / CIFAR-10 python + tar), normalization, resize, synthetic
determinism."""

import gzip
import os
import pickle
import struct
import tarfile

import numpy as np
import pytest

from convolutional_diffusion_tpu import data


class TestMetadata:
    def test_reference_value_parity(self):
        """Field-for-field against /root/reference/src/utils/data.py:59-122
        (including its quirks)."""
        m = data.get_metadata("mnist")
        assert m["name"] == "mnist" and m["image_size"] == 32
        assert m["num_classes"] == 10 and m["num_channels"] == 1
        assert m["train_images"] == 60000 and m["mean"] == [0.5]

        c = data.get_metadata("CIFAR10")  # case-insensitive
        assert c["train_images"] == 60000  # reference quirk (actual 50k)
        assert c["num_channels"] == 3

        ce = data.get_metadata("celeba")
        assert ce["num_classes"] == 1 and ce["train_images"] == 200000

        fm = data.get_metadata("fashionmnist")  # reference alias
        assert fm["name"] == "fashion_mnist"

        unk = data.get_metadata("something_else")
        assert unk["num_classes"] == 1 and unk["train_images"] == 0
        assert unk["name"] == "something_else"

    def test_synthetic_metadata(self):
        ds, meta = data.get_dataset("synthetic", num_samples=8, num_channels=1)
        assert meta["name"] == "synthetic"
        assert meta["num_channels"] == 1


class TestSynthetic:
    def test_deterministic(self):
        a = data.synthetic_dataset(num_samples=16, seed=3)
        b = data.synthetic_dataset(num_samples=16, seed=3)
        np.testing.assert_array_equal(a.images, b.images)
        c = data.synthetic_dataset(num_samples=16, seed=4)
        assert not np.array_equal(a.images, c.images)

    def test_range_and_shapes(self):
        ds = data.synthetic_dataset(num_samples=10, image_size=16, num_channels=3,
                                    num_classes=4)
        assert ds.images.shape == (10, 16, 16, 3)
        assert ds.images.min() >= -1 and ds.images.max() <= 1
        assert set(np.unique(ds.labels)) <= set(range(4))


class TestMNISTParser:
    def _write_idx(self, tmp_path, gz=False):
        rs = np.random.RandomState(0)
        images = rs.randint(0, 256, size=(6, 28, 28), dtype=np.uint8)
        labels = rs.randint(0, 10, size=(6,), dtype=np.uint8)
        raw = tmp_path / "MNIST" / "raw"
        raw.mkdir(parents=True)
        opener = gzip.open if gz else open
        ext = ".gz" if gz else ""
        with opener(raw / f"train-images-idx3-ubyte{ext}", "wb") as f:
            f.write(struct.pack(">IIII", 0x803, 6, 28, 28))
            f.write(images.tobytes())
        with opener(raw / f"train-labels-idx1-ubyte{ext}", "wb") as f:
            f.write(struct.pack(">II", 0x801, 6))
            f.write(labels.tobytes())
        return images, labels

    @pytest.mark.parametrize("gz", [False, True])
    def test_parse_and_resize(self, tmp_path, gz):
        images, labels = self._write_idx(tmp_path, gz=gz)
        ds, meta = data.get_dataset("mnist", root=str(tmp_path))
        assert ds.images.shape == (6, 32, 32, 1)  # resized to 32
        np.testing.assert_array_equal(ds.labels, labels.astype(np.int32))
        # normalization at native size (no resize): 28
        ds28, _ = data.get_dataset("mnist", root=str(tmp_path), image_size=28)
        expect = (images.astype(np.float32) / 255 - 0.5) / 0.5
        np.testing.assert_allclose(ds28.images[..., 0], expect, atol=1e-6)

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            data.get_dataset("mnist", root=str(tmp_path))


class TestCIFARParser:
    def _batches(self):
        rs = np.random.RandomState(1)
        batches = []
        for i in range(5):
            imgs = rs.randint(0, 256, size=(4, 3072), dtype=np.uint8)
            labs = list(rs.randint(0, 10, size=(4,)))
            batches.append({b"data": imgs, b"labels": labs})
        return batches

    def test_extracted_dir(self, tmp_path):
        d = tmp_path / "cifar-10-batches-py"
        d.mkdir()
        batches = self._batches()
        for i, b in enumerate(batches, 1):
            with open(d / f"data_batch_{i}", "wb") as f:
                pickle.dump(b, f)
        ds, meta = data.get_dataset("cifar10", root=str(tmp_path))
        assert ds.images.shape == (20, 32, 32, 3)
        # CHW -> HWC + normalization on the first record
        chw = batches[0][b"data"][0].reshape(3, 32, 32)
        expect = (chw.transpose(1, 2, 0).astype(np.float32) / 255 - 0.5) / 0.5
        np.testing.assert_allclose(ds.images[0], expect, atol=1e-6)

    def test_tarball(self, tmp_path):
        import io

        batches = self._batches()
        tar_path = tmp_path / "cifar-10-python.tar.gz"
        with tarfile.open(tar_path, "w:gz") as tf:
            for i, b in enumerate(batches, 1):
                blob = pickle.dumps(b)
                info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{i}")
                info.size = len(blob)
                tf.addfile(info, io.BytesIO(blob))
            blob = pickle.dumps(batches[0])
            info = tarfile.TarInfo("cifar-10-batches-py/test_batch")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
        ds, _ = data.get_dataset("cifar10", root=str(tmp_path))
        assert ds.images.shape == (20, 32, 32, 3)
        test_ds, _ = data.get_dataset("cifar10", root=str(tmp_path), train=False)
        assert test_ds.images.shape == (4, 32, 32, 3)


def test_unknown_dataset_raises():
    with pytest.raises(ValueError):
        data.get_dataset("not_a_dataset")
