"""Dataset registry and loading (TPU-native: whole datasets as device arrays).

Counterpart of the reference `src/utils/data.py` (get_dataset/get_metadata).
Differences by design:
 - No torchvision dependency and no network access: MNIST / FashionMNIST /
   CIFAR10 are parsed from their standard raw binary files if present under
   `root`; CelebA from an image directory (PIL). A deterministic `synthetic`
   dataset family backs tests and benchmarks.
 - Datasets are returned as a single `ArrayDataset` (NHWC float32 in [-1, 1],
   int32 labels) — on TPU the analytic score machines stream the whole
   training set from HBM, so there is no per-batch host loader in the hot
   path (the reference's DataLoader loop, idealscore.py:430, becomes a
   `lax.scan` over device-resident chunks).

Normalization matches the reference exactly: ToTensor (x/255) then
Normalize(mean=0.5, std=0.5) per channel => pixels in [-1, 1]
(`/root/reference/src/utils/data.py:15-19`). Resize-to-32 for MNIST-family
uses bilinear interpolation like torchvision's default.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
import tarfile
from typing import NamedTuple, Optional

import numpy as np

__all__ = ["ArrayDataset", "get_metadata", "get_dataset", "synthetic_dataset"]


class ArrayDataset(NamedTuple):
    images: np.ndarray  # [N, h, w, c] float32 in [-1, 1]
    labels: np.ndarray  # [N] int32

    @property
    def num_samples(self) -> int:
        return self.images.shape[0]


# Metadata table mirrors reference get_metadata (src/utils/data.py:59-122)
# value-for-value, including its CIFAR10 train_images=60000 quirk (actual
# train split is 50000; the field is unused downstream — kept for drop-in
# compatibility).
_METADATA = {
    "mnist": dict(
        name="mnist", image_size=32, num_classes=10, num_channels=1,
        train_images=60000, val_images=10000, mean=[0.5], std=[0.5],
    ),
    "fashion_mnist": dict(
        name="fashion_mnist", image_size=32, num_classes=10, num_channels=1,
        train_images=60000, val_images=10000, mean=[0.5], std=[0.5],
    ),
    "cifar10": dict(
        name="cifar10", image_size=32, num_classes=10, num_channels=3,
        train_images=60000, val_images=10000, mean=[0.5, 0.5, 0.5],
        std=[0.5, 0.5, 0.5],
    ),
    "celeba": dict(
        name="celeba", image_size=32, num_classes=1, num_channels=3,
        train_images=200000, val_images=0, mean=[0.5, 0.5, 0.5],
        std=[0.5, 0.5, 0.5],
    ),
}
_METADATA["fashionmnist"] = _METADATA["fashion_mnist"]


def get_metadata(name: str) -> dict:
    """Per-dataset metadata; unknown names get a default (reference
    src/utils/data.py:110-120)."""
    name = name.lower()
    if name in _METADATA:
        return dict(_METADATA[name])
    return dict(
        name=name, image_size=32, num_classes=1, num_channels=3,
        train_images=0, val_images=0, mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5],
    )


def _resize_bilinear(x: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize [N,h,w,c] -> [N,size,size,c], pinned to the host CPU
    backend when one is registered — on the default (possibly remote-TPU)
    backend a 60k-image resize pays the slow device->host readback for a
    trivially host-sized computation."""
    import contextlib

    import jax

    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # cpu platform not registered (platform pinned)
        ctx = contextlib.nullcontext()
    with ctx:
        return np.asarray(
            jax.image.resize(
                x, (x.shape[0], size, size, x.shape[3]), method="bilinear"
            )
        )


def _normalize(u8: np.ndarray) -> np.ndarray:
    """uint8 [N,h,w,c] -> float32 in [-1,1] (ToTensor + Normalize(0.5, 0.5))."""
    return (u8.astype(np.float32) / 255.0 - 0.5) / 0.5


def _load_idx(path: str) -> np.ndarray:
    """Parse an IDX file (MNIST format), gz or raw."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">HBB", f.read(4))
        _, dtype_code, ndim = magic
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def _find(root: str, candidates) -> Optional[str]:
    for c in candidates:
        p = os.path.join(root, c)
        if os.path.exists(p):
            return p
    return None


def _load_mnist_family(root: str, name: str, train: bool, image_size: int):
    sub = {"mnist": "MNIST", "fashion_mnist": "FashionMNIST"}[name]
    split = "train" if train else "t10k"
    bases = [
        os.path.join(root, sub, "raw"),
        os.path.join(root, sub),
        root,
    ]
    img_path = lab_path = None
    for b in bases:
        img_path = img_path or _find(
            b, [f"{split}-images-idx3-ubyte", f"{split}-images-idx3-ubyte.gz"]
        )
        lab_path = lab_path or _find(
            b, [f"{split}-labels-idx1-ubyte", f"{split}-labels-idx1-ubyte.gz"]
        )
    if img_path is None or lab_path is None:
        raise FileNotFoundError(
            f"{name} raw files not found under {root} (need {split}-images-idx3-ubyte[.gz])"
        )
    imgs = _load_idx(img_path)[:, :, :, None]  # [N,28,28,1]
    labels = _load_idx(lab_path).astype(np.int32)
    x = _normalize(imgs)
    if image_size != imgs.shape[1]:
        x = _resize_bilinear(x, image_size)
    return ArrayDataset(x, labels)


def _load_cifar10(root: str, train: bool, image_size: int):
    # Accept either the extracted cifar-10-batches-py dir or the .tar.gz
    d = os.path.join(root, "cifar-10-batches-py")
    batches = (
        [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    )

    def read_batch(fobj):
        raw = pickle.load(fobj, encoding="bytes")
        data = raw[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return data, np.asarray(raw[b"labels"], np.int32)

    imgs, labs = [], []
    if os.path.isdir(d):
        for b in batches:
            with open(os.path.join(d, b), "rb") as f:
                x, y = read_batch(f)
                imgs.append(x)
                labs.append(y)
    else:
        tar = _find(root, ["cifar-10-python.tar.gz", "cifar-10-python.tar"])
        if tar is None:
            raise FileNotFoundError(f"cifar10 not found under {root}")
        with tarfile.open(tar) as tf:
            for b in batches:
                x, y = read_batch(tf.extractfile(f"cifar-10-batches-py/{b}"))
                imgs.append(x)
                labs.append(y)
    x = _normalize(np.concatenate(imgs))
    if image_size != 32:
        x = _resize_bilinear(x, image_size)
    return ArrayDataset(x, np.concatenate(labs))


def _load_celeba(root: str, train: bool, image_size: int):
    """CelebA from img_align_celeba/ + list_eval_partition.txt (0=train 1=val,
    mirroring the reference's train/valid split choice, data.py:42-52)."""
    from PIL import Image

    img_dir = os.path.join(root, "celeba", "img_align_celeba")
    part_file = os.path.join(root, "celeba", "list_eval_partition.txt")
    if not os.path.isdir(img_dir):
        raise FileNotFoundError(f"celeba images not found at {img_dir}")
    want = 0 if train else 1
    if os.path.exists(part_file):
        with open(part_file) as f:
            names = [
                parts[0]
                for parts in (ln.split() for ln in f)
                if len(parts) >= 2 and int(parts[1]) == want
            ]
    else:
        # no partition file: use every image for BOTH splits (documented
        # degradation — there is no split information to honor), skipping
        # non-image entries (.DS_Store, subdirs, txt files)
        exts = (".jpg", ".jpeg", ".png")
        names = sorted(
            n for n in os.listdir(img_dir)
            if n.lower().endswith(exts)
            and os.path.isfile(os.path.join(img_dir, n))
        )
    out = np.empty((len(names), image_size, image_size, 3), np.float32)
    for i, n in enumerate(names):
        im = Image.open(os.path.join(img_dir, n)).convert("RGB").resize(
            (image_size, image_size), Image.BILINEAR
        )
        out[i] = (np.asarray(im, np.float32) / 255.0 - 0.5) / 0.5
    return ArrayDataset(out, np.zeros((len(names),), np.int32))


def synthetic_dataset(
    num_samples: int = 256,
    image_size: int = 32,
    num_channels: int = 3,
    num_classes: int = 10,
    seed: int = 0,
) -> ArrayDataset:
    """Deterministic procedural dataset (class-dependent Gabor-ish textures)
    for tests and benchmarks — no files, no network."""
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, num_classes, size=(num_samples,)).astype(np.int32)
    yy, xx = np.mgrid[0:image_size, 0:image_size].astype(np.float32) / image_size
    imgs = np.empty((num_samples, image_size, image_size, num_channels), np.float32)
    for i in range(num_samples):
        cls = labels[i]
        phase = rs.uniform(0, 2 * np.pi)
        fx, fy = 1 + cls % 4, 1 + (cls // 4) % 4
        base = np.sin(2 * np.pi * (fx * xx + fy * yy) + phase)
        for ch in range(num_channels):
            noise = rs.normal(0, 0.3, size=base.shape).astype(np.float32)
            imgs[i, :, :, ch] = np.clip(0.7 * base + noise, -1, 1)
    return ArrayDataset(imgs, labels)


def get_dataset(
    name: str,
    root: str = "./data",
    train: bool = True,
    image_size: Optional[int] = None,
    **synthetic_kwargs,
):
    """Load a dataset by name -> (ArrayDataset, metadata dict).

    Mirrors the reference registry (src/utils/data.py:9-56) plus a
    'synthetic' family. Raises FileNotFoundError (never downloads) when raw
    files are absent.
    """
    name = name.lower()
    meta = get_metadata(name if not name.startswith("synthetic") else "cifar10")
    size = image_size or meta["image_size"]
    if name.startswith("synthetic"):
        # the validation split draws from a different seed: train=False must
        # not be bit-identical to the training set
        if "seed" not in synthetic_kwargs and not train:
            synthetic_kwargs = dict(synthetic_kwargs, seed=1)
        ds = synthetic_dataset(image_size=size, **synthetic_kwargs)
        meta = dict(meta, name=name, num_channels=ds.images.shape[-1], image_size=size)
        return ds, meta
    if name in ("mnist", "fashion_mnist"):
        return _load_mnist_family(root, name, train, size), meta
    if name == "cifar10":
        return _load_cifar10(root, train, size), meta
    if name == "celeba":
        return _load_celeba(root, train, size), meta
    raise ValueError(f"unknown dataset {name!r}")
