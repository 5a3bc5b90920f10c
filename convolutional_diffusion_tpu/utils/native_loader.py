"""ctypes binding for the native C++ data loader (native/loader.cpp).

Provides shuffled, normalized, prefetched host batches without Python in the
per-batch path. Auto-builds the shared library with `make -C native` on first
use when a compiler is available; callers should treat `is_available()` as a
feature gate and fall back to the numpy path (training.train_diffusion does
its own gather when no loader is passed).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcdtpu_loader.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise RuntimeError(f"could not build native loader: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cdtpu_loader_open_idx.restype = ctypes.c_void_p
    lib.cdtpu_loader_open_idx.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int,
    ]
    lib.cdtpu_loader_open_cifar.restype = ctypes.c_void_p
    lib.cdtpu_loader_open_cifar.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.cdtpu_loader_open_memory.restype = ctypes.c_void_p
    lib.cdtpu_loader_open_memory.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.cdtpu_loader_num_samples.restype = ctypes.c_int64
    lib.cdtpu_loader_num_samples.argtypes = [ctypes.c_void_p]
    lib.cdtpu_loader_shape.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.cdtpu_loader_next.restype = ctypes.c_int
    lib.cdtpu_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.cdtpu_loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def is_available() -> bool:
    try:
        _load_lib()
        return True
    except (RuntimeError, OSError):
        # OSError: ctypes.CDLL on a corrupt/truncated/wrong-arch .so — the
        # feature gate must fall back silently, not crash the trainer
        return False


class NativeLoader:
    """Prefetched shuffled batch iterator backed by the C++ runtime."""

    def __init__(self, handle, batch_size: int, drop_last: bool = True):
        if not handle:
            raise RuntimeError("native loader failed to open dataset")
        self._h = handle
        self._lib = _load_lib()
        self.batch_size = batch_size
        hh, ww, cc = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        self._lib.cdtpu_loader_shape(self._h, hh, ww, cc)
        self.shape = (hh.value, ww.value, cc.value)
        self.num_samples = int(self._lib.cdtpu_loader_num_samples(self._h))
        if drop_last and self.num_samples < batch_size:
            # the C++ loop would otherwise serve short batches forever,
            # violating drop_last's fixed-shape contract for jitted consumers
            self._lib.cdtpu_loader_close(self._h)
            self._h = None
            raise ValueError(
                f"dataset of {self.num_samples} samples is smaller than "
                f"batch_size={batch_size} with drop_last=True"
            )

    @classmethod
    def from_idx(cls, images_path: str, labels_path: str, *, batch_size: int = 128,
                 seed: int = 0, drop_last: bool = True) -> "NativeLoader":
        lib = _load_lib()
        h = lib.cdtpu_loader_open_idx(
            images_path.encode(), labels_path.encode(), batch_size, seed,
            int(drop_last),
        )
        return cls(h, batch_size, drop_last)

    @classmethod
    def from_cifar_bins(cls, paths, *, batch_size: int = 128, seed: int = 0,
                        drop_last: bool = True) -> "NativeLoader":
        lib = _load_lib()
        joined = ";".join(paths).encode()
        h = lib.cdtpu_loader_open_cifar(joined, batch_size, seed, int(drop_last))
        return cls(h, batch_size, drop_last)

    @classmethod
    def from_arrays(cls, images_u8: np.ndarray, labels: np.ndarray, *,
                    batch_size: int = 128, seed: int = 0,
                    drop_last: bool = True) -> "NativeLoader":
        """images_u8: [n, h, w, c] uint8 (raw pixels, NOT normalized)."""
        lib = _load_lib()
        images_u8 = np.ascontiguousarray(images_u8, np.uint8)
        labels = np.ascontiguousarray(labels, np.int32)
        n, h, w, c = images_u8.shape
        handle = lib.cdtpu_loader_open_memory(
            images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, h, w, c, batch_size, seed, int(drop_last),
        )
        return cls(handle, batch_size, drop_last)

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        """Next prefetched batch: float32 [b, h, w, c] in [-1, 1], int32 [b]."""
        h, w, c = self.shape
        images = np.empty((self.batch_size, h, w, c), np.float32)
        labels = np.empty((self.batch_size,), np.int32)
        got = self._lib.cdtpu_loader_next(
            self._h,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return images[:got], labels[:got]

    def close(self):
        if self._h:
            self._lib.cdtpu_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
