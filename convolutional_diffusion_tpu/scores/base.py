"""Base class for analytic score modules.

Each module computes the exact Bayes-optimal epsilon/score of the empirical
training distribution under a locality/equivariance restriction, by streaming
the training set through an online softmax (see `scores.common`). Modules are
dataclass-like objects holding the dataset as device arrays; `__call__`
mirrors the reference signature `(t, x, label=None, device=None, k=None)`
minus the device argument (placement is XLA's job).

Conventions:
 - x is NHWC [b, h, w, c]; t is a scalar or [b] with equal entries (the
   reference always passes i/nsteps replicated, idealscore.py:91).
 - label is None or a scalar int (the reference filters the whole batch by
   one label, idealscore.py:602).
 - returns the SCORE field (not epsilon): -(x - a_t * posterior_mean)/beta_t,
   matching the reference modules' `-numerator/denominator/bt**2`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schedules import cosine_noise_schedule


def _as_scalar_t(t) -> jnp.ndarray:
    t = jnp.asarray(t, jnp.float32)
    if t.ndim > 0:
        t = t.reshape(-1)[0]
    return t


class ScoreModuleBase:
    """Holds dataset arrays + config; caches jitted kernels per static key."""

    def __init__(
        self,
        dataset,
        *,
        kernel_size: int = 3,
        batch_size: int = 64,
        image_size: Optional[int] = None,
        channels: Optional[int] = None,
        schedule: Callable = cosine_noise_schedule,
        max_samples: Optional[int] = None,
        chunk_size: Optional[int] = None,
        precision: str = "highest",
        shuffle: bool = False,
        shuffle_key=None,
        **_unused,
    ):
        """precision ladder:
          'highest' — fp32 MXU passes throughout (the <1e-3 torch-parity
            configuration);
          'high' — bf16x3 3-pass dots (~2^-16 relative dot error) with fp32
            elementwise/reductions: ~2x the dot throughput of 'highest' at
            near-parity (the win concentrates at large k where the MXU
            dominates);
          'default' — bf16x3 dots plus bf16 exp elementwise (fast mode),
            ~3e-3 relative error on posterior means.

        shuffle: stream the dataset in a fresh random order on every call,
        mirroring the reference DataLoader's shuffle=True (a new permutation
        per epoch == per __call__; LocalScoreModule always shuffles in the
        reference, idealscore.py:489, and els_script passes --shuffle to the
        others). Keyed by `shuffle_key` (default PRNGKey(0)) folded with a
        per-call counter — deterministic across reruns. Order only affects
        results via batch composition (mean denominators, label/max_samples
        cutoff subsets); see common.image_weights."""
        images, labels = dataset
        if isinstance(images, jax.Array):
            # already on device (e.g. a module sharing another's arrays):
            # keep it — np.asarray would force a D2H + H2D roundtrip
            images = jnp.asarray(images, jnp.float32)
        else:
            images = jnp.asarray(np.asarray(images), jnp.float32)
        if images.ndim != 4:
            raise ValueError("dataset images must be [N, h, w, c] (NHWC)")
        self.images = images
        self.labels = (
            jnp.asarray(labels, jnp.int32)
            if isinstance(labels, jax.Array)
            else jnp.asarray(np.asarray(labels), jnp.int32)
        )
        self.kernel_size = kernel_size
        self.batch_size = batch_size
        self.image_size = image_size or images.shape[1]
        self.channels = channels or images.shape[-1]
        self.schedule = schedule
        self.max_samples = max_samples
        self.precision = precision
        try:
            self.prec = {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,  # bf16x3, ~2^-16 rel error
                "default": jax.lax.Precision.DEFAULT,
            }[precision]
        except KeyError:
            raise ValueError(
                f"precision must be 'highest', 'high' or 'default', got "
                f"{precision!r}"
            ) from None
        # compute-chunk size (images per scan step); reference semantics are
        # keyed to `batch_size`, so weights are computed per reference batch
        # regardless of the compute chunk.
        self.chunk_size = chunk_size or batch_size
        self.shuffle = shuffle
        self._shuffle_key = (
            shuffle_key if shuffle_key is not None else jax.random.PRNGKey(0)
        )
        self._call_index = 0
        self._jit_cache = {}

    def _stream_order(self, order=None):
        """Resolve the per-call stream order: explicit `order` wins; else a
        fresh permutation when self.shuffle; else the identity."""
        n = self.images.shape[0]
        if order is None and self.shuffle:
            key = jax.random.fold_in(self._shuffle_key, self._call_index)
            self._call_index += 1
            order = jax.random.permutation(key, n)
        if order is None:
            order = jnp.arange(n, dtype=jnp.int32)
        return jnp.asarray(order, jnp.int32)

    # -- subclass hooks ------------------------------------------------------
    def _build(self, *, k: int, x_shape, has_label: bool):
        """Return a jitted fn(images, labels, order, x, label, at, bt) -> score."""
        raise NotImplementedError

    # -- public --------------------------------------------------------------
    # whole-image modules (IdealScore) override this to False: they accept
    # any k like the reference's **kwargs forward and share one jit entry
    uses_kernel_size = True

    def __call__(self, t, x, label=None, device=None, k=None, order=None):
        del device  # reference-API compatibility; placement is XLA's concern
        if k is None:
            k = self.kernel_size
        if not self.uses_kernel_size:
            k = 0  # ignored by _build; one jit-cache entry for every k
        else:
            k = int(k)
            if k % 2 == 0 or k < 1:
                raise ValueError(
                    f"kernel size must be odd and positive, got {k} (the k//2 "
                    "window padding assumes a center pixel; the reference's "
                    "calibrated scales are all odd)"
                )
        if label is not None and np.ndim(label) >= 1 and not getattr(
            self, "supports_vector_label", False
        ):
            raise ValueError(
                f"{type(self).__name__} takes a scalar label per call; only "
                "LocalEquivScoreModule evaluates per-seed label vectors in "
                "one sweep — group seeds by label for the other modules"
            )
        x = jnp.asarray(x, jnp.float32)
        t = _as_scalar_t(t)
        beta = self.schedule(t)
        at = jnp.sqrt(1.0 - beta)
        bt = jnp.sqrt(beta)
        has_label = label is not None
        key = (k, x.shape, has_label)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(
                k=k, x_shape=x.shape, has_label=has_label
            )
        lab = jnp.asarray(label if has_label else -1, jnp.int32)
        return self._jit_cache[key](
            self.images, self.labels, self._stream_order(order), x, lab, at, bt
        )
