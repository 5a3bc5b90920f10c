"""Dataset-sharded analytic score machines over a device mesh.

The reference streams the entire training set SEQUENTIALLY through one GPU
per score evaluation (idealscore.py:430). Here the patch bank is sharded over
the mesh 'data' axis: every device sweeps only its shard through the online
softmax (the same `els_sweep` as single-device), and the partial
(max, s1, s2) states merge over ICI with

    m_g  = pmax(m),  s1_g = psum(s1 * e^{m - m_g}),  s2_g = psum(s2 * e^{m - m_g})

which is exactly `scores.common.merge_states` expressed with collectives —
mathematically identical to the sequential stream (the subtraction cancels in
s2/s1), so sharded and single-device scores agree to fp rounding.

This is the TPU-native counterpart of "sequence parallelism" for this
workload (SURVEY §5): the scale axis is the training-patch bank, and the
merge is associative, so it parallelizes over chips with one pmax + two
psums per score evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..scores.bbels import LocalEquivBordersScoreModule
from ..scores.els import LocalEquivScoreModule
from ..scores.ideal import IdealScoreModule
from ..scores.local import LocalScoreModule


def merge_collective(m, s1, s2, axis_name: str):
    """Cross-device streaming-softmax merge (see module docstring)."""
    m_g = jax.lax.pmax(m, axis_name)
    m_safe = jnp.where(jnp.isneginf(m_g), 0.0, m_g)
    scale = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_safe))
    s1_g = jax.lax.psum(s1 * scale, axis_name)
    s2_g = jax.lax.psum(s2 * scale[..., None], axis_name)
    return m_g, s1_g, s2_g


class ShardedLocalEquivScoreModule(LocalEquivScoreModule):
    """ELS with the training set sharded over a mesh 'data' axis.

    Semantics identical to LocalEquivScoreModule (same weights, same
    max_samples/label rules — weights are computed globally, then sharded
    with the images).
    """

    # the sharded sweep computes one global weight vector per call — per-seed
    # vector labels are a single-device bank-mode capability (els.py); the
    # pipeline falls back to unique-label grouping here
    supports_vector_label = False

    def __init__(self, dataset, *, mesh: Mesh, axis: str = "data", **kw):
        self.mesh = mesh
        self.axis = axis
        super().__init__(dataset, **kw)

    def __call__(self, t, x, label=None, device=None, k=None, order=None):
        if label is not None and getattr(jnp.asarray(label), "ndim", 0) == 1:
            raise ValueError(
                "sharded ELS takes a scalar label per call; the pipeline "
                "groups seeds by label (supports_vector_label is False)"
            )
        # bypass the single-device bank-mode fast path; the sharded sweep
        # extracts per-shard banks inside shard_map
        from ..scores.base import ScoreModuleBase

        return ScoreModuleBase.__call__(self, t, x, label=label, k=k, order=order)

    # _build inherits from LocalEquivScoreModule, which is mesh-aware:
    # it shards the dataset over self.mesh/self.axis and merges partial
    # softmax states with merge_collective (same pattern as bbELS below).


class ShardedLocalEquivBordersScoreModule(LocalEquivBordersScoreModule):
    """bbELS with the training set sharded over a mesh 'data' axis: every
    region's partial softmax state (center, 4 edge-row/col families, 4
    corner families) merges across devices with the same pmax/psum combine.
    Semantics identical to LocalEquivBordersScoreModule."""

    def __init__(self, dataset, *, mesh: Mesh, axis: str = "data", **kw):
        self.mesh = mesh
        self.axis = axis
        super().__init__(dataset, **kw)

    def _center_bank(self, k: int):
        # the precomputed-bank fast path is single-device; the sharded sweep
        # extracts per-shard banks inside shard_map
        return None


class ShardedIdealScoreModule(IdealScoreModule):
    """IS with the training set sharded over a mesh 'data' axis: each device
    sweeps its image shard through the whole-image online softmax, then the
    per-seed states merge with the same pmax/psum combine. Semantics
    identical to IdealScoreModule (weights computed globally, FILTERED
    cutoff)."""

    def __init__(self, dataset, *, mesh: Mesh, axis: str = "data", **kw):
        self.mesh = mesh
        self.axis = axis
        super().__init__(dataset, **kw)


class ShardedLocalScoreModule(LocalScoreModule):
    """LS with the training set sharded over a mesh 'data' axis: each device
    box-filters and sweeps its image shard, then the per-pixel states merge
    with pmax/psum. Semantics identical to LocalScoreModule (incl. its
    shuffle=True default — the permutation is resolved globally before
    sharding)."""

    def __init__(self, dataset, *, mesh: Mesh, axis: str = "data", **kw):
        self.mesh = mesh
        self.axis = axis
        super().__init__(dataset, **kw)


def shard_dataset(images, labels, mesh: Mesh, axis: str = "data"):
    """Place dataset arrays sharded over the mesh axis (for HBM capacity:
    each device holds only its shard of the training set)."""
    spec_img = NamedSharding(mesh, P(axis, None, None, None))
    spec_lab = NamedSharding(mesh, P(axis))
    return jax.device_put(images, spec_img), jax.device_put(labels, spec_lab)
