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

from ..ops.patches import extract_patches, pad_image
from ..scores.common import CutoffRule, Weighting, image_weights
from ..scores.bbels import LocalEquivBordersScoreModule
from ..scores.els import LocalEquivScoreModule, els_sweep


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

    def _build(self, *, k: int, x_shape, has_label: bool):
        batch_size = self.batch_size
        max_samples = self.max_samples
        cs = self._chunk_images(k)
        mesh = self.mesh
        axis = self.axis
        n_dev = mesh.shape[axis]
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        precision = self.precision

        def fn(images, labels, order, x, lab, at, bt):
            n, h, w, c = images.shape
            per_img = (h - k + 1) * (w - k + 1)
            d = k * k * c
            w_img = image_weights(
                labels,
                lab if has_label else None,
                batch_size=batch_size,
                max_samples=max_samples,
                cutoff=CutoffRule.UNFILTERED,
                weighting=Weighting.MEAN,
                per_image_bank=per_img,
                order=order,
            )
            # pad to (devices * chunk) multiple, then [n_dev, n_chunks, cs, hwc]
            # (flattened per chunk — see els_sweep's layout note)
            pad = (-n) % (n_dev * cs)
            images_p = jnp.concatenate(
                [images.reshape(n, h * w * c), jnp.zeros((pad, h * w * c), images.dtype)]
            )
            w_p = jnp.concatenate([w_img, jnp.zeros((pad,), w_img.dtype)])
            images_p = images_p.reshape(n_dev, -1, cs, h * w * c)
            w_p = w_p.reshape(n_dev, -1, cs)

            b = x.shape[0]
            xq = extract_patches(pad_image(x, k // 2, "circular"), k)
            M = b * h * w
            xq_flat = xq.reshape(M, d)
            qn_flat = jnp.sum(xq_flat**2, axis=-1)

            def local(images_s, w_s, xq_flat, qn_flat, at, bt):
                # shard_map adds a leading device dim of size 1 per spec
                images_s = images_s[0]
                w_s = w_s[0]
                m, s1, s2 = els_sweep(
                    images_s, w_s, xq_flat, qn_flat, at, bt,
                    k=k, cs=cs, hwc=(h, w, c), per_img=per_img, c=c,
                    use_pallas=use_pallas,
                    precision=precision,
                )
                m, s1, s2 = merge_collective(m, s1, s2, axis)
                return s1, s2

            s1, s2 = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(), P(), P(), P()),
                out_specs=(P(), P()),
                # the scan carry starts replicated and becomes device-varying
                # after folding in the shard — skip the vma strictness check
                check_vma=False,
            )(images_p, w_p, xq_flat, qn_flat, at, bt)

            mean_center = (s2 / s1[:, None]).reshape(b, h * w, c)
            score = -(x.reshape(b, h * w, c) - at * mean_center) / (bt**2)
            return score.reshape(x.shape)

        return jax.jit(fn)


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


def shard_dataset(images, labels, mesh: Mesh, axis: str = "data"):
    """Place dataset arrays sharded over the mesh axis (for HBM capacity:
    each device holds only its shard of the training set)."""
    spec_img = NamedSharding(mesh, P(axis, None, None, None))
    spec_lab = NamedSharding(mesh, P(axis))
    return jax.device_put(images, spec_img), jax.device_put(labels, spec_lab)
