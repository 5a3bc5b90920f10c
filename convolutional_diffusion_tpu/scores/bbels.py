"""LocalEquivBordersScoreModule (bbELS): ELS under zeros boundary conditions.

Counterpart of `/root/reference/src/utils/idealscore.py:127-372`. With zeros
padding, translation equivariance is broken at the borders: a pixel whose
k x k window hangs off the image can only match training windows at the SAME
aligned offset relative to the border.

Unified TPU formulation (replacing the reference's hand-rolled
center/4-corner/4-edge tensor surgery): zero-pad both x and the training
images by p = k//2 and take the k x k window at every pixel. Classify each
pixel position by (row class, col class), where a row index is its own class
within p of a border and 'center' otherwise. A pixel of x attends exactly
over training windows whose position has the SAME class pair:

  - (center, center): all interior positions — the reference's valid-conv
    patch bank (idealscore.py:239-251);
  - (border row r, center): bank = windows at row r, any interior column —
    the reference's per-row-offset sliding edge filters (:254-288);
  - (center, border col): symmetric;
  - (border, border): bank = the single window at that exact position of
    each training image — the reference's corner regions (:201-236).

Since the zero-padded window distance includes zeros-vs-zeros terms only
where BOTH windows hang off identically, it equals the reference's padded
crop distances exactly. Values are window-center pixels (always in-bounds).

Parity notes: accumulation is SUM (not mean; idealscore.py:336-368) and the
max_samples cutoff is the batch quota q = i*batch_size (:184-187,370). The
reference supports only batch size 1 (its `x[:, None:, ...]` at :251 is a
no-op slice); this implementation is batched. For k >= h it falls back to a
zeros-mode LocalScoreModule like the reference (:148-154,162-164).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.dispatch import plan_segments
from ..ops.patches import center_index, extract_patches, pad_image
from .bank import BankCacheMixin, bank_geometry
from .base import ScoreModuleBase
from .els import banked_sweep
from .common import (
    CutoffRule,
    Weighting,
    image_weights,
    init_state,
    update_state,
)
from .local import LocalScoreModule


class LocalEquivBordersScoreModule(BankCacheMixin, ScoreModuleBase):
    def __init__(
        self,
        dataset,
        *,
        batch_size: int = 64,
        target_block: int = 65536,
        use_pallas: bool | None = None,
        bank_budget_bytes: int = 8 << 30,
        bank_ledger=None,
        dispatch_target_s: float | None = None,
        **kw,
    ):
        super().__init__(dataset, batch_size=batch_size, **kw)
        # cumulative across kernel sizes AND, via a shared BankLedger,
        # across modules (see els.py / scores.bank notes)
        self._init_bank_cache(
            target_block=target_block, use_pallas=use_pallas,
            bank_budget_bytes=bank_budget_bytes, bank_ledger=bank_ledger,
            dispatch_target_s=dispatch_target_s,
            # pruning (ops.prune) is wired for the ELS bank mode only; the
            # bbELS region sweeps keep plain banks regardless of the env
            # gate (its center bank shares _bank with this flag)
            prune=False,
        )
        self._local_fallback_cache = None

    @property
    def _local_fallback(self):
        """k >= h falls back to a zeros-mode LocalScoreModule (reference
        idealscore.py:148-154,162-164). Built LAZILY on first such k: eager
        construction re-uploaded the whole dataset (a second 614 MB HBM
        copy at 50k CIFAR) for a path the calibrated odd scales never hit.
        Shares this module's device arrays, so no duplicate copy either."""
        if self._local_fallback_cache is None:
            self._local_fallback_cache = LocalScoreModule(
                (self.images, self.labels),
                kernel_size=self.kernel_size,
                batch_size=self.batch_size,
                schedule=self.schedule,
                max_samples=self.max_samples,
                precision=self.precision,
                shuffle_key=self._shuffle_key,
            )
        return self._local_fallback_cache

    def _center_bank(self, k: int):
        """Cached center-region bank: the interior windows are exactly the
        valid k x k patches of the (unpadded) training images, so the center
        of bbELS IS the ELS bank (BankCacheMixin._bank)."""
        return self._bank(k)

    def __call__(self, t, x, label=None, device=None, k=None, order=None):
        kk = int(k) if k is not None else self.kernel_size
        if kk % 2 == 0 or kk < 1:
            raise ValueError(
                f"kernel size must be odd and positive, got {kk}"
            )
        import numpy as np

        if label is not None and np.ndim(label) >= 1:
            # fail fast at the API boundary (the base guard is bypassed on
            # the banked path); the shape error inside jit is opaque
            raise ValueError(
                "LocalEquivBordersScoreModule takes a scalar label per "
                "call; only LocalEquivScoreModule evaluates per-seed label "
                "vectors in one sweep — group seeds by label instead"
            )
        if kk >= self.image_size:
            # reference fallback: idealscore.py:162-164
            return self._local_fallback(t, x, label=label, k=kk, order=order)
        bank = self._center_bank(kk)
        if bank is None:
            return super().__call__(t, x, label=label, k=kk, order=order)
        from .base import _as_scalar_t

        x = jnp.asarray(x, jnp.float32)
        t = _as_scalar_t(t)
        beta = self.schedule(t)
        at = jnp.sqrt(1.0 - beta)
        bt = jnp.sqrt(beta)
        has_label = label is not None
        key = ("bank", kk, x.shape, has_label)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(
                k=kk, x_shape=x.shape, has_label=has_label, center_banked=True
            )
        lab = jnp.asarray(label if has_label else -1, jnp.int32)
        return self._jit_cache[key](
            self.images, self.labels, self._stream_order(order), x, lab, at, bt, *bank
        )

    def _build(self, *, k: int, x_shape, has_label: bool, center_banked: bool = False):
        batch_size = self.batch_size
        max_samples = self.max_samples
        cs = self._chunk_images(k)
        p = k // 2
        B = self.target_block
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        # dot precision for the region einsums: dots are never pure bf16
        # (the 1/(2 beta) logit scaling amplifies bf16 rounding to ~19%
        # posterior error at low noise) — fast mode uses bf16x3 (HIGH)
        HI = (
            jax.lax.Precision.HIGH
            if self.precision == "default"
            else self.prec
        )
        precision = self.precision
        # dataset sharding (set by parallel.ShardedLocalEquivBordersScoreModule)
        mesh = getattr(self, "mesh", None)
        shard_axis = getattr(self, "axis", "data")
        n_dev = mesh.shape[shard_axis] if mesh is not None else 1

        # static geometry (from the module's dataset/x shapes)
        n_img, h, w, c = self.images.shape
        b = x_shape[0]
        d = k * k * c
        ctr = center_index(k, c)
        rc, cc = slice(p, h - p), slice(p, w - p)  # center row/col ranges
        hc, wc = h - 2 * p, w - 2 * p
        top, bottom = slice(0, p), slice(h - p, h)
        left, right = slice(0, p), slice(w - p, w)

        # dispatch segmentation plan (ops.dispatch; single-device only —
        # the execution watchdog is an axon-tunnel artifact and the tunnel
        # exposes one chip; real multi-chip runtimes don't impose it, and
        # sharded sweeps already divide per-device work by n_dev). Border
        # pairs per chunk are exact; 1.5x covers the einsum/elementwise
        # overhead of the many-region formulation vs the flash kernel rates.
        pairs_border = float(n_img) * b * (
            2 * p * wc * wc + 2 * p * hc * hc + 4 * p * p
        )
        pairs_center_stream = (
            0.0 if center_banked else float(n_img) * hc * wc * b * hc * wc
        )
        n_chunks_ = -(-n_img // cs)
        n_seg = 1 if mesh is not None else plan_segments(
            pairs_border + pairs_center_stream,
            precision=precision, d=d, n_chunks=n_chunks_,
            target_s=self.dispatch_target_s, work_factor=1.5,
        )
        if center_banked:
            g = bank_geometry(n_img, h, w, c, k, B)
            pairs_center_banked = float(g.nblk) * g.block * (b * hc * wc)
            n_seg_c = 1 if mesh is not None else plan_segments(
                pairs_center_banked,
                precision=precision, d=d, n_chunks=g.nblk,
                target_s=self.dispatch_target_s,
            )
            # even when each sweep fits the target alone, the ONE-SHOT jit
            # runs border scan + center sweep in a single execution — plan
            # their COMBINED estimate too, else two ~target_s halves add up
            # to the full ~60 s watchdog (the 2x margin exists for a reason)
            n_combined = 1 if mesh is not None else plan_segments(
                1.5 * pairs_border + pairs_center_banked,
                precision=precision, d=d, n_chunks=2,
                target_s=self.dispatch_target_s,
            )
        else:
            g = None
            n_seg_c = 1
            n_combined = 1

        def make_queries(x, xq):
            """Per-region query tensors from the zero-padded windows of x
            (a pytree, so the segmented path can pass them between jits)."""
            q_center = xq[:, rc, cc, :].reshape(b, hc * wc, d)

            def row_queries(rows):  # [R, b, wc, d]
                q = xq[:, rows, cc, :]  # [b, R, wc, d]
                return jnp.moveaxis(q, 1, 0)

            def col_queries(cols):  # [R, b, hc, d]
                q = xq[:, rc, cols, :]  # [b, hc, R, d]
                return jnp.transpose(q, (2, 0, 1, 3))

            def corner_queries(rows, cols):  # [p*p, b, d]
                q = xq[:, rows, cols, :]  # [b, p, p, d]
                return q.reshape(b, p * p, d).transpose(1, 0, 2)

            return {
                "center": q_center,
                "center_n": jnp.sum(q_center**2, axis=-1),
                "rows": {
                    "top": row_queries(top), "bottom": row_queries(bottom)
                },
                "cols": {
                    "left": col_queries(left), "right": col_queries(right)
                },
                "corners": {
                    "tl": corner_queries(top, left),
                    "tr": corner_queries(top, right),
                    "bl": corner_queries(bottom, left),
                    "br": corner_queries(bottom, right),
                },
            }

        def init_states():
            return {
                **(
                    {} if center_banked else {"center": init_state((b, hc * wc), c)}
                ),
                **{f"row_{nm}": init_state((p, b, wc), c) for nm in ("top", "bottom")},
                **{f"col_{nm}": init_state((p, b, hc), c) for nm in ("left", "right")},
                **{f"corner_{nm}": init_state((p * p, b), c)
                   for nm in ("tl", "tr", "bl", "br")},
            }

        def make_step(queries, at, bt):
            """The per-chunk region update — single source for the one-shot
            scan, the sharded scan, and the segmented scans."""
            q_center = queries["center"]
            qn_center = queries["center_n"]
            q_rows = queries["rows"]
            q_cols = queries["cols"]
            q_corners = queries["corners"]
            beta2 = 2.0 * bt**2

            def step(states, chunk):
                imgs_c, w_c = chunk  # [cs, h*w*c], [cs]
                imgs_c = imgs_c.reshape(cs, h, w, c)
                iwin = extract_patches(pad_image(imgs_c, p, "zeros"), k)
                out = dict(states)

                if not center_banked:
                    # center: bank = all interior windows of the chunk images
                    bank = iwin[:, rc, cc, :].reshape(cs * hc * wc, d)
                    pn = jnp.sum(bank**2, axis=-1)
                    dots = jnp.einsum("bqd,pd->bqp", q_center, bank, precision=HI)
                    logits = (
                        -(qn_center[..., None] - 2 * at * dots + at**2 * pn) / beta2
                    )
                    wb = jnp.repeat(w_c, hc * wc)
                    out["center"] = update_state(
                        states["center"], logits, wb[None, None, :], bank[:, ctr]
                    )

                # rows: per border row r, bank = windows at (r, interior cols)
                def rows_update(key, rows, q):
                    bank = jnp.moveaxis(iwin[:, rows, cc, :], 1, 0)  # [R,cs,wc,d]
                    R = bank.shape[0]
                    bank = bank.reshape(R, cs * wc, d)
                    pn = jnp.sum(bank**2, axis=-1)  # [R, P]
                    qn = jnp.sum(q**2, axis=-1)  # [R, b, wc]
                    dots = jnp.einsum("rbqd,rpd->rbqp", q, bank, precision=HI)
                    logits = (
                        -(qn[..., None] - 2 * at * dots + at**2 * pn[:, None, None, :])
                        / beta2
                    )
                    wb = jnp.tile(jnp.repeat(w_c, wc)[None], (R, 1))
                    out[key] = update_state(
                        states[key], logits, wb[:, None, None, :], bank[..., ctr]
                    )

                rows_update("row_top", top, q_rows["top"])
                rows_update("row_bottom", bottom, q_rows["bottom"])

                def cols_update(key, cols, q):
                    bank = jnp.transpose(iwin[:, rc, cols, :], (2, 0, 1, 3))
                    R = bank.shape[0]  # [R, cs, hc, d]
                    bank = bank.reshape(R, cs * hc, d)
                    pn = jnp.sum(bank**2, axis=-1)
                    qn = jnp.sum(q**2, axis=-1)
                    dots = jnp.einsum("rbqd,rpd->rbqp", q, bank, precision=HI)
                    logits = (
                        -(qn[..., None] - 2 * at * dots + at**2 * pn[:, None, None, :])
                        / beta2
                    )
                    wb = jnp.tile(jnp.repeat(w_c, hc)[None], (R, 1))
                    out[key] = update_state(
                        states[key], logits, wb[:, None, None, :], bank[..., ctr]
                    )

                cols_update("col_left", left, q_cols["left"])
                cols_update("col_right", right, q_cols["right"])

                # corners: per position, bank = the window at that position
                def corner_update(key, rows, cols, q):
                    bank = iwin[:, rows, cols, :]  # [cs, p, p, d]
                    bank = bank.reshape(cs, p * p, d).transpose(1, 0, 2)  # [R,cs,d]
                    pn = jnp.sum(bank**2, axis=-1)  # [R, cs]
                    qn = jnp.sum(q**2, axis=-1)  # [R, b]
                    dots = jnp.einsum("rbd,rpd->rbp", q, bank, precision=HI)
                    logits = (
                        -(qn[..., None] - 2 * at * dots + at**2 * pn[:, None, :])
                        / beta2
                    )
                    out[key] = update_state(
                        states[key], logits, w_c[None, None, :], bank[..., ctr]
                    )

                for nm, (rr, cc_) in {
                    "tl": (top, left),
                    "tr": (top, right),
                    "bl": (bottom, left),
                    "br": (bottom, right),
                }.items():
                    corner_update(f"corner_{nm}", rr, cc_, q_corners[nm])

                return out, None

            return step

        def assemble(states, mc, x, at, bt):
            """Score image from the region states + center means mc
            [b, hc, wc, c] (single source for both dispatch paths)."""

            def mean_v(st):
                return st.s2 / st.s1[..., None]

            out = jnp.zeros_like(x)
            out = out.at[:, rc, cc, :].set(-(x[:, rc, cc, :] - at * mc) / (bt**2))

            for nm, rows in (("top", top), ("bottom", bottom)):
                m = jnp.moveaxis(mean_v(states[f"row_{nm}"]), 0, 1)  # [b, R, wc, c]
                out = out.at[:, rows, cc, :].set(
                    -(x[:, rows, cc, :] - at * m) / (bt**2)
                )
            for nm, cols in (("left", left), ("right", right)):
                m = jnp.transpose(mean_v(states[f"col_{nm}"]), (1, 2, 0, 3))
                out = out.at[:, rc, cols, :].set(
                    -(x[:, rc, cols, :] - at * m) / (bt**2)
                )
            for nm, (rows, cols) in {
                "tl": (top, left),
                "tr": (top, right),
                "bl": (bottom, left),
                "br": (bottom, right),
            }.items():
                m = mean_v(states[f"corner_{nm}"])  # [p*p, b, c]
                m = m.transpose(1, 0, 2).reshape(b, p, p, c)
                out = out.at[:, rows, cols, :].set(
                    -(x[:, rows, cols, :] - at * m) / (bt**2)
                )
            return out

        def center_w_b(w_img):
            """Per-block bank weights [nblk, B] for the cached-center sweep."""
            pad_img = g.nblk * g.cs - n_img
            w_imgp = (
                jnp.concatenate([w_img, jnp.zeros((pad_img,), w_img.dtype)])
                if pad_img
                else w_img
            )
            return jnp.repeat(w_imgp, g.per_img).reshape(-1, g.block)

        def stream_weights(labels, order, lab):
            return image_weights(
                labels,
                lab if has_label else None,
                batch_size=batch_size,
                max_samples=max_samples,
                cutoff=CutoffRule.BATCH_QUOTA,
                weighting=Weighting.SUM,
                order=order,
            )

        def fn(images, labels, order, x, lab, at, bt, *bank_args):
            n = images.shape[0]
            w_img = stream_weights(labels, order, lab)
            # chunks stream FLATTENED ([cs, h*w*c]): a c=3-minor scan operand
            # would be layout-padded to 128 lanes (42x HBM bloat; see els_sweep)
            pad = (-n) % (n_dev * cs)
            images_p = jnp.concatenate(
                [images.reshape(n, h * w * c), jnp.zeros((pad, h * w * c), images.dtype)]
            ).reshape(
                (n_dev, -1, cs, h * w * c) if mesh is not None else (-1, cs, h * w * c)
            )
            w_img_p = jnp.concatenate([w_img, jnp.zeros((pad,), w_img.dtype)]).reshape(
                (n_dev, -1, cs) if mesh is not None else (-1, cs)
            )

            xq = extract_patches(pad_image(x, p, "zeros"), k)  # [b, h, w, d]
            queries = make_queries(x, xq)
            states = init_states()
            step = make_step(queries, at, bt)

            if mesh is None:
                states, _ = jax.lax.scan(step, states, (images_p, w_img_p))
            else:
                # dataset-sharded sweep: each device scans its image shard,
                # then every region's partial state merges over ICI with the
                # pmax/psum streaming-softmax combine
                from jax.sharding import PartitionSpec as P

                from ..parallel.sharded_score import merge_collective

                def local(imgs_s, w_s):
                    st, _ = jax.lax.scan(step, states, (imgs_s[0], w_s[0]))
                    merged = {}
                    for name, s in st.items():
                        m_, s1_, s2_ = merge_collective(
                            s.m, s.s1, s.s2, shard_axis
                        )
                        merged[name] = type(s)(m_, s1_, s2_)
                    return merged

                states = jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(P(shard_axis), P(shard_axis)),
                    out_specs=P(),
                    check_vma=False,
                )(images_p, w_img_p)

            # --- center via the cached bank (flash kernel / MXU scan) -----
            if center_banked:
                # compact chunked layout [nblk, B*d] etc. (scores.bank);
                # each step reshapes its own block back to [B, d]
                bank, bank_ctr, bank_pn = bank_args
                w_b = center_w_b(w_img)
                M = b * g.per_img
                cs1, cs2 = banked_sweep(
                    queries["center"].reshape(M, d),
                    queries["center_n"].reshape(M),
                    bank, bank_ctr, bank_pn, w_b, at, bt,
                    B=g.block, d=d, c=c, use_pallas=use_pallas,
                    precision=precision,
                    inbank_col=center_index(k, c).start,
                )
                mc = (cs2 / cs1[:, None]).reshape(b, hc, wc, c)
            else:
                st = states["center"]
                mc = (st.s2 / st.s1[..., None]).reshape(b, hc, wc, c)

            return assemble(states, mc, x, at, bt)

        if n_seg == 1 and n_seg_c == 1 and n_combined == 1:
            return jax.jit(fn)

        # --- segmented dispatch (ops.dispatch): the border-region scan and
        # the cached-center bank sweep each split into back-to-back
        # executions with softmax states carried on device between them —
        # bit-exact vs the one-shot path (the scans are sequential either
        # way), but no single execution outlives the dispatch target (the
        # axon tunnel kills ~60 s+ calls). mesh path never segments (its
        # per-device work is already 1/n_dev).
        @jax.jit
        def prep(images, labels, order, x, lab):
            # 2-D flat arrays across the jit boundary: a [n_chunks, cs, hwc]
            # OUTPUT can get an XLA output layout with cs minor — lane-padded
            # cs -> 128, a multi-GB HBM blowup that OOMs the compile
            # (measured; see the ELS segmented prep note). Segment fns
            # re-do the [rows, hwc] -> [chunks, cs, hwc] reshape inside.
            n = images.shape[0]
            w_img = stream_weights(labels, order, lab)
            pad = (-n) % cs
            images_flat = jnp.concatenate(
                [images.reshape(n, h * w * c),
                 jnp.zeros((pad, h * w * c), images.dtype)]
            )
            w_flat = jnp.concatenate([w_img, jnp.zeros((pad,), w_img.dtype)])
            xq = extract_patches(pad_image(x, p, "zeros"), k)
            # the center sweep's per-block bank weights are built HERE (fused
            # into the prep jit) — eager center_w_b per call would dispatch
            # an unfused repeat/reshape over [n*per_img] (hundreds of MB at
            # the 64x64/50k workload)
            w_b = center_w_b(w_img) if center_banked else w_img
            return images_flat, w_flat, make_queries(x, xq), w_b

        @jax.jit
        def region_seg(images_s, w_s, queries, at, bt, states):
            step = make_step(queries, at, bt)
            states, _ = jax.lax.scan(
                step, states,
                (images_s.reshape(-1, cs, h * w * c), w_s.reshape(-1, cs)),
            )
            return states

        qsz = -(-n_chunks_ // n_seg)
        edges = list(range(0, n_chunks_, qsz)) + [n_chunks_]

        if center_banked:
            Mc = b * g.per_img

            @jax.jit
            def center_seg(bank_s, ctr_s, pn_s, w_s, qc, qcn, at, bt, state):
                return banked_sweep(
                    qc, qcn, bank_s, ctr_s, pn_s, w_s, at, bt,
                    B=g.block, d=d, c=c, use_pallas=use_pallas,
                    precision=precision, state0=state, return_m=True,
                    inbank_col=center_index(k, c).start,
                )

            qsz_c = -(-g.nblk // n_seg_c)
            edges_c = list(range(0, g.nblk, qsz_c)) + [g.nblk]

        @jax.jit
        def finish(states, mc, x, at, bt):
            return assemble(states, mc, x, at, bt)

        def host_fn(images, labels, order, x, lab, at, bt, *bank_args):
            images_flat, w_flat, queries, w_b = prep(
                images, labels, order, x, lab
            )
            states = init_states()
            for i0, i1 in zip(edges[:-1], edges[1:]):
                states = region_seg(
                    images_flat[i0 * cs : i1 * cs],
                    w_flat[i0 * cs : i1 * cs], queries, at, bt, states
                )
            if center_banked:
                bank, bank_ctr, bank_pn = bank_args
                qc = queries["center"].reshape(Mc, d)
                qcn = queries["center_n"].reshape(Mc)
                st = (
                    jnp.full((Mc,), -jnp.inf, jnp.float32),
                    jnp.zeros((Mc,), jnp.float32),
                    jnp.zeros((Mc, c), jnp.float32),
                )
                for i0, i1 in zip(edges_c[:-1], edges_c[1:]):
                    st = center_seg(
                        bank[i0:i1], bank_ctr[i0:i1], bank_pn[i0:i1],
                        w_b[i0:i1], qc, qcn, at, bt, st,
                    )
                mc = (st[2] / st[1][:, None]).reshape(b, hc, wc, c)
            else:
                stc = states["center"]
                mc = (stc.s2 / stc.s1[..., None]).reshape(b, hc, wc, c)
            return finish(states, mc, x, at, bt)

        return host_fn
