#!/usr/bin/env python
"""Offline v5e compile validation — no TPU attached, no tunnel.

The image carries a local `libtpu`, so the REAL TPU compiler (including
Mosaic for the pallas kernels) runs on this host against an abstract
`v5e:2x2x1` topology (jax.experimental.topologies). That turns remote
compile failures — which cost one ~1-3 min tunnel round-trip each, and an
outage blocks entirely — into local, seconds-scale iteration:

    RESOURCE_EXHAUSTED ... Ran out of memory in memory space vmem

reproduces here with the full per-allocation breakdown.

This tool reconstructs the EXACT jit programs the streaming ELS machine
dispatches (the segmented `prep`/`seg` pair of scores/els.py:_build —
shapes, dispatch-segmentation plan, precision, kernel routing all
identical) and compiles them for v5e. Modes:

    python tools/aot_check.py 19 high --imsize 64        # one config
    python tools/aot_check.py --sweep                    # CIFAR k=3..17 +
                                                         # 64x64 k=3..27,
                                                         # both tiers

Caveat: the local libtpu version may differ from the remote compile
helper's, so marginal VMEM fits could disagree by a few percent — treat a
local pass as a strong signal, not a guarantee (and a local failure as
near-certain remote failure).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")  # host backend; compile via topology

import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _sharding():
    topo = topologies.get_topology_desc("v5e:2x2x1", platform="tpu")
    mesh = Mesh(np.array(topo.devices[:1]), ("x",))
    return NamedSharding(mesh, P())


def _fmt_mem(compiled):
    try:
        m = compiled.memory_analysis()
        return (f"temp {m.temp_size_in_bytes / 1e9:.2f} GB, "
                f"args {m.argument_size_in_bytes / 1e9:.2f} GB")
    except Exception:
        return "mem n/a"


def check_els_streaming(k, precision, *, imsize=32, n=50000, batch=8,
                        target_block=65536, verbose=True):
    """Compile the streaming machine's prep+seg jits (scores/els.py:_build
    shapes) for v5e; returns (ok, message)."""
    from convolutional_diffusion_tpu.ops.dispatch import plan_segments
    from convolutional_diffusion_tpu.ops.patches import (
        extract_patches,
        pad_image,
    )
    from convolutional_diffusion_tpu.scores.bank import bank_geometry
    from convolutional_diffusion_tpu.scores.common import (
        CutoffRule,
        Weighting,
        image_weights,
    )
    from convolutional_diffusion_tpu.scores.els import els_sweep

    h = w = imsize
    c = 3
    g = bank_geometry(n, h, w, c, k, target_block)
    cs, per_img, d = g.cs, g.per_img, g.d
    n_chunks = g.nblk
    b = batch
    M = b * h * w
    n_seg = plan_segments(
        float(n_chunks) * cs * per_img * (b * h * w),
        precision=precision, d=d, n_chunks=n_chunks,
    )
    qsz = -(-n_chunks // n_seg)
    s = _sharding()
    f32, i32 = jnp.float32, jnp.int32
    sds = jax.ShapeDtypeStruct

    # --- prep (scores/els.py prep jit: weights + queries + flat streams)
    def prep(images, labels, order, x, lab):
        w_img = image_weights(
            labels, lab, batch_size=256, max_samples=None,
            cutoff=CutoffRule.UNFILTERED, weighting=Weighting.MEAN,
            per_image_bank=per_img, order=order,
        )
        xq = extract_patches(pad_image(x, k // 2, "circular"), k)
        xq_flat = xq.reshape(M, d)
        qn_flat = jnp.sum(xq_flat**2, axis=-1)
        pad = (-n) % cs
        images_flat = jnp.concatenate(
            [images.reshape(n, h * w * c),
             jnp.zeros((pad, h * w * c), images.dtype)]
        )
        w_flat = jnp.concatenate([w_img, jnp.zeros((pad,), w_img.dtype)])
        return images_flat, w_flat, xq_flat, qn_flat

    prep_args = (
        sds((n, h, w, c), f32), sds((n,), i32), sds((n,), i32),
        sds((b, h, w, c), f32), sds((), i32),
    )

    # --- seg (scores/els.py seg jit: the chunk scan + flash kernel)
    def seg(images_s, w_s, xq_flat, qn_flat, at, bt, state):
        return els_sweep(
            images_s.reshape(-1, cs, h * w * c), w_s.reshape(-1, cs),
            xq_flat, qn_flat, at, bt,
            k=k, cs=cs, hwc=(h, w, c), per_img=per_img, c=c,
            use_pallas=True, precision=precision, state0=state,
        )

    seg_args = (
        sds((qsz * cs, h * w * c), f32), sds((qsz * cs,), f32),
        sds((M, d), f32), sds((M,), f32), sds((), f32), sds((), f32),
        (sds((M,), f32), sds((M,), f32), sds((M, c), f32)),
    )

    tag = f"k={k} {precision} {imsize}x{imsize} n={n} b={batch}"
    try:
        cp = jax.jit(prep, in_shardings=(s,) * 5).lower(*prep_args).compile()
        if verbose:
            print(f"  prep ok ({_fmt_mem(cp)})", flush=True)
        cs_ = jax.jit(
            seg, in_shardings=(s,) * 6 + ((s, s, s),)
        ).lower(*seg_args).compile()
        msg = (f"OK   {tag}: n_seg={n_seg} qsz={qsz} chunks={n_chunks} "
               f"({_fmt_mem(cs_)})")
        if verbose:
            print(msg, flush=True)
        return True, msg
    except Exception as e:
        msg = f"FAIL {tag}: {repr(e)[:1200]}"
        if verbose:
            print(msg, flush=True)
        return False, msg


CIFAR_KS = (3, 5, 7, 9, 11, 13, 15, 17)
K64_KS = (3, 5, 7, 9, 13, 19, 23, 27)


# Capacity-batch configs the measurement queue runs (tools/measure_round3.py
# stage_capacity b16/32/64 + stage_celeba64_b32): big-M chunked-path shapes
# whose compile OOMs historically only surfaced after hours of remote runtime.
CAPACITY_CASES = (
    # (k, precision, imsize, batch) — the chunked/big-M corners only
    (11, "high", 32, 64), (13, "high", 32, 64),
    (15, "high", 32, 32), (17, "high", 32, 32),
    (15, "highest", 32, 32), (17, "highest", 32, 32),
    (3, "high", 64, 32), (7, "high", 64, 32), (9, "high", 64, 32),
    (13, "high", 64, 32), (19, "high", 64, 32), (27, "high", 64, 32),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("k", nargs="?", type=int)
    ap.add_argument("precision", nargs="?", default="high")
    ap.add_argument("--imsize", type=int, default=32)
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sweep-capacity", action="store_true")
    args = ap.parse_args()

    if args.sweep or args.sweep_capacity:
        fails = 0
        if args.sweep:
            for precision in ("high", "highest"):
                for k in CIFAR_KS:
                    ok, _ = check_els_streaming(k, precision, imsize=32)
                    fails += not ok
                for k in K64_KS:
                    ok, _ = check_els_streaming(k, precision, imsize=64)
                    fails += not ok
        if args.sweep_capacity:
            for k, precision, imsize, batch in CAPACITY_CASES:
                ok, _ = check_els_streaming(
                    k, precision, imsize=imsize, batch=batch
                )
                fails += not ok
        print(f"sweep done: {fails} failure(s)")
        return 1 if fails else 0
    if args.k is None:
        ap.error("need k or --sweep")
    ok, _ = check_els_streaming(
        args.k, args.precision, imsize=args.imsize, n=args.n,
        batch=args.batch,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
