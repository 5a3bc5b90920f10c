#!/usr/bin/env python
"""Kernel block-size sweep for the large-d regime (k >= 11), where round-3
per-k decomposition (measure_round3_out.json) shows the flash kernel falling
to 19-34 Gpairs/s ('high') on 256x512 blocks — ~50% of the 50k machine's
wall-clock. Larger block_q cuts the K-tile HBM re-streaming (once per query
block) and fills the MXU pipeline; this sweeps (block_q, block_p) per d and
records what fits VMEM and what it yields.

Writes tools/measure_blocks_out.json incrementally.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from convolutional_diffusion_tpu.ops.flash_score import NEG_INF, flash_score_update

OUT_PATH = os.path.join(REPO, "tools", "measure_blocks_out.json")
OUT = {}
if os.path.exists(OUT_PATH):
    with open(OUT_PATH) as f:
        OUT = json.load(f)


def flush():
    with open(OUT_PATH, "w") as f:
        json.dump(OUT, f, indent=1)


def fence_pipelined(fn, *a, iters=4, warmup=1):
    """Launch `iters` independent calls and device_get only the LAST scalar:
    the TPU executes in order, so the final fetch fences the whole batch and
    the ~31 ms axon round trip is paid once (block_until_ready returns early
    on this platform and cannot be used). Avoids the round-2 chained-scan
    trap: each call is a normal dispatch, no scan carry in the graph."""
    for _ in range(warmup):
        jax.device_get(fn(*a))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*a)
    jax.device_get(r)
    return (time.perf_counter() - t0) / iters


def main():
    M = 8192  # the machines' batch-8 query count (8 * 32 * 32)
    c = 3
    ks = [int(s) for s in (sys.argv[1:] or [7, 11, 13, 17])]
    for k in ks:
        d = k * k * c
        # cap the operand footprint at large d: the wrapper pads the bank
        # into a second [Pp, dp] copy, and ~2 x 7 GB at k=17/P=2M OOMs the
        # compile (HTTP-500 from the remote compile helper). k<=13 keeps the
        # 2M-patch sweep (and its already-cached compiles). The 64x64-regime
        # k>=19 (d>1500) halves P again: 2 x 4 GB at d=2187 still fits.
        P = 1 << 21 if d <= 600 else (600 * 1024 if d <= 1500 else 300 * 1024)
        q = jax.random.normal(jax.random.PRNGKey(0), (M, d), jnp.float32)
        qn = jnp.sum(q**2, -1)
        bank = jax.random.normal(jax.random.PRNGKey(1), (P, d), jnp.float32)
        pn = jnp.sum(bank**2, -1)
        vals = bank[:, :c]
        w = jnp.full((P,), 1.0 / P)
        at = jnp.float32(0.9)
        bt = jnp.float32(jnp.sqrt(1 - 0.81))
        state = (jnp.full((M,), NEG_INF), jnp.zeros((M,)), jnp.zeros((M, c)))
        # BLOCKS_SMALL=1 trims to the configs plausible at huge d (k>=19):
        # bigger tiles than 512x1024 cannot fit VMEM at dp>=1152.
        cands = (
            (None, None),  # current policy
            (256, 1024), (512, 512), (512, 1024), (512, 2048),
            (1024, 512), (1024, 1024), (2048, 512),
            (256, 2048), (256, 4096), (512, 4096),
        )
        if os.environ.get("BLOCKS_SMALL"):
            cands = ((None, None), (256, 1024), (512, 512), (512, 1024),
                     (256, 2048))
        for precision in ("high", "highest"):
            for bq, bp in cands:
                tag = f"k{k}/{precision}/pip/bq{bq}_bp{bp}"
                if tag in OUT:
                    continue
                iters = max(3, int(6e9 / (M * P)))

                def run(q, qn, bank, pn, vals, w, at, bt):
                    m, s1, s2 = flash_score_update(
                        q, qn, bank, pn, vals, w, at, bt, state,
                        precision=precision, v_strategy="vpu",
                        fast_exp=False, block_q=bq, block_p=bp,
                    )
                    return s1.sum() + s2.sum() + m.sum()

                try:
                    dt = fence_pipelined(
                        run, q, qn, bank, pn, vals, w, at, bt, iters=iters
                    )
                    OUT[tag] = round(M * P / dt / 1e9, 1)  # Gpairs/s
                except Exception as e:
                    OUT[tag] = f"FAIL: {repr(e)[:120]}"
                flush()
                print(tag, OUT[tag], flush=True)


if __name__ == "__main__":
    main()
