#!/usr/bin/env python
"""Find the 'default' (fast) tier's regime — or deprecate it (VERDICT r3 #7).

Round 3 showed fast mode DOMINATED on the 32x32 CIFAR machine: end-to-end
0.1106 img/s vs 'high' 0.1199 at 5.2e-3 vs 8.9e-5 trajectory deviation.
Its one measured per-sweep win is inbank at dp<=128 (+22% at k<=5 RGB,
PERFORMANCE.md), which the CIFAR schedule (6/19 steps at dp 128) evidently
doesn't convert. Two workloads weight dp<=128 much harder:

  mnist  — the 60k grayscale bank at 32x32 (MNIST_ResNet_zeros scales):
           d = k^2, so 13 of 19 steps run at dp=128. Full machines, both
           tiers (cheap: ~1 min each).
  c64    — the CelebA 64x64 machine: k=3/5 are 11 of 19 steps (d=27/75).
           Per-k fast steps at k=3/5 vs the recorded 'high' rows (fast
           tracks 'high' within noise at k>=7 where inbank is off).

Results append to tools/measure_prune_out.json under "fast_tier".
Usage: python tools/measure_fast_tier.py [mnist|c64 ...]
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

OUT_PATH = os.path.join(REPO, "tools", "measure_prune_out.json")
OUT = {}
if os.path.exists(OUT_PATH):
    with open(OUT_PATH) as f:
        OUT = json.load(f)


def flush():
    with open(OUT_PATH, "w") as f:
        json.dump(OUT, f, indent=1)


def fence(fn, *a, iters=1, warmup=1):
    for _ in range(warmup):
        jax.device_get(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(fn(*a))
    return (time.perf_counter() - t0) / iters


def stage_mnist(batch=8):
    sys.path.insert(0, REPO)
    import bench

    res = OUT.setdefault("fast_tier", {})
    for precision in ("high", "default"):
        key = f"mnist/{precision}_machine_ips"
        if key in res:
            continue
        machine = bench._els_machine("ELS", 60000, 256, precision,
                                     workload="mnist")
        x = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 32, 1))

        def run(x):
            return machine(x).sum()

        dt = fence(run, x)
        res[key] = round(batch / dt, 4)
        flush()
        del machine


def stage_c64(batch=8, n=50000):
    from tools.measure_round3 import make_module, step_time

    res = OUT.setdefault("fast_tier", {})
    mod = make_module(n, precision="default", imsize=64)
    for k in (3, 5):
        key = f"c64/default_k{k}_sec"
        if key in res:
            continue
        dt = step_time(mod, k, batch, imsize=64)
        P = n * (65 - k) ** 2
        res[key] = round(dt, 2)
        res[f"c64/default_k{k}_gpairs"] = round(P * batch * 4096 / dt / 1e9, 1)
        flush()


STAGES = {"mnist": stage_mnist, "c64": stage_c64}

if __name__ == "__main__":
    for name in sys.argv[1:] or ["mnist", "c64"]:
        print(f"=== stage {name} ===", flush=True)
        STAGES[name]()
        print(json.dumps(OUT.get("fast_tier", {})), flush=True)
