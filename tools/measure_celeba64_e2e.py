#!/usr/bin/env python
"""The 64x64 CelebA_UNet_zeros machine, measured END-TO-END (VERDICT r3 #3).

Round 3 left the 64x64 flagship machine as a per-k-step PREDICTION
(0.0051 img/s 'high' b8, tools/measure_round3_out.json "celeba64"); this
driver closes it with one true 20-step machine call over the 50k bank
(BASELINE.md CelebA_UNet_zeros scales row: k up to 27, d up to 2187).

Stages (each idempotent, results appended to measure_round3_out.json):
  refresh_k19 — re-times the high/k19 step under the round-4 bp=768
                chunked-tile policy (tools/ab_k19_bp.py's measured win)
                and recomputes the predicted machine rate.
  e2e         — ONE end-to-end ScheduledScoreMachine call, batch 8,
                'high', fenced; records measured ips next to the
                prediction. (~25 min of pure compute; the per-k refresh
                doubles as the k=19 compile warmup, and every other
                per-k program is already in the persistent cache.)

Usage: python tools/measure_celeba64_e2e.py [refresh_k19|e2e ...]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tools.measure_round3 import (  # noqa: E402
    CELEBA64_SCALES,
    OUT,
    flush,
    make_module,
    step_time,
)

COUNTS = {}
for i in range(len(CELEBA64_SCALES) - 1, 0, -1):
    COUNTS[CELEBA64_SCALES[i]] = COUNTS.get(CELEBA64_SCALES[i], 0) + 1


def refresh_k19(batch=8, n=50000):
    res = OUT.setdefault("celeba64", {})
    key = "high/k19_bp768"
    if "sec" not in res.get(key, {}):
        mod = make_module(n, precision="high", imsize=64)
        dt = step_time(mod, 19, batch, imsize=64)
        P = n * (65 - 19) ** 2
        res[key] = {
            "sec": round(dt, 3),
            "gpairs_per_s": round(P * batch * 4096 / dt / 1e9, 1),
        }
        del mod
    # predicted machine rate with the refreshed k19 step
    tot = 0.0
    for k, cnt in COUNTS.items():
        e = res[key] if k == 19 else res[f"high/k{k}"]
        tot += cnt * e["sec"]
    res["high/predicted_machine_ips_bp768"] = round(batch / tot, 4)
    flush()


def e2e(batch=8, n=50000):
    from convolutional_diffusion_tpu.scores import ScheduledScoreMachine

    res = OUT.setdefault("celeba64", {})
    if "high/b8_e2e_machine_ips" in res:
        print("e2e already measured:", res["high/b8_e2e_machine_ips"])
        return
    mod = make_module(n, precision="high", imsize=64)
    machine = ScheduledScoreMachine(
        mod, in_channels=3, imsize=64, scales=CELEBA64_SCALES
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, 64, 64, 3))
    t0 = time.perf_counter()
    out = jax.device_get(machine(x).sum())
    dt = time.perf_counter() - t0
    res["high/b8_e2e_machine_sec"] = round(dt, 1)
    res["high/b8_e2e_machine_ips"] = round(batch / dt, 5)
    res["high/b8_e2e_machine_out_finite"] = bool(out == out)
    flush()


def e2e_warm(batch=8, n=50000):
    """Round 4's cold e2e landed 6.5% under the per-k prediction, attributed
    to ~19 first-dispatch tunnel hits (CLAUDE.md time-to-first-result noise).
    This stage removes the attribution from the record: one full warmup
    machine call primes every step program's first dispatch, then ONE timed
    call measures the steady state the prediction models."""
    from convolutional_diffusion_tpu.scores import ScheduledScoreMachine

    res = OUT.setdefault("celeba64", {})
    if "high/b8_e2e_warm_machine_ips" in res:
        print("e2e_warm already measured:", res["high/b8_e2e_warm_machine_ips"])
        return
    mod = make_module(n, precision="high", imsize=64)
    machine = ScheduledScoreMachine(
        mod, in_channels=3, imsize=64, scales=CELEBA64_SCALES
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, 64, 64, 3))
    jax.device_get(machine(x).sum())  # warmup: primes all 20 step programs
    t0 = time.perf_counter()
    out = jax.device_get(machine(x).sum())
    dt = time.perf_counter() - t0
    res["high/b8_e2e_warm_machine_sec"] = round(dt, 1)
    res["high/b8_e2e_warm_machine_ips"] = round(batch / dt, 5)
    res["high/b8_e2e_warm_machine_out_finite"] = bool(out == out)
    flush()


STAGES = {"refresh_k19": refresh_k19, "e2e": e2e, "e2e_warm": e2e_warm}

if __name__ == "__main__":
    for name in sys.argv[1:] or ["refresh_k19", "e2e"]:
        print(f"=== {name} ===", flush=True)
        STAGES[name]()
        print(json.dumps({k: v for k, v in OUT.get("celeba64", {}).items()
                          if "k19_bp768" in k or "e2e" in k or "bp768" in k}),
              flush=True)
