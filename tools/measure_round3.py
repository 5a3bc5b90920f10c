#!/usr/bin/env python
"""Round-3 ELS end-to-end decomposition on the real TPU.

Answers, with measurements (results appended incrementally to
tools/measure_round3_out.json):

1. per_k      — where the 50k 20-step machine's time actually goes: one
                timed machine step per distinct k (batch 8, 'high' + fp32),
                vs the kernel microbench rates (measure_kernel_out.json).
2. extract_ab — the cost of on-the-fly patch extraction: same step with a
                prebuilt bank vs streaming, at scales where the k>=5 bank
                fits HBM (k=5 @ 20k imgs, k=7 @ 6k imgs).
3. blocks     — target_block (chunk) sweep at k=3 (cached bank) and k=5
                (streaming): 65536 vs 131072 vs 262144.
4. capacity   — per-chip throughput vs seed batch 8/16/32/64 ('high'),
                derived from per-k steps, validated end-to-end at the best
                batch (VERDICT round-3 item 4).

Usage: python tools/measure_round3.py [stage ...]   (default: all)
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

OUT_PATH = os.path.join(REPO, "tools", "measure_round3_out.json")
CIFAR10_SCALES = [3, 3, 3, 3, 5, 5, 5, 7, 7, 7, 7, 9, 9, 11, 11, 13, 15, 17, 17, 17]
# steps i = 19..1 use scales[i] (machine semantics): k=3 x3, k=5 x3, k=7 x4,
# k=9 x2, k=11 x2, k=13 x1, k=15 x1, k=17 x3
STEP_COUNTS = {}
for i in range(len(CIFAR10_SCALES) - 1, 0, -1):
    STEP_COUNTS[CIFAR10_SCALES[i]] = STEP_COUNTS.get(CIFAR10_SCALES[i], 0) + 1

OUT = {}
if os.path.exists(OUT_PATH):
    with open(OUT_PATH) as f:
        OUT = json.load(f)


def flush():
    with open(OUT_PATH, "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps({k: v for k, v in OUT.items() if not isinstance(v, dict)}),
          flush=True)


def fence(fn, *a, iters=1, warmup=1):
    for _ in range(warmup):
        jax.device_get(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(fn(*a))
    return (time.perf_counter() - t0) / iters


def make_module(n_train, *, precision, target_block=65536, budget=8 << 30,
                kind="ELS", imsize=32):
    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.scores import (
        LocalEquivBordersScoreModule,
        LocalEquivScoreModule,
    )

    ds = synthetic_dataset(num_samples=n_train, image_size=imsize,
                           num_channels=3)
    cls = LocalEquivScoreModule if kind == "ELS" else LocalEquivBordersScoreModule
    return cls(
        (ds.images, ds.labels), batch_size=256, target_block=target_block,
        precision=precision, bank_budget_bytes=budget,
    )


def step_time(mod, k, batch, t=0.45, iters=1, imsize=32):
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, imsize, imsize, 3))

    def run(x):
        return jnp.sum(mod(t, x, k=k))

    return fence(run, x, iters=iters)


def stage_per_k(precisions=("high", "highest"), batch=8, n=50000):
    res = OUT.setdefault("per_k", {})
    for precision in precisions:
        mod = make_module(n, precision=precision)
        for k in sorted(STEP_COUNTS):
            key = f"{precision}/k{k}"
            if key in res:
                continue
            dt = step_time(mod, k, batch)
            P = n * (33 - k) ** 2
            pairs = P * batch * 1024
            res[key] = {
                "sec": round(dt, 3),
                "gpairs_per_s": round(pairs / dt / 1e9, 1),
            }
            flush()
        # predicted full-machine rate = batch / sum(count_k * t_k)
        tot = sum(STEP_COUNTS[k] * res[f"{precision}/k{k}"]["sec"]
                  for k in STEP_COUNTS)
        res[f"{precision}/predicted_machine_ips"] = round(batch / tot, 4)
        flush()
        del mod


def stage_inbank(precisions=("default", "high", "highest"), batch=8, n=50000):
    """A/B the kernel 'inbank' strategy (s2 = e @ K on the MXU, no values
    operand — ops/flash_score.py) against the vpu default, per k at the
    50k machine workload. Roofline expectation: the big win is FAST mode
    (bf16 e -> ONE extra MXU pass; VPU passes drop ~2x; MXU ceiling ~192
    Gpairs/s at dp=128 vs ~111 measured), while 'high' sits at a joint
    VPU/MXU roofline (the 3-pass bf16x3 e@K lands exactly at the current
    rate's MXU bound) and 'highest' should LOSE (6 fp32 passes). Sweep
    k=3..9 (dp 128/128/256/256). Env gate is read at trace time; each
    setting gets a fresh module instance (fresh jit cache)."""
    res = OUT.setdefault("inbank", {})
    for precision in precisions:
        for k in (3, 5, 7, 9):
            dp = -(-(k * k * 3) // 128) * 128
            for tag, maxdp in (("off", 0), ("on", dp)):
                key = f"{precision}/k{k}/{tag}"
                if key in res:
                    continue
                os.environ["CDT_ELS_INBANK_MAX_DP"] = str(maxdp)
                mod = make_module(n, precision=precision)
                dt = step_time(mod, k, batch)
                P = n * (33 - k) ** 2
                res[key] = {
                    "sec": round(dt, 3),
                    "gpairs_per_s": round(P * batch * 1024 / dt / 1e9, 1),
                }
                flush()
                del mod
    os.environ["CDT_ELS_INBANK_MAX_DP"] = "0"
    # predicted machine gain if inbank is enabled wherever it wins
    base = OUT.get("per_k", {})
    for precision in precisions:
        tot_off = tot_on = 0.0
        ok = True
        for k, cnt in STEP_COUNTS.items():
            off = res.get(f"{precision}/k{k}/off") or base.get(f"{precision}/k{k}")
            if off is None and precision == "default":
                # fast tracks 'high' within a few % at the unswept large k
                off = base.get(f"high/k{k}")
            if off is None:
                ok = False
                break
            on = res.get(f"{precision}/k{k}/on")
            best = min(off["sec"], on["sec"]) if on else off["sec"]
            tot_off += cnt * off["sec"]
            tot_on += cnt * best
        if ok and tot_on > 0:
            res[f"{precision}/predicted_machine_ips_best"] = round(
                batch / tot_on, 4
            )
            res[f"{precision}/machine_gain_pct"] = round(
                100.0 * (tot_off / tot_on - 1.0), 1
            )
            flush()


def stage_extract_ab():
    """Prebuilt-bank vs streaming at bank-fits scales (the k>=5 question)."""
    res = OUT.setdefault("extract_ab", {})
    for k, n in ((5, 20000), (7, 6000)):
        for mode, budget in (("banked", 8 << 30), ("stream", 0)):
            key = f"k{k}_n{n}_{mode}"
            if key in res:
                continue
            mod = make_module(n, precision="high", budget=budget)
            dt = step_time(mod, k, 8, iters=2)
            res[key] = {"sec": round(dt, 3)}
            flush()
            del mod


def stage_blocks():
    res = OUT.setdefault("blocks", {})
    for k in (3, 5):
        for blk in (65536, 131072, 262144):
            key = f"k{k}_blk{blk}"
            if key in res:
                continue
            mod = make_module(50000, precision="high", target_block=blk)
            dt = step_time(mod, k, 8, iters=2)
            res[key] = {"sec": round(dt, 3)}
            flush()
            del mod


def stage_capacity(batches=(16, 32, 64), precision="high"):
    res = OUT.setdefault("capacity", {})
    mod = make_module(50000, precision=precision)
    pfx = "" if precision == "high" else f"{precision}/"
    for batch in batches:
        for k in sorted(STEP_COUNTS):
            key = f"{pfx}b{batch}/k{k}"
            if key in res:
                continue
            dt = step_time(mod, k, batch)
            res[key] = {"sec": round(dt, 3)}
            flush()
        tot = sum(STEP_COUNTS[k] * res[f"{pfx}b{batch}/k{k}"]["sec"]
                  for k in STEP_COUNTS)
        res[f"{pfx}b{batch}/predicted_machine_ips"] = round(batch / tot, 4)
        flush()


def stage_capacity_fp32():
    stage_capacity(batches=(16, 32), precision="highest")


def stage_bbels(precisions=("high", "highest"), batches=(8, 32), n=50000):
    """bbELS per-k steps under the round-3 block policy (the docs' bbELS
    numbers predate it) + capacity batches; predicted machine ips per batch."""
    res = OUT.setdefault("bbels", {})
    for precision in precisions:
        mod = make_module(n, precision=precision, kind="bbELS")
        for batch in batches:
            for k in sorted(STEP_COUNTS):
                key = f"{precision}/b{batch}/k{k}"
                if key in res:
                    continue
                dt = step_time(mod, k, batch)
                res[key] = {"sec": round(dt, 3)}
                flush()
            tot = sum(STEP_COUNTS[k] * res[f"{precision}/b{batch}/k{k}"]["sec"]
                      for k in STEP_COUNTS)
            res[f"{precision}/b{batch}/predicted_machine_ips"] = round(batch / tot, 4)
            flush()
        del mod


def stage_capacity_e2e(batch=None):
    """Validate the winning batch with one true end-to-end machine call."""
    from convolutional_diffusion_tpu.scores import ScheduledScoreMachine

    res = OUT.setdefault("capacity", {})
    if batch is None:
        cands = [b for b in (16, 32, 64) if f"b{b}/predicted_machine_ips" in res]
        batch = (
            max(cands, key=lambda b: res[f"b{b}/predicted_machine_ips"])
            if cands else 32
        )
    mod = make_module(50000, precision="high")
    machine = ScheduledScoreMachine(
        mod, in_channels=3, imsize=32, scales=CIFAR10_SCALES
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 32, 3))

    def run(x):
        return machine(x).sum()

    dt = fence(run, x)
    res[f"b{batch}/e2e_machine_ips"] = round(batch / dt, 4)
    flush()


CELEBA64_SCALES = [3, 3, 3, 3, 3, 3, 3, 5, 5, 5, 5, 5, 7, 7, 9, 9, 9, 13, 19, 27]


def stage_celeba64(precisions=("high", "highest"), batch=8, n=50000):
    """The 64x64 CelebA_UNet_zeros workload (BASELINE.md scales row; k up to
    27, d up to 2187): per-k timed machine steps at 50k images + predicted
    20-step machine rate — the large-d regime the 32x32 sweeps never touch."""
    counts = {}
    for i in range(len(CELEBA64_SCALES) - 1, 0, -1):
        counts[CELEBA64_SCALES[i]] = counts.get(CELEBA64_SCALES[i], 0) + 1
    res = OUT.setdefault("celeba64", {})
    for precision in precisions:
        mod = make_module(n, precision=precision, imsize=64)
        for k in sorted(counts):
            key = f"{precision}/k{k}"
            if "sec" in res.get(key, {}):  # rerun error entries
                continue
            try:
                dt = step_time(mod, k, batch, imsize=64)
            except Exception as e:
                res[key] = {"error": repr(e)[:600]}
                flush()
                continue
            P = n * (65 - k) ** 2
            pairs = P * batch * 4096
            res[key] = {
                "sec": round(dt, 3),
                "gpairs_per_s": round(pairs / dt / 1e9, 1),
            }
            flush()
        if all("sec" in res.get(f"{precision}/k{k}", {}) for k in counts):
            tot = sum(counts[k] * res[f"{precision}/k{k}"]["sec"]
                      for k in counts)
            res[f"{precision}/predicted_machine_ips"] = round(batch / tot, 4)
            flush()
        del mod


def stage_celeba64_b32():
    """64x64 per-chip capacity: same per-k steps at seed batch 32."""
    counts = {}
    for i in range(len(CELEBA64_SCALES) - 1, 0, -1):
        counts[CELEBA64_SCALES[i]] = counts.get(CELEBA64_SCALES[i], 0) + 1
    res = OUT.setdefault("celeba64", {})
    batch = 32
    mod = make_module(50000, precision="high", imsize=64)
    for k in sorted(counts):
        key = f"high/b{batch}/k{k}"
        if "sec" in res.get(key, {}):
            continue
        try:
            dt = step_time(mod, k, batch, imsize=64)
        except Exception as e:
            res[key] = {"error": repr(e)[:600]}
            flush()
            continue
        res[key] = {"sec": round(dt, 3)}
        flush()
    if all("sec" in res.get(f"high/b{batch}/k{k}", {}) for k in counts):
        tot = sum(counts[k] * res[f"high/b{batch}/k{k}"]["sec"] for k in counts)
        res[f"high/b{batch}/predicted_machine_ips"] = round(batch / tot, 4)
        flush()


def stage_per_k_fast():
    """Fast-mode ('default' tier) per-k decomposition — run after flipping
    the inbank gate so the predicted machine rate reflects the new default
    (+22% at k3/k5, measure_round3_out.json 'inbank')."""
    stage_per_k(precisions=("default",))


STAGES = {
    "per_k": stage_per_k,
    "per_k_fast": stage_per_k_fast,
    "extract_ab": stage_extract_ab,
    "inbank": stage_inbank,
    "blocks": stage_blocks,
    "capacity": stage_capacity,
    "capacity_e2e": stage_capacity_e2e,
    "capacity_fp32": stage_capacity_fp32,
    "bbels": stage_bbels,
    "celeba64": stage_celeba64,
    "celeba64_b32": stage_celeba64_b32,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["per_k", "extract_ab", "blocks", "capacity",
                             "capacity_e2e"]
    for name in names:
        print(f"=== stage {name} ===", flush=True)
        t0 = time.time()
        STAGES[name]()
        print(f"=== stage {name} done in {time.time()-t0:.0f}s ===", flush=True)
