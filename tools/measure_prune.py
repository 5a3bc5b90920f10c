#!/usr/bin/env python
"""Hardware A/B for exact block pruning (ops.prune; VERDICT r3 item 4).

Times one k=3 (and k=5 at a bank-fits scale) machine step with the cached
bank clustered+masked vs plain, at the LOW-noise timesteps where the
machine actually uses those kernel sizes (CIFAR10 scales: k=3 at i=1..3,
t = 0.05/0.10/0.15; k=5 at i=4..6). Queries are drawn from the forward
marginal at t (x = a_t img + b_t eps over held-out synthetic images) — the
distribution the reverse machine sees at that step, which is what decides
the skip rate; pure-noise queries would be unrepresentative.

Also records the measured mask skip fraction per t and the one-time
clustered-bank build cost. Results append to tools/measure_prune_out.json.

Usage: python tools/measure_prune.py [stage ...]
Stages: ab_k3 (50k), ab_k5 (20k), skipfrac, e2e_fp32 (full 20-step pruned
machine vs the round-3 baseline 0.0766 b8 / capacity b32)
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

CIFAR10_SCALES = [3, 3, 3, 3, 5, 5, 5, 7, 7, 7, 7, 9, 9, 11, 11, 13, 15, 17, 17, 17]
# machine step timesteps per k (steps i=19..1 use scales[i], t=i/20)
K_STEPS = {3: (0.05, 0.10, 0.15), 5: (0.20, 0.25, 0.30)}


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


def make_module(n, *, precision, prune, imsize=32, budget=8 << 30):
    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.scores import LocalEquivScoreModule

    ds = synthetic_dataset(num_samples=n, image_size=imsize, num_channels=3)
    return LocalEquivScoreModule(
        (ds.images, ds.labels), batch_size=256, precision=precision,
        prune=prune, bank_budget_bytes=budget,
    )


def marginal_x(t, batch, imsize=32, seed=99):
    """x ~ forward marginal at t over HELD-OUT synthetic images (seed
    differs from the bank's), like the reverse machine's state at step t."""
    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule

    ds = synthetic_dataset(num_samples=batch, image_size=imsize, seed=seed)
    beta = cosine_noise_schedule(jnp.float32(t))
    eps = jax.random.normal(
        jax.random.PRNGKey(seed + int(t * 1000)),
        (batch, imsize, imsize, 3),
    )
    return jnp.sqrt(1.0 - beta) * jnp.asarray(ds.images) + jnp.sqrt(beta) * eps


def ab(k, n, precisions=("highest", "high"), batch=8,
       pruned_precisions=("highest",)):
    """pruned_precisions defaults to fp32 only: the clustered build costs
    ~15 min of chip per module and is precision-independent geometry — the
    fp32 tier is the lever's target (VERDICT r3 #4); 'high' masks behave
    identically (same bank, same bounds)."""
    res = OUT.setdefault(f"ab_k{k}_n{n}", {})
    for prune in (False, True):
        for precision in (pruned_precisions if prune else precisions):
            tag = "pruned" if prune else "plain"
            if all(f"{precision}/{tag}/t{t:.2f}" in res for t in K_STEPS[k]):
                continue  # arm done in a prior run: don't rebuild its bank
            t_build0 = time.perf_counter()
            mod = make_module(n, precision=precision, prune=prune)
            # force the bank build (and clustering) outside the timed steps
            jax.block_until_ready(mod._bank(k).bank if prune
                                  else mod._bank(k)[0])
            build_s = time.perf_counter() - t_build0
            res[f"{precision}/{tag}/bank_build_s"] = round(build_s, 1)
            for t in K_STEPS[k]:
                key = f"{precision}/{tag}/t{t:.2f}"
                if key in res:
                    continue
                x = marginal_x(t, batch)

                def run(x):
                    return jnp.sum(mod(t, x, k=k))

                dt = fence(run, x)
                res[key] = {"sec": round(dt, 3)}
                flush()
            tot_plain = sum(
                res[f"{precision}/plain/t{t:.2f}"]["sec"] for t in K_STEPS[k]
            ) if all(f"{precision}/plain/t{t:.2f}" in res
                     for t in K_STEPS[k]) else None
            if prune and tot_plain:
                tot_pruned = sum(
                    res[f"{precision}/pruned/t{t:.2f}"]["sec"]
                    for t in K_STEPS[k]
                )
                res[f"{precision}/speedup"] = round(tot_plain / tot_pruned, 3)
                flush()
            del mod


def stage_ab_k3():
    ab(3, 50000)


def stage_ab_k5():
    # the 50k k=5 bank (12.4 GB) exceeds the ledger — measure at a
    # bank-fits scale; the chunk-scan structure matches, rates transfer
    ab(5, 20000)


def stage_skipfrac(n=50000, k=3, batch=8, thrs=(None, 60.0)):
    """Measured mask skip fraction per t (the quantity the A/B rides on),
    at the production threshold (None -> THR=152, exact-underflow) AND at
    THR=60 — the relaxed-but-still-provable setting (relative error
    <= NP * 2^-60 ~= 2^-34 at the 50k bank): shows whether ANY provable
    threshold unlocks skipping on this bank geometry. Non-default
    thresholds key as t<val>/thr<thr>. One clustered-bank build serves
    all thresholds."""
    from convolutional_diffusion_tpu.ops.flash_score import resolve_blocks
    from convolutional_diffusion_tpu.ops.prune import (
        logw_block_stats,
        prune_masks,
    )
    from convolutional_diffusion_tpu.ops.patches import extract_patches, pad_image
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
    from convolutional_diffusion_tpu.scores.bank import bank_geometry

    res = OUT.setdefault(f"skipfrac_k{k}_n{n}", {})
    todo = [
        (thr, "" if thr is None else f"/thr{thr:g}") for thr in thrs
        if not all(f"t{t:.2f}" + ("" if thr is None else f"/thr{thr:g}")
                   in res for t in (0.05, 0.10, 0.15, 0.20, 0.30, 0.50))
    ]
    if not todo:
        return
    mod = make_module(n, precision="highest", prune=True)
    cb = mod._bank(k)
    g = bank_geometry(n, 32, 32, 3, k, mod.target_block)
    w_img = jnp.full((g.nblk * g.cs,), 1.0, jnp.float32).at[n:].set(0.0)
    w_img = w_img / jnp.sum(w_img) / g.per_img  # uniform-ish; U/L use log2
    w_b = w_img[cb.img_idx.reshape(-1)].reshape(g.nblk, g.block)
    lmax, lmin, anyinc = logw_block_stats(w_b, g.block)
    M = batch * 32 * 32
    bq, _ = resolve_blocks(M, g.block, g.d, "highest", "vpu")
    for t in (0.05, 0.10, 0.15, 0.20, 0.30, 0.50):
        x = marginal_x(t, batch)
        beta = cosine_noise_schedule(jnp.float32(t))
        at, bt = jnp.sqrt(1.0 - beta), jnp.sqrt(beta)
        xq = extract_patches(pad_image(x, k // 2, "circular"), k).reshape(M, g.d)
        qn = jnp.sum(xq**2, axis=-1)
        for thr, suffix in todo:
            key = f"t{t:.2f}{suffix}"
            if key in res:
                continue
            mk = prune_masks(xq, qn, at, bt, cb.stats, lmax, lmin, anyinc,
                             block_q=bq, thr=thr)
            res[key] = round(float(jnp.mean(mk.astype(jnp.float32))), 4)
            flush()


def stage_e2e_fp32(n=50000, batch=8):
    """Full 20-step machine, pruned, fp32 — against the round-3 plain
    baselines (b8 0.0766 / b32-capacity 0.0833 img/s)."""
    from convolutional_diffusion_tpu.scores import ScheduledScoreMachine

    res = OUT.setdefault("e2e", {})
    for precision, batches in (("highest", (8, 32)), ("high", (8,))):
        mod = make_module(n, precision=precision, prune=True)
        machine = ScheduledScoreMachine(
            mod, in_channels=3, imsize=32, scales=CIFAR10_SCALES
        )
        for b in batches:
            key = f"{precision}/b{b}_pruned_machine_ips"
            if key in res:
                continue
            x = jax.random.normal(jax.random.PRNGKey(3), (b, 32, 32, 3))

            def run(x):
                return machine(x).sum()

            # warmup pays the clustered-bank build + compiles, like the
            # plain baselines did
            dt = fence(run, x, warmup=1)
            res[key] = round(b / dt, 4)
            flush()
        del mod


def stage_radii(n=50000, k=3):
    """Cluster-radius distribution of the 50k bank — the quantity that
    decides whether the triangle-inequality window can ever fire: the
    bound slack is ~2 a_t r (dist_lo + dist_best), vs the exact-underflow
    window thr / (inv2bt2 log2e) in dist^2 units (1.28 at t=0.05)."""
    res = OUT.setdefault(f"radii_k{k}_n{n}", {})
    if "p50" in res:
        return
    mod = make_module(n, precision="highest", prune=True)
    cb = mod._bank(k)
    rad = jnp.where(cb.stats.valid, cb.stats.radii, jnp.nan)
    import numpy as np

    r = np.asarray(rad)
    r = r[~np.isnan(r)]
    for q in (5, 25, 50, 75, 95):
        res[f"p{q}"] = round(float(np.percentile(r, q)), 3)
    res["n_blocks"] = int(r.size)
    # irreducible floor: per-patch iid noise norm (sigma=0.3/channel at
    # d=27 -> ~1.56) — cluster members can never be closer than their own
    # noise draws
    flush()


def _sine_images(n, sigma, seed=1):
    """A clustered image family: 16 (fx, fy) plane-wave patterns with
    random per-image phase and per-pixel noise sigma. At sigma=0.05 the
    50k k=3 clustered bank measures radius p50 = 0.38 (vs the default
    synthetic family's iid-noise floor ~1.9) — the regime where the
    triangle-inequality bounds can bite."""
    import numpy as np

    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32
    imgs = np.empty((n, 32, 32, 3), np.float32)
    labels = rs.randint(0, 10, size=(n,)).astype(np.int32)
    for i in range(n):
        fx, fy = 1 + labels[i] % 4, 1 + (labels[i] // 4) % 4
        base = np.sin(2 * np.pi * (fx * xx + fy * yy) + rs.uniform(0, 6.28))
        for ch in range(3):
            imgs[i, :, :, ch] = np.clip(
                0.7 * base + rs.normal(0, sigma, base.shape), -1, 1
            )
    return imgs, labels


def _marginal_from(imgs, t, batch, seed=7):
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule

    beta = cosine_noise_schedule(jnp.float32(t))
    eps = jax.random.normal(
        jax.random.PRNGKey(seed + int(t * 1000)), (batch,) + imgs.shape[1:]
    )
    x = jnp.asarray(imgs[:batch])
    return jnp.sqrt(1.0 - beta) * x + jnp.sqrt(beta) * eps


def stage_lownoise(n=50000, k=3, batch=8, sigma=0.05):
    """Supplementary: the same A/B on a LOW-noise clustered bank — isolates
    the mechanism from the workload's data distribution.

    v1 of this stage (keys lownoise_k3_sigma0.05) drew queries from the
    DEFAULT synthetic family — far from every cluster, so all blocks sit at
    near-equal distance and nothing can prove underflow: 0.92x (pure mask
    overhead). The honest regime is the reverse process's: at low t the
    iterate is NEAR the bank's own manifold (dist_best small, other
    clusters far), so v2 queries are the forward marginal over HELD-OUT
    images of the same sine family. Skip fractions are recorded alongside
    the times so the result is attributable either way."""
    from convolutional_diffusion_tpu.ops.flash_score import resolve_blocks
    from convolutional_diffusion_tpu.ops.patches import extract_patches, pad_image
    from convolutional_diffusion_tpu.ops.prune import (
        logw_block_stats,
        prune_masks,
    )
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
    from convolutional_diffusion_tpu.scores import LocalEquivScoreModule
    from convolutional_diffusion_tpu.scores.bank import bank_geometry

    res = OUT.setdefault(f"lownoise2_k{k}_sigma{sigma}", {})
    import numpy as np

    imgs, labels = _sine_images(n, sigma, seed=1)
    qimgs, _ = _sine_images(batch, sigma, seed=2)  # held-out, same family
    ts = (0.05, 0.10, 0.15)
    for prune in (False, True):
        tag = "pruned" if prune else "plain"
        if all(f"{tag}/t{t:.2f}" in res for t in ts) and (
            not prune or "skip/t0.05" in res
        ):
            continue
        mod = LocalEquivScoreModule(
            (imgs, labels), batch_size=256, precision="highest", prune=prune
        )
        if prune:
            cb = mod._bank(k)
            rad = np.asarray(
                jnp.where(cb.stats.valid, cb.stats.radii, jnp.nan)
            )
            res["radius_p50"] = round(float(np.nanpercentile(rad, 50)), 3)
            # measured skip fraction with the SAME masks the module builds
            g = bank_geometry(n, 32, 32, 3, k, mod.target_block)
            w_img = jnp.full((g.nblk * g.cs,), 1.0, jnp.float32)
            w_img = w_img.at[n:].set(0.0)
            w_img = w_img / jnp.sum(w_img) / g.per_img
            w_b = w_img[cb.img_idx.reshape(-1)].reshape(g.nblk, g.block)
            lmax, lmin, anyinc = logw_block_stats(w_b, g.block)
            M = batch * 32 * 32
            bq, _ = resolve_blocks(M, g.block, g.d, "highest", "vpu")
            for t in ts:
                beta = cosine_noise_schedule(jnp.float32(t))
                at, bt = jnp.sqrt(1.0 - beta), jnp.sqrt(beta)
                x = _marginal_from(qimgs, t, batch)
                xq = extract_patches(
                    pad_image(x, k // 2, "circular"), k
                ).reshape(M, g.d)
                qn = jnp.sum(xq**2, axis=-1)
                mk = prune_masks(xq, qn, at, bt, cb.stats, lmax, lmin,
                                 anyinc, block_q=bq)
                res[f"skip/t{t:.2f}"] = round(
                    float(jnp.mean(mk.astype(jnp.float32))), 4
                )
                flush()
        for t in ts:
            key = f"{tag}/t{t:.2f}"
            if key in res:
                continue
            x = _marginal_from(qimgs, t, batch)

            def run(x):
                return jnp.sum(mod(t, x, k=k))

            dt = fence(run, x)
            res[key] = {"sec": round(dt, 3)}
            flush()
        del mod
    tot_p = sum(res[f"plain/t{t:.2f}"]["sec"] for t in ts)
    tot_m = sum(res[f"pruned/t{t:.2f}"]["sec"] for t in ts)
    res["speedup"] = round(tot_p / tot_m, 3)
    flush()


STAGES = {
    "ab_k3": stage_ab_k3,
    "ab_k5": stage_ab_k5,
    "skipfrac": stage_skipfrac,
    "e2e_fp32": stage_e2e_fp32,
    "radii": stage_radii,
    "lownoise": stage_lownoise,
}

if __name__ == "__main__":
    for name in sys.argv[1:] or ["skipfrac", "ab_k3"]:
        print(f"=== stage {name} ===", flush=True)
        t0 = time.time()
        STAGES[name]()
        print(f"=== stage {name} done in {time.time()-t0:.0f}s ===", flush=True)
