#!/usr/bin/env python
"""Flash-kernel strategy microbench on the real TPU: fp32 parity vs fast
mode, and fast-mode vpu vs mxu1 (s1 fused into the e @ [V|1] MXU dot).
Writes tools/measure_kernel_out.json; used to pick the fast-mode default."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from convolutional_diffusion_tpu.ops.flash_score import NEG_INF, flash_score_update


def fence(fn, *a, iters=3, warmup=1):
    for _ in range(warmup):
        jax.device_get(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(fn(*a))
    return (time.perf_counter() - t0) / iters


def main():
    out = {}
    M, P, c = 16384, 1 << 20, 3
    for k in (3, 9, 17):
        d = k * k * c
        q = jax.random.normal(jax.random.PRNGKey(0), (M, d), jnp.float32)
        qn = jnp.sum(q**2, -1)
        bank = jax.random.normal(jax.random.PRNGKey(1), (P, d), jnp.float32)
        pn = jnp.sum(bank**2, -1)
        vals = bank[:, :c]
        w = jnp.full((P,), 1.0 / P)
        at = jnp.float32(0.9)
        bt = jnp.float32(jnp.sqrt(1 - 0.81))
        state = (jnp.full((M,), NEG_INF), jnp.zeros((M,)), jnp.zeros((M, c)))

        configs = [
            ("fp32_vpu", dict(precision="highest", fast_exp=False, v_strategy="vpu")),
            ("high_vpu", dict(precision="high", fast_exp=False, v_strategy="vpu")),
            ("fast_vpu", dict(precision="default", fast_exp=True, v_strategy="vpu")),
            ("fast_mxu1", dict(precision="default", fast_exp=True, v_strategy="mxu1")),
        ]
        for name, kw in configs:
            def run(q, qn, bank, pn, vals, w, at, bt, kw=kw):
                m, s1, s2 = flash_score_update(
                    q, qn, bank, pn, vals, w, at, bt, state, **kw
                )
                return s1.sum() + s2.sum() + m.sum()

            dt = fence(run, q, qn, bank, pn, vals, w, at, bt)
            rate = M * P / dt / 1e9
            out[f"k{k}_{name}_gpairs_per_s"] = round(rate, 1)
            print(f"k={k} {name}: {dt*1000:.1f} ms = {rate:.1f} Gpairs/s", flush=True)

    path = os.path.join(os.path.dirname(__file__), "measure_kernel_out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path, flush=True)


if __name__ == "__main__":
    main()
