#!/usr/bin/env python
"""One-off TPU measurement: matmul peaks + DDPM sampling throughput + MFU.

Reconciles the round-1 inconsistency between the measured "matmul peak"
(102.8 TFLOPS) and the DDPM sampling throughput (17 img/s ~= 165 TFLOPS
sustained): re-measures both with long chained-iteration fences so the
~31 ms axon round trip and any warm-up effects are amortized.

Writes tools/measure_tpu_out.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

OUT = {}


def fence_time(fn, *args, iters=3, warmup=1):
    """Time fn via device_get of its (small) output — the only reliable
    fence on the axon platform (block_until_ready returns early)."""
    for _ in range(warmup):
        jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.device_get(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def matmul_peak(n, dtype, precision, chain=64):
    """TFLOPS of a chain-of-`chain` n^3 matmuls inside ONE jit call."""
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.float32).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32).astype(dtype)
    alpha = jnp.asarray(1.0 / (n ** 0.5), dtype)

    @jax.jit
    def run(a, b):
        def body(x, _):
            y = jnp.dot(x, b, precision=precision, preferred_element_type=dtype)
            return y * alpha, None

        y, _ = jax.lax.scan(body, a, None, length=chain)
        return y[0, 0]

    dt, _ = fence_time(run, a, b)
    return chain * 2 * n ** 3 / dt / 1e12


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    for n in (4096, 8192):
        tf = matmul_peak(n, jnp.bfloat16, jax.lax.Precision.DEFAULT)
        OUT[f"matmul_bf16_{n}"] = round(tf, 1)
        print(f"bf16 {n}^3 chain: {tf:.1f} TFLOPS", flush=True)
    tf = matmul_peak(4096, jnp.float32, jax.lax.Precision.HIGHEST)
    OUT["matmul_fp32_highest_4096"] = round(tf, 1)
    print(f"fp32 HIGHEST 4096^3 chain: {tf:.1f} TFLOPS", flush=True)

    # ---- DDPM sampling: flagship model, iters=3 ----
    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
    from convolutional_diffusion_tpu.sampling import make_sampler

    batch, nsteps = 64, 1000
    net = MinimalResNet(
        channels=3, emb_dim=256, num_layers=8, mode="zeros", conditional=True,
        num_classes=10, kernel_size=3, lastksize=3, precision=None,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=32)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)
    sampler = make_sampler(model, nsteps=nsteps, ddpm=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3))
    labels = jnp.zeros((batch,), jnp.int32)

    def run(params, x0, labels):
        # reduce to a scalar so the fence doesn't pay the 30 MB/s tunnel
        return sampler(params, x0, labels, key=jax.random.PRNGKey(2)).sum()

    # XLA's own FLOP count for one sampler call
    try:
        ca = jax.jit(run).lower(params, x0, labels).compile().cost_analysis()
        flops = float(ca.get("flops", 0.0)) if isinstance(ca, dict) else float(
            ca[0].get("flops", 0.0)
        )
    except Exception as e:
        print("cost_analysis failed:", repr(e), flush=True)
        flops = 0.0
    # analytic: 8 conv layers 256->256 3x3 on 32x32 + up/down proj + emb MLPs
    per_img_step = (
        8 * 2 * 256 * 256 * 9 * 32 * 32  # residual convs
        + 2 * 3 * 256 * 9 * 32 * 32  # up proj
        + 2 * 256 * 3 * 9 * 32 * 32  # down proj (lastksize 3)
        + (8 + 1) * 2 * 256 * 256  # emb MLPs (per image negligible)
    )
    analytic_flops = per_img_step * batch * nsteps
    OUT["ddpm_flops_xla"] = flops
    OUT["ddpm_flops_analytic"] = analytic_flops
    print(
        f"XLA flops/call: {flops:.3e}; analytic: {analytic_flops:.3e}", flush=True
    )

    dt, _ = fence_time(run, params, x0, labels, iters=3, warmup=1)
    ips = batch / dt
    f = flops or analytic_flops
    OUT["ddpm_1000step_images_per_sec_bf16mxu_iters3"] = round(ips, 2)
    OUT["ddpm_sustained_tflops"] = round(f / dt / 1e12, 1)
    OUT["ddpm_mfu_vs_197tflops"] = round(f / dt / 1e12 / 197.0, 3)
    print(
        f"DDPM: {ips:.2f} img/s, {f/dt/1e12:.1f} TFLOPS sustained, "
        f"MFU {f/dt/1e12/197:.1%}", flush=True,
    )

    with open(os.path.join(os.path.dirname(__file__), "measure_tpu_out.json"), "w") as fh:
        json.dump(OUT, fh, indent=1)
    print("WROTE measure_tpu_out.json", flush=True)


if __name__ == "__main__":
    main()
