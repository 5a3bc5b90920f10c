#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): CIFAR10 images/sec/chip for 1000-step DDPM
sampling on the flagship model (8-layer emb-256 conditional MinimalResNet,
the README recipe). Details include the 100-iter-equivalent ELS sampling
throughput (20-step ScheduledScoreMachine over a CIFAR10-sized synthetic
training set with the repo's calibrated CIFAR10 scales).

`vs_baseline` compares against the torch reference measured on this host by
tools/bench_reference.py (stored in BASELINE_MEASURED.json); null when that
measurement is absent.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compile cache: the first run pays ~8 min of remote compiles,
# subsequent runs hit the cache
try:
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def time_fn(fn, *args, warmup=1, iters=1):
    # NOTE: force a device->host transfer to fence each iteration — on this
    # image's remote-TPU (axon) platform, block_until_ready returns before
    # execution finishes, which inflates throughput ~1000x.
    import numpy as _np

    for _ in range(warmup):
        _np.asarray(jax.device_get(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _np.asarray(jax.device_get(fn(*args)))
    return (time.perf_counter() - t0) / iters, out


def bench_ddpm(batch=64, nsteps=1000, precision=None):
    """precision=None -> TPU-native bf16 MXU matmuls with fp32 accumulation;
    precision='highest' -> full fp32 (the parity configuration)."""
    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
    from convolutional_diffusion_tpu.sampling import make_sampler

    net = MinimalResNet(
        channels=3, emb_dim=256, num_layers=8, mode="zeros", conditional=True,
        num_classes=10, kernel_size=3, lastksize=3, precision=precision,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=32)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)
    sampler = make_sampler(model, nsteps=nsteps, ddpm=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 32, 32, 3))
    labels = jnp.zeros((batch,), jnp.int32)

    def run(params, x0, labels):
        return sampler(params, x0, labels, key=jax.random.PRNGKey(2))

    dt, _ = time_fn(run, params, x0, labels)
    return batch / dt


def bench_els(batch=16, n_train=2048, max_samples=None):
    """20-step ELS machine over an n_train-image bank with the repo's real
    CIFAR10 scales (8 distinct kernel sizes). Uses the circular-ELS module:
    the bbELS program's 9-region body costs ~100 s of remote compile per
    kernel size in this environment, which busts the bench window; its
    steady-state throughput is within ~25% of ELS (PERFORMANCE.md)."""
    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.scores import (
        LocalEquivScoreModule,
        ScheduledScoreMachine,
    )

    scales = [3, 3, 3, 3, 5, 5, 5, 7, 7, 7, 7, 9, 9, 11, 11, 13, 15, 17, 17, 17]
    ds = synthetic_dataset(num_samples=n_train, image_size=32, num_channels=3)
    mod = LocalEquivScoreModule(
        (ds.images, ds.labels), batch_size=256, max_samples=max_samples,
        target_block=16384,
    )
    machine = ScheduledScoreMachine(mod, in_channels=3, imsize=32, scales=scales)
    x = jax.random.normal(jax.random.PRNGKey(3), (batch, 32, 32, 3))

    def run(x):
        return machine(x)

    dt, _ = time_fn(run, x, warmup=1, iters=1)
    return batch / dt


def main():
    # Headline: bf16-MXU (TPU-native). The fp32 parity config is ~5.4x
    # slower (see PERFORMANCE.md); it is not re-measured here because each
    # extra jit variant costs ~3 min of remote compile in this environment.
    ddpm_ips = bench_ddpm(precision=None)
    details = {"ddpm_1000step_images_per_sec_bf16mxu": round(ddpm_ips, 3)}
    try:
        els_ips = bench_els()
        details["els_20step_2048bank_images_per_sec"] = round(els_ips, 4)
    except Exception as e:  # pragma: no cover
        details["els_error"] = repr(e)

    vs = None
    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get("ddpm_1000step_images_per_sec")
        if ref:
            vs = round(ddpm_ips / ref, 3)
            details["baseline_source"] = base.get("source", "torch reference")

    print(
        json.dumps(
            {
                "metric": "cifar10_ddpm_1000step_sampling_throughput",
                "value": round(ddpm_ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": vs,
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
