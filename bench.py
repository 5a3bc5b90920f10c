#!/usr/bin/env python
"""Benchmark harness — prints JSON lines of the form
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "details": {...}}

A cumulative line is re-emitted after every completed measurement (the
driver reads the LAST line, so a wall-clock kill loses only the unfinished
tail of `details`, never the headline).

Headline metric (BASELINE.json): CIFAR10 images/sec/chip for 1000-step DDPM
sampling on the flagship model (8-layer emb-256 conditional MinimalResNet,
the README recipe), measured over 3 fenced iterations with MFU reported.
Details include the fp32-parity DDPM number and the REFERENCE-SCALE analytic
machines: 20-step ELS and bbELS over a full 50k-image (CIFAR10-sized) bank
with the repo's calibrated CIFAR10 scales — the els_script.py:44 workload —
at BOTH tiers (bf16x3 'high' throughput AND fp32 'highest' parity), plus the
MNIST 60k-bank machine and the b32 per-chip capacity row (one streaming
--els-suite subprocess, see bench_els_suite). The default profile self-limits
to BENCH_TOTAL_BUDGET_S (2550 s ~= 42 min — the r04 driver window covered
36+ min of work before its external kill) so it exits rc=0 inside the
driver's wall cap, and orders stages by information value so a slow-tunnel
day truncates the least-new keys first: headline DDPM -> the five-machine
ELS suite -> calibration -> cheap regression repeats (fp32 DDPM, train,
capacity, 64x64 DDPM — all already in BENCH_r03/r04). BENCH_FULL=1 adds the
extended tail (fast tier, fp32 bbELS, bbELS capacity, BENCH_CELEBA64 for
the 64x64 machine).

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

if os.environ.get("BENCH_FORCE_CPU"):  # harness smoke-testing only
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

# persistent compile cache: the first run pays the remote compiles,
# subsequent runs hit the cache. Configured from the __main__ entry (not at
# import time) so importing bench from the test suite doesn't repoint the
# conftest's test cache.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _setup_compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

V5E_PEAK_TFLOPS = 197.0  # bf16 MXU nominal
# analytic FLOPs of one flagship forward per image per step: 8 residual convs
# 256->256 3x3 on 32x32 + up/down projections + embedding MLPs
FLAGSHIP_FLOPS_PER_IMG_STEP = (
    8 * 2 * 256 * 256 * 9 * 32 * 32
    + 2 * 3 * 256 * 9 * 32 * 32
    + 2 * 256 * 3 * 9 * 32 * 32
    + 9 * 2 * 256 * 256
)
CIFAR10_SCALES = [3, 3, 3, 3, 5, 5, 5, 7, 7, 7, 7, 9, 9, 11, 11, 13, 15, 17, 17, 17]
# BASELINE.md CelebA_UNet_zeros row — the 64x64 workload (k up to 27, the
# large-d kernel regime); env-gated in the variant list (BENCH_CELEBA64=1)
# because one machine call is ~20+ min of pure compute at 50k images.
CELEBA64_SCALES = [3, 3, 3, 3, 3, 3, 3, 5, 5, 5, 5, 5, 7, 7, 9, 9, 9, 13, 19, 27]
# BASELINE.md MNIST_ResNet_zeros row — the reference's grayscale workload.
# The reference resizes MNIST to 32x32 (/root/reference/src/utils/data.py:66)
# so the bank is 60k images x (33-k)^2 positions at c=1 (d = k^2).
MNIST_SCALES = [3, 3, 5, 5, 5, 7, 7, 7, 9, 9, 11, 11, 11, 11, 13, 15, 15, 15, 15, 15]

# workload token -> (imsize, channels, default bank images, scales)
ELS_WORKLOADS = {
    "32": (32, 3, 50000, CIFAR10_SCALES),
    "64": (64, 3, 50000, CELEBA64_SCALES),
    "mnist": (32, 1, 60000, MNIST_SCALES),
}


def time_fn(fn, *args, warmup=1, iters=1):
    # NOTE: force a device->host transfer to fence each iteration — on this
    # image's remote-TPU (axon) platform, block_until_ready returns before
    # execution finishes, which inflates throughput ~1000x. (Cross-checked:
    # two data-dependent chained 1000-step sampler calls take exactly 2x one
    # call — see PERFORMANCE.md "Measurement methodology".)
    import numpy as _np

    for _ in range(warmup):
        _np.asarray(jax.device_get(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _np.asarray(jax.device_get(fn(*args)))
    return (time.perf_counter() - t0) / iters, out


def bench_ddpm(batch=64, nsteps=1000, precision=None, iters=3):
    """precision=None -> TPU-native bf16 MXU matmuls with fp32 accumulation;
    precision='highest' -> full fp32 (the parity configuration)."""
    batch = int(os.environ.get("BENCH_DDPM_BATCH", batch))  # smoke-test knob
    nsteps = int(os.environ.get("BENCH_DDPM_STEPS", nsteps))
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
        # scalar reduce so the fence doesn't pay the ~30 MB/s tunnel
        return sampler(params, x0, labels, key=jax.random.PRNGKey(2)).sum()

    dt, _ = time_fn(run, params, x0, labels, warmup=1, iters=iters)
    ips = batch / dt
    tflops = FLAGSHIP_FLOPS_PER_IMG_STEP * batch * nsteps / dt / 1e12
    return ips, tflops


def bench_ddpm64(batch=32, nsteps=1000, iters=3):
    """64x64 UNet sampling — the reference's second flagship config
    (training_script_64x64.py: CelebA, MinimalUNet fsizes [64,128,256,512],
    zeros mode, conditional). Reported as images/sec (no MFU: a UNet's
    analytic FLOP count is config-shaped and easy to get subtly wrong;
    the ResNet headline already pins MFU)."""
    batch = int(os.environ.get("BENCH_DDPM64_BATCH", batch))
    nsteps = int(os.environ.get("BENCH_DDPM64_STEPS", nsteps))
    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalUNet
    from convolutional_diffusion_tpu.sampling import make_sampler

    net = MinimalUNet(
        channels=3, fsizes=(64, 128, 256, 512), mode="zeros",
        conditional=True, num_classes=2, lastksize=3,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=64)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)
    sampler = make_sampler(model, nsteps=nsteps, ddpm=True)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 64, 3))
    labels = jnp.zeros((batch,), jnp.int32)

    def run(params, x0, labels):
        return sampler(params, x0, labels, key=jax.random.PRNGKey(2)).sum()

    dt, _ = time_fn(run, params, x0, labels, warmup=1, iters=iters)
    return batch / dt


def _els_machine(kind, n_train, batch_size, precision, workload="32"):
    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.scores import (
        LocalEquivBordersScoreModule,
        LocalEquivScoreModule,
        ScheduledScoreMachine,
    )

    imsize, channels, _, scales = ELS_WORKLOADS[workload]
    ds = synthetic_dataset(num_samples=n_train, image_size=imsize,
                           num_channels=channels)
    cls = LocalEquivScoreModule if kind == "ELS" else LocalEquivBordersScoreModule
    mod = cls(
        (ds.images, ds.labels), batch_size=batch_size,
        target_block=int(os.environ.get("BENCH_ELS_BLOCK", 65536)),
        precision=precision,
    )
    return ScheduledScoreMachine(mod, in_channels=channels, imsize=imsize,
                                 scales=scales)


def bench_els(kind="ELS", batch=None, n_train=None, precision="highest",
              workload="32"):
    """20-step machine over the FULL training-set bank with the repo's real
    calibrated scales (8 distinct kernel sizes) — the reference els_script
    workload (numiters over the whole training set). One warmup machine call
    (pays the 8 per-k jit variants — ~6 min cold on the remote-compile
    tunnel, seconds when the persistent cache is hot) then one timed call on
    `batch` seeds (~minutes of pure compute at this scale; per-call noise is
    negligible over a run this long)."""
    imsize, channels, n_default, _ = ELS_WORKLOADS[workload]
    batch = batch or int(os.environ.get("BENCH_ELS_BATCH", 8))
    n_train = n_train or int(os.environ.get("BENCH_ELS_NTRAIN", n_default))
    machine = _els_machine(kind, n_train, 256, precision, workload=workload)
    x = jax.random.normal(jax.random.PRNGKey(3),
                          (batch, imsize, imsize, channels))

    def run(x):
        return machine(x).sum()

    dt, _ = time_fn(run, x, warmup=1, iters=1)
    return batch / dt


def _prime_machine(machine, x):
    """Prime every per-k step program of `machine` at seed batch `x` with
    ONE backbone call per distinct kernel size. Valid because t crosses the
    module's jit boundary as a traced array (els.py `_as_scalar_t` -> at/bt
    operands), so the program cache key is (k, x.shape) only — one call per
    distinct k dispatches exactly the programs the timed 20-step call will
    reuse, at ~40% of a full warmup machine call (the k-repeat steps are
    free). scales[0] is skipped: the machine loop runs i = nsteps-1 .. 1 and
    never evaluates scales[0] (machine.py step loop / idealscore.py:88).

    The backbone calls do NOT touch the machine's eager step-glue programs
    (schedule scalars, eps scaling, ddim_step, jnp.full, the .sum fence) —
    a 2-step machine call at scales[1] (the cheapest k) primes those too.
    Measured round 5: without it the FIRST suite item pays the glue's
    tunnel first-dispatch inside its timed call (0.1023 vs 0.1199 img/s
    on the flagship ELS key)."""
    import numpy as _np

    for k in sorted(set(machine.scales[1:])):
        _np.asarray(jax.device_get(machine.backbone(0.5, x, k=k).sum()))
    _np.asarray(jax.device_get(machine(x, nsteps=2).sum()))


# (tag, kind, precision, seed batch, workload, est. warm-path seconds).
# Ordered by information value under a slow-tunnel deadline truncation
# (the round-5 rehearsal lost its tail to one): the fp32-parity ELS and
# bbELS keys first (VERDICT r4 ask #1 — never yet in a driver artifact),
# then the flagship bf16x3 key (continuity with BENCH_r04), then the b32
# capacity row ADJACENT to it (same module config -> the suite reuses the
# machine and skips a 50k bank rebuild), the cheap MNIST row last (most
# likely to still fit late). Estimates are the measured per-call rates
# (PERFORMANCE.md / tools/measure_round3_out.json) plus bank-build + prime
# overhead, used ONLY for deadline gating.
ELS_SUITE = [
    ("els_20step_50kbank_images_per_sec_fp32", "ELS", "highest", 8, "32", 330),
    ("bbels_20step_50kbank_images_per_sec_bf16x3", "bbELS", "high", 8, "32", 360),
    ("els_20step_50kbank_images_per_sec_bf16x3", "ELS", "high", 8, "32", 330),
    ("els_20step_50kbank_capacity_b32_images_per_sec_bf16x3", "ELS", "high", 32, "32", 400),
    ("els_20step_60kbank_mnist_images_per_sec_bf16x3", "ELS", "high", 8, "mnist", 210),
]


def bench_els_suite():
    """All driver-profile analytic-machine keys in ONE subprocess, streaming
    one JSON line per completed measurement ({"tag", "value", "sec"} — the
    parent folds them into `details` as they arrive, so a wall-clock kill
    loses only the unfinished tail). Sharing the process amortizes
    interpreter + backend startup and the tunnel's time-to-first-result
    noise across five keys (five separate --els-only subprocesses each pay
    ~2-6 min of it).

    Each item: build module+machine (REUSED when consecutive items share the
    same (kind, precision, workload, n_train) config — the b8 flagship and
    b32 capacity rows share one 50k bank build), prime the per-k programs
    AND the eager step-glue (_prime_machine), ONE timed full 20-step machine
    call. At most one machine is alive at a time (several per-k HBM bank
    sets at once would flirt with the 16 GB chip budget).
    BENCH_SUITE_BUDGET_S bounds the whole suite: items whose estimate no
    longer fits are reported skipped. BENCH_SUITE_ITEMS (comma-separated
    exact tags) restricts the run for targeted re-measurement."""
    import numpy as _np

    budget = float(os.environ.get("BENCH_SUITE_BUDGET_S", 1e9))
    only = os.environ.get("BENCH_SUITE_ITEMS")
    only = {t.strip() for t in only.split(",")} if only else None
    deadline = time.perf_counter() + budget
    machine = None
    machine_key = None
    for tag, kind, precision, batch, workload, est in ELS_SUITE:
        if only is not None and tag not in only:
            continue
        if time.perf_counter() + est > deadline:
            print(json.dumps({"tag": tag, "skipped": "over suite budget"}),
                  flush=True)
            continue
        try:
            imsize, channels, n_default, _ = ELS_WORKLOADS[workload]
            n_train = int(os.environ.get("BENCH_ELS_NTRAIN", n_default))
            key = (kind, precision, workload, n_train)
            if machine_key != key:
                machine = None  # free the old banks before building new ones
                machine = _els_machine(kind, n_train, 256, precision,
                                       workload=workload)
                machine_key = key
            x = jax.random.normal(jax.random.PRNGKey(3),
                                  (batch, imsize, imsize, channels))
            _prime_machine(machine, x)
            t0 = time.perf_counter()
            _np.asarray(jax.device_get(machine(x).sum()))
            dt = time.perf_counter() - t0
            print(json.dumps({"tag": tag, "value": batch / dt,
                              "sec": round(dt, 1)}), flush=True)
        except Exception as e:  # pragma: no cover
            machine = None
            machine_key = None
            print(json.dumps({"tag": tag, "error": repr(e)[:300]}),
                  flush=True)


def bench_calibration():
    """Full README calibration recipe (reference scales_calibration.py:199-206:
    --kernelsizes 3..17 odd, --nsteps 20, --nsamps 10, maxsamps 5000): one
    batched-seeds calibrate() call over eight ELS modules sharing one
    BankLedger — the BASELINE.json north-star redesign (the reference runs
    10 seeds x 20 steps x 9 sequential full-dataset sweeps). Returns wall
    seconds for the whole recipe (a time, not a rate: the recipe is a fixed
    unit of work)."""
    from convolutional_diffusion_tpu.calibration import calibrate
    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
    from convolutional_diffusion_tpu.scores import LocalEquivScoreModule
    from convolutional_diffusion_tpu.scores.bank import BankLedger

    n = int(os.environ.get("BENCH_CALIB_NTRAIN", 5000))
    nsamps = int(os.environ.get("BENCH_CALIB_NSAMPS", 10))
    ds = synthetic_dataset(num_samples=n, image_size=32, num_channels=3)
    ledger = BankLedger(8 << 30)
    mods = {
        k: LocalEquivScoreModule(
            (ds.images, ds.labels), batch_size=16,
            schedule=cosine_noise_schedule, bank_ledger=ledger,
        )
        for k in (3, 5, 7, 9, 11, 13, 15, 17)
    }
    net = MinimalResNet(
        channels=3, emb_dim=256, num_layers=8, mode="zeros", conditional=False,
        kernel_size=3, lastksize=3, precision=None,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=32)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)

    def eps_fn(t, x, label):
        return model.apply(params, t, x, None)

    t0 = time.perf_counter()
    calibrate(
        eps_fn, mods, image_size=32, in_channels=3, nsamps=nsamps, nsteps=20,
        conditional=False, key=jax.random.PRNGKey(5),
    )
    return time.perf_counter() - t0


def bench_train(batch=128, iters=20):
    """One flagship training step (fwd+bwd+AdamW), README recipe batch 128."""
    batch = int(os.environ.get("BENCH_TRAIN_BATCH", batch))  # smoke-test knob
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", iters))
    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
    from convolutional_diffusion_tpu.training import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )

    net = MinimalResNet(
        channels=3, emb_dim=256, num_layers=8, mode="zeros", conditional=True,
        num_classes=10, kernel_size=3, lastksize=3, precision=None,
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=32)
    params = model.init(jax.random.PRNGKey(0), batch_size=1)
    config = TrainConfig(batch_size=batch)
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, conditional=True)
    ds = synthetic_dataset(num_samples=batch, image_size=32, num_channels=3)
    imgs, labs = jnp.asarray(ds.images), jnp.asarray(ds.labels)

    def run(params, opt_state):
        key = jax.random.PRNGKey(7)
        for i in range(iters):  # chained: each step consumes the previous
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, imgs, labs, sub)
        return loss

    import numpy as _np

    # donated buffers: rebuild fresh state per timing call
    p1 = jax.tree_util.tree_map(jnp.array, params)
    o1 = optimizer.init(p1)
    _np.asarray(jax.device_get(run(p1, o1)))  # warmup (compile)
    p2 = jax.tree_util.tree_map(jnp.array, params)
    o2 = optimizer.init(p2)
    t0 = time.perf_counter()
    _np.asarray(jax.device_get(run(p2, o2)))
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    # The driver runs this under a wall-clock cap and reads the LAST JSON
    # line of stdout. A cumulative line is therefore re-emitted (flushed)
    # after EVERY completed measurement: a timeout loses only the unfinished
    # tail items, never the headline (round 2 lost everything to rc=124).
    details = {}
    vs = None
    t_main = time.perf_counter()

    def emit(headline_ips):
        # elapsed-since-main per emit: lets a truncated artifact show where
        # the wall clock went (the r04->r05 profile sizing had to be
        # reconstructed from builder logs without this)
        details["bench_elapsed_s"] = int(time.perf_counter() - t_main)
        print(
            json.dumps(
                {
                    "metric": "cifar10_ddpm_1000step_sampling_throughput",
                    "value": round(headline_ips, 3),
                    "unit": "images/sec/chip",
                    "vs_baseline": vs,
                    "details": details,
                }
            ),
            flush=True,
        )

    cache_warm = os.path.isdir(_cache_dir) and bool(os.listdir(_cache_dir))
    if not cache_warm:
        # a cold cache pays minutes of remote compiles per jit variant; the
        # driver's window may only cover the headline — note it for the log
        details["cold_compile_cache"] = True

    # Backend availability gate. The remote-TPU (axon) tunnel has real
    # outages (hours, observed round 3); backend init inside THIS process
    # would then block indefinitely and the run would produce ZERO output
    # (the round-2 failure mode, BENCH_r02 rc=124/parsed=null). Probe in a
    # bounded subprocess and, while the TPU is unreachable, keep an honest
    # error line on stdout so the driver always has something to parse.
    if not os.environ.get("BENCH_FORCE_CPU"):
        import subprocess as _sp

        probe_src = ("import jax, jax.numpy as jnp;"
                     "print(jax.device_get(jnp.ones((4,)).sum()))")
        wait_budget = float(os.environ.get("BENCH_TPU_WAIT_S", 3600))
        probe_s = float(os.environ.get("BENCH_TPU_PROBE_S", 600))
        t_probe = time.perf_counter()
        attempt = 0
        while True:
            attempt += 1
            try:
                _sp.run([sys.executable, "-c", probe_src], timeout=probe_s,
                        check=True, capture_output=True)
                details.pop("tpu_unavailable_error", None)
                break
            except Exception:
                waited = time.perf_counter() - t_probe
                details["tpu_unavailable_error"] = (
                    f"TPU backend unreachable after {attempt} bounded "
                    f"probe(s), {waited:.0f}s waited — headline 0.0 is an "
                    "availability artifact, not a measurement")
                emit(0.0)
                if waited > wait_budget:
                    return
                time.sleep(30)

    # Post-probe wedge watchdog. Observed round 5 on hardware: the probe
    # succeeded, then the tunnel died DURING the in-process headline phase
    # and the blocked device_get hung the harness for 40+ min — the driver
    # would have recorded rc=124 with value 0.0. Subprocess stages are
    # already bounded; this covers the in-process ones (headline, gated
    # tail): if main() is still alive well past the self-budget, emit the
    # completed keys with an honest note and exit 0 from the timer thread
    # (the wedged main thread is blocked in a device_get and cannot be
    # interrupted; it is also not writing to stdout, so the watchdog's
    # single buffered write cannot tear a line). Disabled under BENCH_FULL
    # (the opt-in extended tail intentionally runs past the budget).
    import threading as _threading

    watchdog_s = float(
        os.environ.get(
            "BENCH_WATCHDOG_S",
            1e9 if os.environ.get("BENCH_FULL")
            else float(os.environ.get("BENCH_TOTAL_BUDGET_S", 2550)) + 240.0,
        )
    )

    def _watchdog_fire():
        details["watchdog_fired"] = (
            f"in-process stage still running {int(time.perf_counter() - t_main)}s "
            "in (wedged tunnel?) — emitting completed keys and exiting 0")
        emit(details.get("ddpm_1000step_images_per_sec_bf16mxu", 0.0))
        os._exit(0)

    _watchdog = _threading.Timer(watchdog_s, _watchdog_fire)
    _watchdog.daemon = True
    _watchdog.start()

    # Headline: bf16-MXU (TPU-native), 3 fenced iterations.
    ddpm_ips, tflops = bench_ddpm(precision=None)
    details["ddpm_1000step_images_per_sec_bf16mxu"] = round(ddpm_ips, 3)
    details["ddpm_sustained_tflops"] = round(tflops, 1)
    details["ddpm_mfu_vs_197tflops_peak"] = round(tflops / V5E_PEAK_TFLOPS, 3)

    baseline_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get("ddpm_1000step_images_per_sec")
        if ref:
            vs = round(ddpm_ips / ref, 3)
            details["baseline_source"] = base.get("source", "torch reference")
    emit(ddpm_ips)

    import subprocess
    import sys as _sys

    # Global wall-clock deadline: the driver runs bench.py under an external
    # wall cap (rc=124 four rounds running). The default profile SELF-limits
    # to BENCH_TOTAL_BUDGET_S (~35 min) measured from main() entry: every
    # stage is gated on a measured warm-path cost estimate and skipped (with
    # a *_skipped note) once it no longer fits, so the process exits rc=0
    # with a complete artifact instead of being killed mid-measurement.
    budget_s = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 2550))
    deadline = t_main + budget_s

    def remaining():
        return deadline - time.perf_counter()

    def run_subproc(argv_tail, tag, timeout):
        """One measurement in a bounded subprocess (a wedged compile tunnel
        must not hang the harness); records `tag` or `tag_error`."""
        try:
            proc = subprocess.run(
                [_sys.executable, os.path.abspath(__file__)] + argv_tail,
                capture_output=True, text=True, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            sub = json.loads(line)
            if "value" in sub:
                details[tag] = round(float(sub["value"]), 4)
            else:
                details[tag + "_error"] = sub.get("error", proc.stderr[-300:])
        except subprocess.TimeoutExpired:
            details[tag + "_error"] = f"timeout after {timeout:.0f}s"
        except Exception as e:  # pragma: no cover
            details[tag + "_error"] = repr(e)[:300]
        emit(ddpm_ips)

    # PRIORITY: the full-50k analytic-machine keys — the framework's
    # flagship metric family (BASELINE.json metric 2, the els_script.py:44
    # workload at its bf16x3 AND fp32-parity tiers, one bbELS key, the
    # MNIST 60k-bank machine, and the b32 per-chip capacity row). One
    # streaming subprocess measures all five (see bench_els_suite); results
    # are folded into `details` and re-emitted AS THEY ARRIVE, so even a
    # driver kill mid-suite keeps every completed key. The suite gets ALL
    # remaining budget: on a slow-tunnel day these five keys outrank every
    # stage behind them (calibration and the cheap tail are regression
    # repeats of keys already in BENCH_r03/r04).
    def run_els_suite():
        suite_budget = max(0.0, remaining() - 20.0)
        env = dict(os.environ, BENCH_SUITE_BUDGET_S=str(suite_budget))
        proc = subprocess.Popen(
            [_sys.executable, os.path.abspath(__file__), "--els-suite"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
        )
        import threading

        timer = threading.Timer(suite_budget + 240.0, proc.kill)
        timer.start()
        try:
            for line in proc.stdout:
                line = line.strip()
                if not line:
                    continue
                try:
                    sub = json.loads(line)
                except ValueError:
                    continue
                tag = sub.get("tag")
                if not tag:
                    continue
                if "value" in sub:
                    details[tag] = round(float(sub["value"]), 4)
                    if "sec" in sub:  # wall s per key: sizes future profiles
                        details[tag + "_wall_s"] = int(sub["sec"])
                elif "skipped" in sub:
                    details[tag + "_skipped"] = sub["skipped"]
                else:
                    details[tag + "_error"] = sub.get("error", "?")[:300]
                emit(ddpm_ips)
            proc.wait()
        finally:
            timer.cancel()

    run_els_suite()

    # Scales calibration, full README recipe — the BASELINE.json north-star
    # redesign (~130 s warm / 214.7 s in the r04 driver artifact; the
    # reference runs 10 seeds x 20 steps x 9 sequential full-dataset sweeps
    # for the same artifact). Runs AFTER the suite: it already has a driver
    # record, the suite keys don't. The timeout is capped at 900 s so a
    # slow-tunnel anomaly (712 s timeout observed in the round-5 rehearsal)
    # can't eat the whole remaining window.
    if remaining() > 80:
        run_subproc(["--calib-only"], "calibration_full_recipe_seconds",
                    min(remaining() + 60,
                        float(os.environ.get("BENCH_CALIB_TIMEOUT_S", 900))))
    else:
        details["calibration_full_recipe_seconds_skipped"] = "over budget"
        emit(ddpm_ips)

    # Cheap inline stages (each ~1-2 min warm; skipped with a note once the
    # global budget no longer covers its estimate — they are regression
    # repeats of keys already in BENCH_r03/r04, so they yield first).
    def gated(tag, est, fn):
        if remaining() < est:
            details[tag + "_skipped"] = "over budget"
        else:
            try:
                fn()
            except Exception as e:  # pragma: no cover
                details[tag + "_error"] = repr(e)[:300]
        emit(ddpm_ips)

    def _fp32():
        # fp32 'highest' — the <1e-3 torch-parity configuration
        fp32_ips, fp32_tflops = bench_ddpm(precision="highest", iters=3)
        details["ddpm_1000step_images_per_sec_fp32_parity"] = round(fp32_ips, 3)
        details["ddpm_fp32_sustained_tflops"] = round(fp32_tflops, 1)

    gated("ddpm_fp32", 130, _fp32)

    # training throughput (flagship recipe, batch 128, bf16 MXU)
    gated("train", 140, lambda: details.__setitem__(
        "train_step_images_per_sec", round(bench_train(), 1)))

    # per-chip training CAPACITY: batch 512 is the measured knee of the
    # batch sweep (tools/measure_train.py — +7.6% over the recipe batch,
    # b1024 adds only +1.3% more at 2x the latency). The recipe figure
    # above stays the headline; this is the throughput-optimal point.
    gated("train_capacity", 140, lambda: details.__setitem__(
        "train_step_capacity_b512_images_per_sec", round(bench_train(batch=512), 1)))

    # 64x64 UNet sampling (the second flagship config) — also cheap
    gated("ddpm64", 100, lambda: details.__setitem__(
        "ddpm64_unet_1000step_images_per_sec_bf16mxu", round(bench_ddpm64(), 3)))

    # Extended tail — explicit opt-in (BENCH_FULL=1): the fast-tier A/B
    # regression record, the fp32 bbELS machine, bbELS per-chip capacity,
    # and (BENCH_CELEBA64=1) the 64x64 CelebA machine (~25 min of pure
    # compute per call). These are measured and recorded in PERFORMANCE.md;
    # the default driver-sized profile above ends at ddpm64 with rc=0.
    if os.environ.get("BENCH_FULL"):
        variants = [
            ("ELS", "default", 0, "32", "els_20step_50kbank_images_per_sec_fast"),
            ("bbELS", "highest", 0, "32", "bbels_20step_50kbank_images_per_sec_fp32"),
            ("bbELS", "high", 32, "32", "bbels_20step_50kbank_capacity_b32_images_per_sec_bf16x3"),
        ]
        if os.environ.get("BENCH_CELEBA64"):
            variants.append(
                ("ELS", "high", 0, "64",
                 "els64_20step_50kbank_celeba64_images_per_sec_bf16x3"))
        for kind, precision, batch, workload, tag in variants:
            run_subproc(["--els-only", kind, precision, str(batch), workload],
                        tag, float(os.environ.get("BENCH_ELS_TIMEOUT_S", 3600)))

    _watchdog.cancel()


if __name__ == "__main__":
    _setup_compile_cache()
    if len(sys.argv) >= 2 and sys.argv[1] == "--els-suite":
        # subprocess entry: ALL driver-profile analytic-machine keys,
        # one streaming JSON line per completed measurement
        bench_els_suite()
    elif len(sys.argv) >= 4 and sys.argv[1] == "--els-only":
        # subprocess entry: one ELS/bbELS variant, one JSON line on stdout;
        # argv[4] (optional) overrides the seed batch (0 = default/env),
        # argv[5] (optional) the workload token: "32" (CIFAR10, default),
        # "64" (CelebA_UNet 64x64), "mnist" (60k grayscale bank at 32x32)
        try:
            b = int(sys.argv[4]) if len(sys.argv) >= 5 else 0
            wl = sys.argv[5] if len(sys.argv) >= 6 else "32"
            ips = bench_els(sys.argv[2], batch=b or None,
                            precision=sys.argv[3], workload=wl)
            print(json.dumps({"value": ips}))
        except Exception as e:
            print(json.dumps({"error": repr(e)[:300]}))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--calib-only":
        # subprocess entry: the full README calibration recipe, one JSON
        # line {"value": <wall seconds>} on stdout
        try:
            print(json.dumps({"value": bench_calibration()}))
        except Exception as e:
            print(json.dumps({"error": repr(e)[:300]}))
    else:
        main()
