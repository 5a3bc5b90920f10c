"""The bench harness's machine-construction plumbing (not timing): the
subprocess entry points must build the right machine for each variant row,
including the opt-in 64x64 CelebA_UNet workload (BASELINE.md scales row)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_els_machine_cifar_default():
    m = bench._els_machine("ELS", 32, 16, "high")
    assert m.imsize == 32
    assert list(m.scales) == bench.CIFAR10_SCALES


def test_els_machine_celeba64():
    m = bench._els_machine("ELS", 16, 16, "high", workload="64")
    assert m.imsize == 64
    assert list(m.scales) == bench.CELEBA64_SCALES
    assert max(m.scales) == 27  # the large-d regime rows
    assert m.backbone.images.shape[1:] == (64, 64, 3)


def test_els_machine_mnist():
    # the reference's grayscale workload: MNIST resized to 32x32, c=1
    # (/root/reference/src/utils/data.py:66), MNIST_ResNet_zeros scales
    m = bench._els_machine("ELS", 16, 16, "high", workload="mnist")
    assert m.imsize == 32
    assert m.in_channels == 1
    assert list(m.scales) == bench.MNIST_SCALES
    assert m.backbone.images.shape[1:] == (32, 32, 1)


def test_celeba64_scales_match_baseline_row():
    # BASELINE.md CelebA_UNet_zeros: 20 entries, k in {3,5,7,9,13,19,27}
    s = bench.CELEBA64_SCALES
    assert len(s) == 20
    assert sorted(set(s)) == [3, 5, 7, 9, 13, 19, 27]


def test_mnist_scales_match_baseline_row():
    # BASELINE.md MNIST_ResNet_zeros: 20 entries, k in {3,5,7,9,11,13,15}
    s = bench.MNIST_SCALES
    assert len(s) == 20
    assert sorted(set(s)) == [3, 5, 7, 9, 11, 13, 15]
    assert bench.ELS_WORKLOADS["mnist"][:3] == (32, 1, 60000)


@pytest.mark.parametrize("kind", ["ELS", "bbELS"])
def test_els_machine_kind(kind):
    m = bench._els_machine(kind, 16, 16, "highest")
    name = type(m.backbone).__name__
    assert ("Borders" in name) == (kind == "bbELS")


def test_els_suite_covers_required_keys():
    # the driver-profile suite must carry the BASELINE.json metric-2 family:
    # both ELS tiers, one bbELS key, the MNIST 60k bank, and b32 capacity
    tags = [row[0] for row in bench.ELS_SUITE]
    assert "els_20step_50kbank_images_per_sec_bf16x3" in tags
    assert "els_20step_50kbank_images_per_sec_fp32" in tags
    assert any(t.startswith("bbels_") for t in tags)
    assert any("mnist" in t for t in tags)
    assert any("capacity_b32" in t for t in tags)
    # information-value order under deadline truncation: the fp32-parity
    # key (never in a driver artifact before r05) leads
    assert tags[0].endswith("_fp32")
    # the b8 flagship and b32 capacity rows are adjacent AND share the
    # machine config, so the suite reuses one 50k bank build
    i_b8 = tags.index("els_20step_50kbank_images_per_sec_bf16x3")
    i_b32 = tags.index("els_20step_50kbank_capacity_b32_images_per_sec_bf16x3")
    assert i_b32 == i_b8 + 1
    r8, r32 = bench.ELS_SUITE[i_b8], bench.ELS_SUITE[i_b32]
    assert (r8[1], r8[2], r8[4]) == (r32[1], r32[2], r32[4])


def test_els_suite_streams_skip_lines_under_zero_budget():
    """The parent folds suite lines into details AS THEY ARRIVE; with a zero
    budget every item must stream a {"tag", "skipped"} line and exit 0 —
    pins the streaming contract without paying any machine compute."""
    import json as _json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_SUITE_BUDGET_S="0")
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "bench.py"), "--els-suite"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [_json.loads(ln) for ln in proc.stdout.strip().splitlines() if ln]
    assert [d["tag"] for d in lines] == [row[0] for row in bench.ELS_SUITE]
    assert all("skipped" in d for d in lines)


def test_els_suite_items_filter():
    """BENCH_SUITE_ITEMS restricts the suite to the named tags (targeted
    re-measurement); unnamed items are silently omitted, not 'skipped'."""
    import json as _json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pick = bench.ELS_SUITE[1][0]
    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_SUITE_BUDGET_S="0",
               BENCH_SUITE_ITEMS=pick)
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "bench.py"), "--els-suite"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [_json.loads(ln) for ln in proc.stdout.strip().splitlines() if ln]
    assert [d["tag"] for d in lines] == [pick]


def test_watchdog_emits_and_exits_zero():
    """A wedged in-process stage (observed round 5: the tunnel died during
    the headline's device_get and hung the harness 40+ min) must not turn
    into rc=124/value-0.0: the post-probe watchdog emits the completed keys
    with an honest note and exits 0 from its timer thread."""
    import json as _json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # big CPU headline so the watchdog (1 s) fires mid-measurement
    env = dict(os.environ, BENCH_FORCE_CPU="1", BENCH_WATCHDOG_S="1",
               BENCH_DDPM_BATCH="64", BENCH_DDPM_STEPS="1000")
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    last = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert "watchdog_fired" in last["details"], last
    """_prime_machine dispatches one backbone call per distinct k (skipping
    the never-executed scales[0]) plus one 2-step machine call for the eager
    step-glue, and must not perturb the subsequent timed machine call:
    primed == fresh bit-for-bit."""
    import jax
    import numpy as np

    from convolutional_diffusion_tpu.data import synthetic_dataset
    from convolutional_diffusion_tpu.scores import (
        LocalEquivScoreModule,
        ScheduledScoreMachine,
    )

    ds = synthetic_dataset(num_samples=8, image_size=12, num_channels=1)
    scales = [7, 3, 5, 3]  # scales[0]=7 is never executed by the machine

    def make():
        mod = LocalEquivScoreModule((ds.images, ds.labels), batch_size=8)
        return ScheduledScoreMachine(mod, in_channels=1, imsize=12,
                                     scales=scales)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 12, 12, 1))
    primed = make()
    bench._prime_machine(primed, x)
    fresh = make()
    np.testing.assert_array_equal(np.asarray(primed(x)), np.asarray(fresh(x)))
