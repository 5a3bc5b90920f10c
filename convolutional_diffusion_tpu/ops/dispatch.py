"""Dispatch segmentation: bound the wall-clock of a single device execution.

Measured on this image's remote (axon) TPU tunnel, round 3: a single XLA
execution that runs longer than ~60 s kills the worker process
("UNAVAILABLE: TPU worker process crashed or restarted") — a 57.6 s ELS
machine step completes, a ~72 s one (k=7, 64x64, 50k images, batch 8)
reproducibly does not, with identical kernel shapes at smaller scales
passing. Production TPU runtimes do not impose this, but bounded dispatch
is good hygiene regardless (preemption windows, progress visibility), so
the score modules split long dataset sweeps into several back-to-back
executions with the online-softmax state carried on device between them.
Splitting a `lax.scan` over dataset chunks at chunk boundaries is
BIT-EXACT: the scan is sequential, so two chained half-scans compute the
identical op sequence.

The segment count comes from a conservative duration estimate:
pairs / rate, with rates the round-3 MACHINE-CONTEXT measurements
(tools/measure_round3_out.json per_k — these matched true end-to-end
machine calls to <=1.5%, PERFORMANCE.md). Bucketed by padded patch
feature count dp; the bucket at/above dp is used (rates fall with dp, so
this overestimates duration). The target is half the watchdog.
"""

from __future__ import annotations

import math
import os

# Gpairs/s by (precision tier, padded d bucket) — measured at 50k scale,
# batch 8..32, v5e (the flash kernel block policy of flash_score.py).
# 'default' (fast mode) tracks 'high' within a few % end-to-end.
_RATE_BUCKETS = (128, 256, 384, 512, 896, 1152, 2048, 2304)
# The dp>=1152 buckets are provisional: the kernel-grid rates there were
# measured at the STANDALONE block policy, but the chunked path now caps
# block_p at those dp (flash_score.py scoped-VMEM fix) — assume ~20% below
# the grid numbers until the queued 64x64 machine rerun refreshes them
# (lower estimate => shorter, safer segments under the ~60 s watchdog).
_RATES = {
    "high": (125.0, 82.0, 60.0, 44.0, 26.0, 16.0, 11.0, 8.0),
    "default": (125.0, 82.0, 60.0, 44.0, 26.0, 16.0, 11.0, 8.0),
    "highest": (89.0, 51.0, 35.0, 28.0, 15.0, 10.0, 6.5, 4.0),
}
_RATE_FLOOR = {"high": 8.0, "default": 8.0, "highest": 4.0}


def est_gpairs_per_s(precision: str, dp: int) -> float:
    """Conservative sustained rate for one (query, patch) pair stream."""
    rates = _RATES.get(precision, _RATES["highest"])
    for bucket, rate in zip(_RATE_BUCKETS, rates):
        if dp <= bucket:
            return rate
    return _RATE_FLOOR.get(precision, 4.0)


def dispatch_target_s(override: float | None = None) -> float:
    """Per-execution wall-clock target. <= 0 disables segmentation."""
    if override is not None:
        return float(override)
    return float(os.environ.get("CDT_DISPATCH_TARGET_S", 30.0))


def plan_segments(
    total_pairs: float,
    *,
    precision: str,
    d: int,
    n_chunks: int,
    target_s: float | None = None,
    work_factor: float = 1.0,
) -> int:
    """Number of executions to split an n_chunks-step sweep into (>= 1).

    total_pairs: sum over the sweep of (query rows x patch rows);
    work_factor: multiplier for sweeps that do more than one kernel pass
    per pair (bbELS's border regions add roughly one extra pass at small
    k, fading at large k — 2.0 is used there, conservatively).
    """
    target = dispatch_target_s(target_s)
    if target <= 0 or n_chunks <= 1:
        return 1
    dp = ((d + 127) // 128) * 128
    rate = est_gpairs_per_s(precision, dp) * 1e9
    est = work_factor * total_pairs / rate
    return max(1, min(n_chunks, math.ceil(est / target)))
