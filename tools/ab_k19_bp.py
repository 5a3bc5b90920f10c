#!/usr/bin/env python
"""Hardware A/B for the chunked-path K-tile cap at k=19 64x64 (dp=1152).

PERFORMANCE.md round 3 left one open lever: the offline-AOT sweep found
bp=640/768 COMPILE at dp=1152 where the policy caps block_p at 512 (bp=1024
overflows the scoped-VMEM stack by 1.6M 'high' / 176K 'highest'). This
script times one in-scan machine step per bp at a reduced bank (n=12500,
~26.5M patches — the chunk-scan structure is identical to 50k, rates
transfer) and decides whether the cap moves.

Usage: python tools/ab_k19_bp.py <precision> <bp|default> [n]
Runs ONE variant per process (fresh jit trace per CDT_FLASH_BP).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

precision = sys.argv[1]
bp = sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) >= 4 else 12500

if bp != "default":
    os.environ["CDT_FLASH_BP"] = bp
else:
    # an inherited CDT_FLASH_BP would silently override the policy and
    # corrupt the baseline this branch exists to capture (ADVICE round 3)
    os.environ.pop("CDT_FLASH_BP", None)

from tools.measure_round3 import make_module, step_time  # noqa: E402

mod = make_module(n, precision=precision, imsize=64)
dt = step_time(mod, 19, 8, imsize=64)
P = n * (65 - 19) ** 2
gpairs = P * 8 * 4096 / dt / 1e9
print(json.dumps({"precision": precision, "bp": bp, "n": n,
                  "sec": round(dt, 2), "gpairs_per_s": round(gpairs, 2)}),
      flush=True)
