"""Orbax checkpointing: params + optimizer state + step.

Fixes the reference's no-optimizer-resume gap (it pickles whole nn.Modules,
src/utils/train.py:62-63, losing AdamW moments). Filenames keep the
reference's `backbone_{DS}_{Model}_{mode}[_conditional]` naming convention
(training_script.py:47-61) so downstream auto-detection globs keep working.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "reference_checkpoint_name"]


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(directory: str, *, params, opt_state=None, step: int = 0,
                    epoch: Optional[int] = None, extra: Optional[Dict] = None):
    """Save a composite checkpoint under `directory/step_{step}`."""
    ocp = _ocp()
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"step_{step}")
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    meta = {"step": step}
    if epoch is not None:
        meta["epoch"] = epoch
    if extra:
        meta.update(extra)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"state": payload, "meta": meta}, force=True)
    return path


def restore_checkpoint(path: str):
    """Restore {state: {params[, opt_state]}, meta} from `path` (a step dir
    or a directory containing step_* dirs — picks the latest)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    if not os.path.basename(path).startswith("step_") and os.path.isdir(path):
        def step_num(d):
            # skip non-numeric step_* entries — notably orbax's interrupted
            # -save temp dirs (step_N.orbax-checkpoint-tmp-<ts>)
            try:
                return int(d.split("_")[1])
            except ValueError:
                return None

        steps = sorted(
            (d for d in os.listdir(path) if step_num(d) is not None),
            key=step_num,
        )
        if steps:
            path = os.path.join(path, steps[-1])
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def reference_checkpoint_name(
    dataset: str, model: str, mode: str, *, conditional: bool = False,
    suffix: str = "",
) -> str:
    """`backbone_{DS}_{Model}_{mode}[_conditional]{suffix}` — the reference's
    artifact naming convention (training_script.py:47-61)."""
    name = f"backbone_{dataset}_{model}_{mode}"
    if conditional:
        name += "_conditional"
    return name + suffix
