"""ELS sample generation + evaluation pipelines.

Counterparts of `/root/reference/scripts/els_script.py` (artifact layout,
resume, --fill) and `/root/reference/scripts/eval_script.py` (normalized
correlation metrics).

Artifact layout (identical to the reference):
    results/<expname>/seeds/%04d.<ext>
    results/<expname>/<idealname>/%04d.<ext>
    results/<expname>/labels/%04d.<ext>      (conditional)
Arrays are written as .npy (framework-native, torch-free) and read as either
.npy or the reference's .pt (torch) — so outputs produced by the torch
reference evaluate directly, and vice versa via fmt='pt'.

TPU-native notes:
 - seeds are drawn from a fold_in'd PRNG per index, so resume reproduces the
   exact remaining samples (the reference's resume re-rolls its RNG);
 - generation batches many seeds through the ScheduledScoreMachine at once
   (the machine lifts the reference's b=1 restriction);
 - evaluation runs the neural sampler on ALL seeds as one batch.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "save_array",
    "load_array",
    "generate_els_samples",
    "evaluate_correlations",
    "auto_detect_scales",
]


def save_array(path_noext: str, arr, fmt: str = "npy"):
    arr = np.asarray(arr)
    if fmt == "pt":
        import torch

        torch.save(torch.from_numpy(arr), path_noext + ".pt")
    else:
        np.save(path_noext + ".npy", arr)


def load_array(path_noext: str) -> Optional[np.ndarray]:
    """Load `%s.npy` or `%s.pt` (whichever exists)."""
    if os.path.exists(path_noext + ".npy"):
        return np.load(path_noext + ".npy")
    if os.path.exists(path_noext + ".pt"):
        import torch

        v = torch.load(path_noext + ".pt", map_location="cpu", weights_only=False)
        if hasattr(v, "numpy"):
            return v.detach().numpy()
        return np.asarray(v)
    return None


def _exists(path_noext: str) -> bool:
    return os.path.exists(path_noext + ".npy") or os.path.exists(path_noext + ".pt")


def _nchw_to_nhwc_if_needed(a: np.ndarray, channels: int) -> np.ndarray:
    """Reference artifacts are NCHW; ours NHWC. Disambiguate by channel axis."""
    if a.ndim == 4 and a.shape[1] == channels and a.shape[-1] != channels:
        return a.transpose(0, 2, 3, 1)
    return a


def auto_detect_scales(checkpoints_dir: str, dataset_name: str) -> str:
    """Reference auto-detection order (els_script.py:99-117)."""
    up = dataset_name.upper()
    candidates = [
        f"scales_{up}_ResNet_zeros_conditional.pt",
        f"scales_{up}_ResNet_zeros.pt",
        f"scales_{up}_UNet_zeros_conditional.pt",
        f"scales_{up}_UNet_zeros.pt",
    ]
    # also accept .npy/.json exports of the same names
    for c in candidates:
        for name in (c, c.replace(".pt", ".npy"), c.replace(".pt", ".json")):
            p = os.path.join(checkpoints_dir, name)
            if os.path.exists(p):
                return p
    raise FileNotFoundError(
        f"no scales file for {dataset_name} in {checkpoints_dir} "
        f"(looked for {candidates})"
    )


def generate_els_samples(
    machine,
    out_dir: str,
    *,
    numiters: int = 100,
    in_channels: int = 3,
    image_size: int = 32,
    conditional: bool = False,
    nlabels: int = 10,
    idealname: str = "els_outputs",
    fill: bool = False,
    force_overwrite: bool = False,
    batch: int = 1,
    fmt: str = "npy",
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
) -> int:
    """Generate machine outputs under `out_dir` with the reference layout.

    Returns the number of NEW samples produced. Resume: scans for the first
    index missing either its seed or output (els_script.py:170-190). Fill:
    reuse existing seeds (and labels) to produce outputs for a different
    score type (els_script.py:145-166).
    """
    seed_dir = os.path.join(out_dir, "seeds")
    out_path = os.path.join(out_dir, idealname)
    lab_dir = os.path.join(out_dir, "labels")
    key = jax.random.PRNGKey(seed)

    produced = 0
    if fill:
        if not os.path.isdir(out_dir) or not os.path.isdir(seed_dir):
            raise FileNotFoundError(f"required directories missing: {seed_dir}")
        os.makedirs(out_path, exist_ok=True)
        # collect the missing indices with their seeds/labels first, then
        # run the machine in `batch`-sized groups exactly like the non-fill
        # loop below (one seed per sweep wastes the batched machine design)
        todo = []
        i = 0
        while _exists(os.path.join(seed_dir, f"{i:04d}")):
            if not _exists(os.path.join(out_path, f"{i:04d}")):
                s = _nchw_to_nhwc_if_needed(
                    load_array(os.path.join(seed_dir, f"{i:04d}")), in_channels
                )
                label = None
                if conditional:
                    lab_raw = load_array(os.path.join(lab_dir, f"{i:04d}"))
                    if lab_raw is None:
                        raise FileNotFoundError(
                            f"labels/{i:04d} missing for conditional --fill "
                            f"under {out_dir}"
                        )
                    label = int(np.asarray(lab_raw).reshape(-1)[0])
                todo.append((i, jnp.asarray(s), label))
            i += 1

        def write(j, out_row):
            save_array(os.path.join(out_path, f"{j:04d}"), out_row, fmt)

        bsz = max(batch, 1)
        for start in range(0, len(todo), bsz):
            chunk = todo[start : start + bsz]
            if conditional:
                if getattr(machine.backbone, "supports_vector_label", False):
                    x = jnp.concatenate([s for _, s, _ in chunk], axis=0)
                    labs = jnp.asarray([l for _, _, l in chunk], jnp.int32)
                    out = np.asarray(machine(x, label=labs))
                    for row, (j, _, _) in enumerate(chunk):
                        write(j, out[row : row + 1])
                else:
                    by_label = {}
                    for pos, (_, _, l) in enumerate(chunk):
                        by_label.setdefault(l, []).append(pos)
                    for l, poss in by_label.items():
                        x = jnp.concatenate(
                            [chunk[p][1] for p in poss], axis=0
                        )
                        out = np.asarray(machine(x, label=l))
                        for row, p in enumerate(poss):
                            write(chunk[p][0], out[row : row + 1])
            else:
                x = jnp.concatenate([s for _, s, _ in chunk], axis=0)
                out = np.asarray(machine(x))
                for row, (j, _, _) in enumerate(chunk):
                    write(j, out[row : row + 1])
            produced += len(chunk)
        return produced

    min_iter = 0
    if os.path.isdir(out_dir) and not force_overwrite:
        for i in range(numiters):
            if _exists(os.path.join(seed_dir, f"{i:04d}")) and _exists(
                os.path.join(out_path, f"{i:04d}")
            ):
                continue
            min_iter = i
            break
        else:
            min_iter = numiters
    else:
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
    os.makedirs(seed_dir, exist_ok=True)
    os.makedirs(out_path, exist_ok=True)
    if conditional:
        os.makedirs(lab_dir, exist_ok=True)

    def draw(j):
        ks, kl = jax.random.split(jax.random.fold_in(key, j))
        seed = jax.random.normal(ks, (1, image_size, image_size, in_channels))
        lab = int(jax.random.randint(kl, (), 0, nlabels)) if conditional else None
        return seed, lab

    def emit(j, seed, out_j, lab):
        save_array(os.path.join(seed_dir, f"{j:04d}"), np.asarray(seed), fmt)
        save_array(os.path.join(out_path, f"{j:04d}"), out_j, fmt)
        if conditional:
            save_array(
                os.path.join(lab_dir, f"{j:04d}"), np.asarray([lab], np.int64), fmt
            )

    idx = min_iter
    while idx < numiters:
        n = min(batch, numiters - idx)
        drawn = [draw(j) for j in range(idx, idx + n)]
        if conditional:
            if getattr(machine.backbone, "supports_vector_label", False):
                # per-seed labels in ONE sweep (batched conditional ELS —
                # per-seed weights ride the flash kernel's bias rows)
                x = jnp.concatenate([s for s, _ in drawn], axis=0)
                labs = jnp.asarray([lab for _, lab in drawn], jnp.int32)
                out = np.asarray(machine(x, label=labs))
                for o in range(n):
                    emit(idx + o, drawn[o][0], out[o : o + 1], int(labs[o]))
            else:
                # group seeds by label so conditional generation still batches
                by_label = {}
                for off, (seed, lab) in enumerate(drawn):
                    by_label.setdefault(lab, []).append(off)
                for lab, offs in by_label.items():
                    x = jnp.concatenate([drawn[o][0] for o in offs], axis=0)
                    out = np.asarray(machine(x, label=lab))
                    for row, o in enumerate(offs):
                        emit(idx + o, drawn[o][0], out[row : row + 1], lab)
        else:
            x = jnp.concatenate([s for s, _ in drawn], axis=0)
            out = np.asarray(machine(x))
            for o in range(n):
                emit(idx + o, drawn[o][0], out[o : o + 1], None)
        produced += n
        idx += n
        if idx % max(1, 10 * n) == 0:
            log_fn(f"generated {idx}/{numiters}")
    return produced


def evaluate_correlations(
    exp_dir: str,
    sample_fn: Callable,  # (x [n,h,w,c], labels [n] or None) -> samples
    *,
    outputname: str = "els_outputs",
    conditional: bool = False,
    channels: int = 3,
) -> Dict[str, object]:
    """Normalized-correlation evaluation (eval_script.py:46-75).

    For each saved seed: run the trained model from that seed, then compare
    r(CNN, ELS) vs r(CNN, IS) where arrays are mean-centered + L2-normalized
    and r is their inner product. Returns medians and the fraction of seeds
    where the ELS machine beats the IS machine.
    """
    seed_dir = os.path.join(exp_dir, "seeds")
    out_dir = os.path.join(exp_dir, outputname)
    ideal_dir = os.path.join(exp_dir, "ideal")
    lab_dir = os.path.join(exp_dir, "labels")

    seeds, labels, theo, ideal = [], [], [], []
    n = 0
    while _exists(os.path.join(seed_dir, f"{n:04d}")):
        s_raw = load_array(os.path.join(seed_dir, f"{n:04d}"))
        th_raw = load_array(os.path.join(out_dir, f"{n:04d}"))
        idl_raw = load_array(os.path.join(ideal_dir, f"{n:04d}"))
        if th_raw is None or idl_raw is None:
            break  # evaluate the complete prefix (partial fill / no ideal run)
        s = _nchw_to_nhwc_if_needed(s_raw, channels)
        th = _nchw_to_nhwc_if_needed(th_raw, channels)
        idl = _nchw_to_nhwc_if_needed(idl_raw, channels)
        seeds.append(s.reshape(s.shape[-3], s.shape[-2], s.shape[-1]) if s.ndim == 4 else s)
        theo.append(th)
        ideal.append(idl)
        if conditional:
            lab_raw = load_array(os.path.join(lab_dir, f"{n:04d}"))
            if lab_raw is None:
                raise FileNotFoundError(
                    f"labels/{n:04d} missing for --conditional evaluation "
                    f"under {exp_dir}"
                )
            labels.append(int(np.asarray(lab_raw).reshape(-1)[0]))
        n += 1
    if n == 0:
        raise FileNotFoundError(f"no complete sample set under {exp_dir}")

    x = jnp.asarray(np.stack(seeds))
    labs = jnp.asarray(np.asarray(labels, np.int32)) if conditional else None
    outputs = np.asarray(sample_fn(x, labs))  # all seeds in ONE batch

    def normalize(a):
        a = a.reshape(a.shape[0], -1) if a.ndim > 1 else a.reshape(1, -1)
        a = a - a.mean(axis=1, keepdims=True)
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    no = normalize(outputs)
    nt = normalize(np.stack([t.reshape(-1) for t in theo]))
    ni = normalize(np.stack([t.reshape(-1) for t in ideal]))
    ideal_corrs = np.sum(ni * no, axis=1)
    target_corrs = np.sum(nt * no, axis=1)
    return {
        "ideal_corrs": ideal_corrs,
        "target_corrs": target_corrs,
        "median_ideal": float(np.median(ideal_corrs)),
        "median_target": float(np.median(target_corrs)),
        "frac_els_beats_is": float(np.mean(target_corrs > ideal_corrs)),
        "n": n,
    }
