"""Exterior-derivative (curl) analysis CLI — counterpart of
`/root/reference/scripts/analyze_exterior_derivative.py`: along a reverse
diffusion trajectory, measure how far each model's score field is from a
gradient (conservative) field via ||J - J^T||_F, for trained CNNs and the
bbELS machine; aggregate over realizations and plot.

TPU-native: the per-element autograd Jacobian loop becomes one vmapped
jacrev per step (analysis.exterior_derivative).
"""

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _find_checkpoints(checkpoints_dir, dataset_name):
    """Reference-style auto-detection glob (analyze_exterior_derivative.py:56-77)."""
    up = dataset_name.upper()
    out = {}
    for tag in ("UNet", "ResNet"):
        hits = sorted(
            glob.glob(os.path.join(checkpoints_dir, f"backbone_{up}_{tag}*"))
        ) + sorted(glob.glob(os.path.join(checkpoints_dir, f"*{tag}*{dataset_name}*")))
        if hits:
            out[tag.lower()] = hits[0]
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="Exterior derivative analysis")
    parser.add_argument("--dataset", type=str, default="cifar10")
    parser.add_argument("--checkpoints", type=str, default="./checkpoints")
    parser.add_argument("--results", type=str, default="./results/exterior_derivative")
    parser.add_argument("--nsteps", type=int, default=20)
    parser.add_argument("--single", action="store_true", default=False)
    parser.add_argument("--multiple", type=int, default=0,
                        help="number of realizations (0 = --single)")
    parser.add_argument("--max_samples", type=int, default=1000)
    parser.add_argument("--scorebatchsize", type=int, default=64)
    parser.add_argument("--kernel_size", type=int, default=5)
    parser.add_argument("--image_size", type=int, default=0,
                        help="override (downscale) for Jacobian tractability")
    parser.add_argument("--dataroot", type=str, default="./data")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--modelfile", type=str, default=None,
                        help="explicit checkpoint (else auto-detected)")
    args = parser.parse_args(argv)

    from ..analysis.exterior_derivative import (
        compute_exterior_derivative_nd,
        exterior_derivative_magnitude,
    )
    from ..data import get_dataset
    from ..sampling import ddim_step
    from ..schedules import cosine_noise_schedule
    from ..scores import LocalEquivBordersScoreModule
    from .common import load_model

    ds, metadata = get_dataset(args.dataset, root=args.dataroot)
    image_size = args.image_size or metadata["image_size"]
    channels = metadata["num_channels"]
    if image_size != metadata["image_size"]:
        images = np.asarray(
            jax.image.resize(
                ds.images, (ds.num_samples, image_size, image_size, channels),
                "bilinear",
            )
        )
    else:
        images = ds.images

    models = {}
    if args.modelfile:
        model, params = load_model(args.modelfile)
        models[os.path.basename(args.modelfile)] = (
            lambda t, x, m=model, p=params: m.apply(p, jnp.full((x.shape[0],), t), x, None)
        )
    else:
        for tag, path in _find_checkpoints(args.checkpoints, metadata["name"]).items():
            try:
                model, params = load_model(path)
                models[tag] = (
                    lambda t, x, m=model, p=params: m.apply(
                        p, jnp.full((x.shape[0],), t), x, None
                    )
                )
                print(f"loaded {tag}: {path}")
            except Exception as e:
                print(f"skipping {tag} ({path}): {e!r}")

    # bbELS score field (max_samples per reference :111-129)
    bbels = LocalEquivBordersScoreModule(
        (images[: args.max_samples], ds.labels[: args.max_samples]),
        kernel_size=args.kernel_size,
        batch_size=args.scorebatchsize,
        image_size=image_size,
        schedule=cosine_noise_schedule,
    )
    models["bbels"] = lambda t, x: bbels(t, x, k=args.kernel_size)

    n_real = max(1, args.multiple)
    nsteps = args.nsteps
    key = jax.random.PRNGKey(args.seed)
    results = {name: np.zeros((n_real, nsteps)) for name in models}

    for r in range(n_real):
        key, sub = jax.random.split(key)
        x0 = jax.random.normal(sub, (1, image_size, image_size, channels))
        for name, score_fn in models.items():
            x = x0
            for j, i in enumerate(range(nsteps, 0, -1)):
                t = i / nsteps
                beta_t = cosine_noise_schedule(jnp.float32(t))

                def field(xb, t=t):
                    return score_fn(t, xb)

                df = compute_exterior_derivative_nd(x, field)
                results[name][r, j] = float(exterior_derivative_magnitude(df)[0])
                # advance x by a DDIM update using this model's epsilon
                eps = score_fn(t, x)
                if name == "bbels":  # score -> epsilon
                    eps = eps * (-jnp.sqrt(beta_t))
                beta_prev = cosine_noise_schedule(jnp.float32(t - 1.0 / nsteps))
                x = ddim_step(
                    x, eps, jnp.full((1,), beta_t), jnp.full((1,), beta_prev)
                )
            print(f"realization {r}: {name} done")

    os.makedirs(args.results, exist_ok=True)
    summary = {
        name: {
            "mean": vals.mean(0).tolist(),
            "std": vals.std(0).tolist(),
            "cv": (vals.std(0) / np.maximum(vals.mean(0), 1e-12)).tolist(),
        }
        for name, vals in results.items()
    }
    with open(os.path.join(args.results, "ed_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    steps = list(range(nsteps, 0, -1))
    for name, vals in results.items():
        m, s = vals.mean(0), vals.std(0)
        ax.plot(steps, m, label=name)
        if n_real > 1:
            ax.fill_between(steps, m - s, m + s, alpha=0.2)
    ax.set_xlabel("reverse step i")
    ax.set_ylabel(r"$\|df\|_F$")
    ax.invert_xaxis()
    ax.legend()
    ax.set_title(f"exterior derivative magnitude — {metadata['name']}")
    fig.savefig(os.path.join(args.results, "ed_magnitude.png"), dpi=110,
                bbox_inches="tight")
    print(f"wrote {args.results}/ed_summary.json and ed_magnitude.png")


if __name__ == "__main__":
    main()
