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
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="force the CPU backend (the TPU platform is "
                             "pinned at config level; env vars cannot)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

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

    # bbELS score field (max_samples per reference :111-129). use_pallas=False:
    # jacrev differentiates through the sweep and the fused Pallas kernel has
    # no VJP — the jnp path is the differentiable one (same math).
    bbels = LocalEquivBordersScoreModule(
        (images, ds.labels),
        kernel_size=args.kernel_size,
        batch_size=args.scorebatchsize,
        image_size=image_size,
        schedule=cosine_noise_schedule,
        # the module's BATCH_QUOTA cutoff (i*batch_size <= max_samples)
        # reproduces the reference exactly; pre-slicing the dataset would
        # change the processed count and the last-batch composition
        max_samples=args.max_samples,
        use_pallas=False,
    )
    models["bbels"] = lambda t, x: bbels(t, x, k=args.kernel_size)

    n_real = max(1, args.multiple)
    nsteps = args.nsteps
    key = jax.random.PRNGKey(args.seed)
    results = {name: np.zeros((n_real, nsteps)) for name in models}
    finals = {}

    # One jitted (ED magnitude, next x) program per (model, timestep index):
    # the jacrev + antisymmetrize + DDIM advance compile together, so the
    # realization loop re-dispatches compiled programs (the reference
    # recomputes a Python-loop autograd Jacobian per element per step,
    # analyze_exterior_derivative.py:169-222).
    def make_step(score_fn, is_score_backbone):
        def step(x, t, beta_t, beta_prev):
            def field(xb):
                return score_fn(t, xb)

            df = compute_exterior_derivative_nd(x, field)
            mag = exterior_derivative_magnitude(df)[0]
            eps = score_fn(t, x)
            if is_score_backbone:  # score -> epsilon
                eps = eps * (-jnp.sqrt(beta_t))
            x_next = ddim_step(
                x, eps, jnp.full((1,), beta_t), jnp.full((1,), beta_prev)
            )
            return mag, x_next

        return jax.jit(step, static_argnums=(1,))

    # warm each model EAGERLY once so module-internal caches (patch banks,
    # jitted kernels) hold concrete arrays, not tracers from the outer jit
    warm_x = jnp.zeros((1, image_size, image_size, channels))
    bad = []
    for name, fn in models.items():
        try:
            jax.block_until_ready(fn(1.0, warm_x))
        except Exception as e:  # e.g. a conditional checkpoint needing labels
            print(f"skipping {name}: warm-up failed ({e!r})")
            bad.append(name)
    for name in bad:
        del models[name]

    steps_jit = {
        name: make_step(fn, name == "bbels") for name, fn in models.items()
    }

    for r in range(n_real):
        key, sub = jax.random.split(key)
        x0 = jax.random.normal(sub, (1, image_size, image_size, channels))
        for name in models:
            x = x0
            for j, i in enumerate(range(nsteps, 0, -1)):
                t = i / nsteps
                beta_t = cosine_noise_schedule(jnp.float32(t))
                beta_prev = cosine_noise_schedule(jnp.float32(t - 1.0 / nsteps))
                mag, x = steps_jit[name](x, t, beta_t, beta_prev)
                results[name][r, j] = float(mag)
            finals[name] = np.asarray(x[0])
            print(f"realization {r}: {name} done")

    # per-dataset subdirectory like the reference (analyze_exterior_
    # derivative.py: output_dir / dataset) so runs don't clobber each other
    args.results = os.path.join(args.results, args.dataset)
    os.makedirs(args.results, exist_ok=True)
    steps = np.arange(nsteps, 0, -1)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def show_img(ax, img, title):
        img = np.clip(img * 0.5 + 0.5, 0, 1)
        if img.shape[-1] == 1:
            ax.imshow(img[..., 0], cmap="gray")
        else:
            ax.imshow(img)
        ax.set_title(title)
        ax.axis("off")

    # ---- single-realization figure suite (reference :342-400) ----------
    fig, axes = plt.subplots(2, 2, figsize=(12, 10))
    ax = axes[0, 0]
    for name, vals in results.items():
        ax.plot(steps, vals[0], marker="o", label=name)
    ax.set_xlabel("reverse step i")
    ax.set_ylabel(r"$\|df\|_F$")
    ax.invert_xaxis()
    ax.set_title("Exterior derivative during reverse process")
    ax.legend()
    ax.grid(alpha=0.3)
    ax = axes[0, 1]
    for name, vals in results.items():
        pos = vals[0] > 0
        ax.semilogy(steps[pos], vals[0][pos], marker="o", label=name)
    ax.set_xlabel("reverse step i")
    ax.set_ylabel(r"$\|df\|_F$ (log)")
    ax.invert_xaxis()
    ax.set_title("Exterior derivative (log scale)")
    ax.legend()
    ax.grid(alpha=0.3)
    first = next(iter(finals))
    show_img(axes[1, 0], finals[first], f"generated image ({first})")
    ax = axes[1, 1]
    names = list(results)
    means = [results[n][0].mean() for n in names]
    bars = ax.bar(names, means, alpha=0.7)
    for bar, m in zip(bars, means):
        ax.text(bar.get_x() + bar.get_width() / 2, bar.get_height(),
                f"{m:.4f}", ha="center", va="bottom")
    ax.set_ylabel("mean ED magnitude")
    ax.set_title("Mean ED magnitude comparison")
    fig.tight_layout()
    fig.savefig(os.path.join(args.results, "ed_analysis_single.png"), dpi=110,
                bbox_inches="tight")
    plt.close(fig)
    np.savez(
        os.path.join(args.results, "ed_analysis_single.npz"),
        timesteps=steps,
        **{f"{n}/ed_magnitudes": results[n][0] for n in results},
        **{f"{n}/final_image": finals[n] for n in finals},
    )

    # ---- aggregated figure suite (reference :403-472) ------------------
    if n_real > 1:
        fig, axes = plt.subplots(2, 2, figsize=(14, 10))
        ax = axes[0, 0]
        for name, vals in results.items():
            ax.errorbar(steps, vals.mean(0), yerr=vals.std(0), marker="o",
                        capsize=5, label=f"{name} (n={n_real})")
        ax.set_xlabel("reverse step i")
        ax.set_ylabel(r"$\|df\|_F$")
        ax.invert_xaxis()
        ax.set_title("Mean exterior derivative during reverse process")
        ax.legend()
        ax.grid(alpha=0.3)
        ax = axes[0, 1]
        for name, vals in results.items():
            cv = vals.std(0) / (vals.mean(0) + 1e-8)
            ax.plot(steps, cv, marker="o", label=name)
        ax.set_xlabel("reverse step i")
        ax.set_ylabel("coefficient of variation")
        ax.invert_xaxis()
        ax.set_title("Variability of exterior derivative")
        ax.legend()
        ax.grid(alpha=0.3)
        ax = axes[1, 0]
        im = ax.imshow(results[names[0]], aspect="auto", cmap="viridis")
        ax.set_xlabel("step index")
        ax.set_ylabel("realization")
        ax.set_title(f"ED magnitudes across realizations ({names[0]})")
        fig.colorbar(im, ax=ax)
        ax = axes[1, 1]
        xpos = np.arange(len(names))
        ax.bar(xpos - 0.175, [results[n].mean() for n in names], 0.35,
               label="mean ED", alpha=0.7)
        ax.bar(xpos + 0.175, [results[n].std(0).mean() for n in names], 0.35,
               label="mean std", alpha=0.7)
        ax.set_xticks(xpos)
        ax.set_xticklabels(names)
        ax.set_title("Summary statistics comparison")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.results, "ed_analysis_aggregated.png"),
                    dpi=110, bbox_inches="tight")
        plt.close(fig)
        np.savez(
            os.path.join(args.results, "ed_analysis_aggregated.npz"),
            timesteps=steps,
            **{f"{n}/all": results[n] for n in results},
        )

    summary = {
        name: {
            "mean": vals.mean(0).tolist(),
            "std": vals.std(0).tolist(),
            "cv": (vals.std(0) / np.maximum(vals.mean(0), 1e-12)).tolist(),
            "mean_ed_magnitude": float(vals.mean()),
            "max_ed_magnitude": float(vals.mean(0).max()),
            "num_realizations": n_real,
        }
        for name, vals in results.items()
    }
    with open(os.path.join(args.results, "summary_stats.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote ed_analysis_single.png/.npz"
          + (", ed_analysis_aggregated.png/.npz" if n_real > 1 else "")
          + f", summary_stats.json under {args.results}")


if __name__ == "__main__":
    main()
