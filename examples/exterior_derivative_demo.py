"""Exterior-derivative demo: is the learned score field a gradient?

Walkthrough counterpart of `/root/reference/examples/exterior_derivative_demo.py`
(436 LoC torch version). A conservative (gradient) vector field has zero
exterior derivative (df)_ij = d_i f_j - d_j f_i; the exact analytic score IS
a gradient, so ||df||_F measures how far a model's score field strays from
the theory. This demo:

 1. loads a dataset + trained UNet/ResNet checkpoints when available
    (reference naming convention), falling back to untrained models;
 2. builds the bbELS analytic machine (zeros-boundary, the paper's machine);
 3. computes per-timestep ED magnitudes for each model on a shared noise
    seed (single-step analysis across the whole reverse schedule);
 4. visualizes the score fields themselves (quiver on a 2D slice) plus the
    imputed denoised images;
 5. writes a multi-panel comparison figure + JSON summary.

Run:  python examples/exterior_derivative_demo.py [--dataset cifar10]
(defaults to the synthetic dataset so it runs with no downloads; pass
--image_size 16 for a fast CPU run)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    # the image's sitecustomize pins the remote-TPU platform at config level;
    # force CPU before any backend initializes (tiny jacrev programs compile
    # in milliseconds locally vs ~minutes over the remote-compile tunnel)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from convolutional_diffusion_tpu.analysis.exterior_derivative import (
    compute_exterior_derivative_nd,
    exterior_derivative_magnitude,
)
from convolutional_diffusion_tpu.data import get_dataset
from convolutional_diffusion_tpu.models import (
    DiffusionModel,
    MinimalResNet,
    MinimalUNet,
)
from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
from convolutional_diffusion_tpu.scores import LocalEquivBordersScoreModule


def load_or_create(kind, checkpoints, metadata, image_size, channels):
    """Reference checkpoint-naming convention with untrained fallback
    (reference demo :76-117)."""
    from convolutional_diffusion_tpu.cli.common import load_model

    up = metadata["name"].upper()
    for suffix in ("_conditional", ""):
        path = os.path.join(checkpoints, f"backbone_{up}_{kind}_zeros{suffix}.pt")
        if os.path.exists(path):
            print(f"loading {kind} from {path}")
            return load_model(path)
    print(f"no {kind} checkpoint under {checkpoints}; using an untrained model")
    if kind == "UNet":
        net = MinimalUNet(channels=channels, emb_dim=32, fsizes=(16, 32), mode="zeros")
    else:
        net = MinimalResNet(channels=channels, emb_dim=32, num_layers=2, mode="zeros")
    model = DiffusionModel(net, in_channels=channels, default_imsize=image_size)
    return model, model.init(jax.random.PRNGKey(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--image_size", type=int, default=0, help="downscale override")
    ap.add_argument("--kernel_size", type=int, default=3)
    ap.add_argument("--max_samples", type=int, default=1000)
    ap.add_argument("--nsteps", type=int, default=10)
    ap.add_argument("--checkpoints", default="./checkpoints")
    ap.add_argument("--out", default="./results/ed_demo")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled at import)")
    args = ap.parse_args()

    print("Exterior derivative demo")
    print("=" * 50)
    ds, metadata = get_dataset(args.dataset)
    channels = metadata["num_channels"]
    image_size = args.image_size or metadata["image_size"]
    images = ds.images
    if image_size != metadata["image_size"]:
        images = np.asarray(
            jax.image.resize(
                images, (ds.num_samples, image_size, image_size, channels), "bilinear"
            )
        )
    print(f"dataset {metadata['name']}: {ds.num_samples} samples, "
          f"{image_size}x{image_size}x{channels}")

    unet, unet_params = load_or_create("UNet", args.checkpoints, metadata,
                                       image_size, channels)
    resnet, resnet_params = load_or_create("ResNet", args.checkpoints, metadata,
                                           image_size, channels)

    n_bank = min(args.max_samples, ds.num_samples)
    print(f"building bbELS machine over {n_bank} images (k={args.kernel_size})")
    bbels = LocalEquivBordersScoreModule(
        (images[:n_bank], ds.labels[:n_bank]),
        kernel_size=args.kernel_size, batch_size=64, image_size=image_size,
        schedule=cosine_noise_schedule,
        use_pallas=False,  # jacrev needs the differentiable jnp path
    )

    # epsilon-field wrappers; bbELS returns the SCORE (eps = -sqrt(beta)*score)
    def eps_fn(model, params):
        return lambda t, x: model.apply(params, jnp.full((x.shape[0],), t), x, None)

    fields = {
        "unet": eps_fn(unet, unet_params),
        "resnet": eps_fn(resnet, resnet_params),
        "bbels": lambda t, x: bbels(t, x) * (-jnp.sqrt(cosine_noise_schedule(jnp.float32(t)))),
    }

    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(key, (1, image_size, image_size, channels))
    steps = list(range(args.nsteps, 0, -1))
    mags = {name: [] for name in fields}

    # warm module caches eagerly, then jit one ED program per (model, t)
    for fn in fields.values():
        jax.block_until_ready(fn(1.0, x0))

    def make_ed(fn):
        def ed(x, t):
            df = compute_exterior_derivative_nd(x, lambda xb: fn(t, xb))
            return exterior_derivative_magnitude(df)[0]

        return jax.jit(ed, static_argnums=(1,))

    ed_jit = {name: make_ed(fn) for name, fn in fields.items()}

    print("\nper-timestep exterior-derivative magnitudes:")
    for i in steps:
        t = i / args.nsteps
        row = []
        for name in fields:
            mag = float(ed_jit[name](x0, t))
            mags[name].append(mag)
            row.append(f"{name}={mag:.4f}")
        print(f"  t={t:.2f}: " + "  ".join(row))

    # score-field + imputed-x0 visualization at a mid noise level
    t_vis = 0.5
    beta = float(cosine_noise_schedule(jnp.float32(t_vis)))
    panels = {}
    for name, fn in fields.items():
        eps = np.asarray(fn(t_vis, x0))[0]
        imputed = (np.asarray(x0)[0] - np.sqrt(beta) * eps) / np.sqrt(1 - beta)
        panels[name] = (eps, imputed)

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(fields)
    fig, axes = plt.subplots(3, n, figsize=(4 * n, 11))
    for j, (name, (eps, imputed)) in enumerate(panels.items()):
        ax = axes[0, j]
        ax.imshow(eps[..., 0], cmap="RdBu")
        ax.set_title(f"{name}: eps field (ch 0, t={t_vis})")
        ax.axis("off")
        ax = axes[1, j]
        img = np.clip(imputed * 0.5 + 0.5, 0, 1)
        ax.imshow(img[..., 0] if channels == 1 else img,
                  cmap="gray" if channels == 1 else None)
        ax.set_title(f"{name}: imputed x0")
        ax.axis("off")
        ax = axes[2, j]
        ax.plot(steps, mags[name], marker="o")
        ax.set_xlabel("reverse step i")
        ax.set_ylabel(r"$\|df\|_F$")
        ax.invert_xaxis()
        ax.set_title(f"{name}: ED magnitude")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig_path = os.path.join(args.out, "ed_demo.png")
    fig.savefig(fig_path, dpi=110, bbox_inches="tight")

    summary = {
        name: {
            "mean_ed": float(np.mean(v)),
            "per_step": [float(x) for x in v],
        }
        for name, v in mags.items()
    }
    with open(os.path.join(args.out, "ed_demo_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    print("\nsummary (mean ||df||_F — smaller = closer to a gradient field):")
    for name, s in summary.items():
        print(f"  {name:8s} {s['mean_ed']:.5f}")
    print(f"\nwrote {fig_path} and ed_demo_summary.json")


if __name__ == "__main__":
    main()
