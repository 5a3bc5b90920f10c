"""ELS Demo — the paper's qualitative figure flow as a script.

Counterpart of /root/reference/notebooks/'ELS Demo.ipynb': build a bbELS
ScheduledScoreMachine over the training set and a trained CNN, run BOTH from
the same seed, and plot them side by side (machine output vs
model.sample(x=seed, nsteps=150).clip(-1, 1)).

Run on synthetic data (no downloads needed):
    python examples/els_demo.py --dataset synthetic --modelfile <ckpt-dir>
Without --modelfile it trains a tiny model first (a few seconds on TPU).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--dataroot", default="./data")
    p.add_argument("--modelfile", default=None)
    p.add_argument("--max_samples", type=int, default=10000)
    p.add_argument("--nsteps", type=int, default=150)
    p.add_argument("--nseeds", type=int, default=4)
    p.add_argument("--out", default="els_demo.png")
    p.add_argument("--scales", type=int, nargs="*", default=None)
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU backend")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")


    from convolutional_diffusion_tpu import sampling
    from convolutional_diffusion_tpu.cli.common import load_model
    from convolutional_diffusion_tpu.data import get_dataset
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
    from convolutional_diffusion_tpu.scores import (
        LocalEquivBordersScoreModule,
        ScheduledScoreMachine,
    )
    from convolutional_diffusion_tpu.utils.visualize import save_image_grid

    ds, meta = get_dataset(args.dataset, root=args.dataroot)
    c, sz = meta["num_channels"], meta["image_size"]

    if args.modelfile:
        model, params = load_model(args.modelfile)
    else:
        print("no --modelfile: training a small model on the dataset ...")
        from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
        from convolutional_diffusion_tpu.training import TrainConfig, train_diffusion

        net = MinimalResNet(channels=c, emb_dim=64, num_layers=4, mode="zeros",
                            lastksize=3)
        model = DiffusionModel(net, in_channels=c, default_imsize=sz)
        params = model.init(jax.random.PRNGKey(0))
        params, _, _ = train_diffusion(
            model, params, (ds.images, ds.labels),
            TrainConfig(epochs=20, batch_size=64, lr=3e-4),
        )

    scales = args.scales or [3, 3, 3, 3, 5, 5, 5, 7, 7, 7, 7, 9, 9, 11, 11, 13,
                             15, 17, 17, 17]
    scales = [min(s, sz - 1) for s in scales]
    mod = LocalEquivBordersScoreModule(
        (ds.images[: args.max_samples], ds.labels[: args.max_samples]),
        batch_size=256, schedule=cosine_noise_schedule,
    )
    machine = ScheduledScoreMachine(mod, in_channels=c, imsize=sz, scales=scales)

    key = jax.random.PRNGKey(42)
    seeds = jax.random.normal(key, (args.nseeds, sz, sz, c))

    print("running ELS machine ...")
    els_out = np.asarray(machine(seeds))
    print("running CNN sampler ...")
    cnn_out = np.clip(
        np.asarray(
            sampling.sample_scan(
                model.apply, model.noise_schedule, params, seeds,
                nsteps=args.nsteps,
            )
        ),
        -1, 1,
    )

    grid = np.concatenate([els_out, cnn_out], axis=0)
    save_image_grid(grid, args.out, ncols=args.nseeds)
    print(f"wrote {args.out} (top row: ELS machine, bottom row: CNN)")


if __name__ == "__main__":
    main()
