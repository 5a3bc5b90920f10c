"""Scales calibration CLI — counterpart of
`/root/reference/scripts/scales_calibration.py` (same flags; saves
{kfilename}_k_optimals/median/mode artifacts, plus a scales list usable by
the els CLI).

Example:
    python -m convolutional_diffusion_tpu.cli.calibrate \
        --modelfile backbone_MNIST_ResNet_zeros.pt --dataset mnist \
        --kernelsizes 3 5 7 9 11 13 15 17 --nsteps 20 --nsamps 10
"""

import argparse
import json
import os

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Calibrate")
    parser.add_argument("--kfilename", type=str, default="scales")
    parser.add_argument("--tld", type=str, default="./checkpoints/")
    parser.add_argument("--modelfile", type=str, default=None)
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--scoremoduletype", type=str, default="bbELS")
    parser.add_argument("--conditional", action="store_true", default=False)
    parser.add_argument("--kernelsizes", type=int, nargs="*")
    parser.add_argument("--scorebatchsize", type=int, default=16)
    parser.add_argument("--nsamps", type=int, default=20)
    parser.add_argument("--nsteps", type=int, default=20)
    parser.add_argument("--nlabels", type=int, default=10)
    parser.add_argument("--eval_mode", type=str, default="cos")
    parser.add_argument("--cpu", action="store_true", default=False)
    parser.add_argument("--maxsamps", type=int, default=5000)
    parser.add_argument("--dataroot", type=str, default="./data")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fmt", type=str, default="npy", choices=["npy", "pt"])
    args = parser.parse_args(argv)

    if args.modelfile is None:
        raise ValueError("modelfile must be provided")
    if not args.kernelsizes:
        raise ValueError("kernelsizes must be provided")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..calibration import calibrate
    from ..data import get_dataset
    from ..schedules import cosine_noise_schedule
    from .common import build_score_module, load_model

    ds, metadata = get_dataset(args.dataset, root=args.dataroot)
    if args.maxsamps < ds.num_samples:
        ds = type(ds)(ds.images[: args.maxsamps], ds.labels[: args.maxsamps])

    modelpath = args.modelfile
    if not os.path.exists(modelpath):
        modelpath = os.path.join(args.tld, args.modelfile)
    model, params = load_model(modelpath)

    # ONE bank ledger across the per-k module fleet: with per-module
    # budgets, each k would cache its own bank — at maxsamps=5000 the eight
    # ELS banks sum to ~23 GB and exhaust a 16 GB chip (scores.bank)
    from ..scores.bank import BankLedger

    ledger = BankLedger(8 << 30)
    mods = {
        k: build_score_module(
            args.scoremoduletype,
            (ds.images, ds.labels),
            batch_size=args.scorebatchsize,
            image_size=metadata["image_size"],
            channels=metadata["num_channels"],
            schedule=cosine_noise_schedule,
            kernel_size=k,
            bank_ledger=ledger,
        )
        for k in args.kernelsizes
    }

    def eps_fn(t, x, label):
        return model.apply(params, t, x, label if args.conditional else None)

    results = calibrate(
        eps_fn,
        mods,
        image_size=metadata["image_size"],
        in_channels=metadata["num_channels"],
        nsamps=args.nsamps,
        nsteps=args.nsteps,
        conditional=args.conditional,
        nlabels=args.nlabels,
        eval_mode=args.eval_mode,
        key=jax.random.PRNGKey(args.seed),
    )

    os.makedirs(args.tld, exist_ok=True)
    from ..pipeline import save_array

    for name in ("k_optimals", "median", "mode"):
        save_array(
            os.path.join(args.tld, f"{args.kfilename}_{name}"), results[name], args.fmt
        )
    # also export the median as a plain-JSON scales list (len nsteps)
    with open(os.path.join(args.tld, f"{args.kfilename}_median.json"), "w") as f:
        json.dump([int(v) for v in results["median"]], f)
    print(f"Results saved to {args.tld}")
    for name in ("k_optimals", "median", "mode"):
        print(f"  - {args.kfilename}_{name}.{args.fmt}")


if __name__ == "__main__":
    main()
