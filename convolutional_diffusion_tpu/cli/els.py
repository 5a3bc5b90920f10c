"""ELS machine sample generation CLI — counterpart of
`/root/reference/scripts/els_script.py` (same flags, same
results/<expname>/{seeds,<idealname>,labels}/%04d layout, resume + --fill).
Also fixes the reference's scales-coercion SyntaxError (els_script.py:121-127)
by implementing the intended tensor|list coercion in convert.load_scales.

Example:
    python -m convolutional_diffusion_tpu.cli.els --dataset cifar10 \
        --conditional --scoremoduletype bbELS --numiters 100
"""

import argparse
import json
import os

import jax


def load_scales_any(path: str):
    """scales from .pt (torch list/tensor), .npy, or .json."""
    if path.endswith(".json"):
        with open(path) as f:
            return [int(s) for s in json.load(f)]
    if path.endswith(".npy"):
        import numpy as np

        return [int(s) for s in np.load(path)]
    from ..convert import load_scales

    return load_scales(path)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate_Data")
    parser.add_argument("--expname", type=str, default=None)
    parser.add_argument("--idealname", type=str, default="els_outputs")
    parser.add_argument("--dataset", type=str, default="mnist")
    parser.add_argument("--scoremoduletype", type=str, default="bbELS")
    parser.add_argument("--conditional", action="store_true", default=False)
    parser.add_argument("--scalesfile", type=str, default=None)
    parser.add_argument("--scorebatchsize", type=int, default=256)
    parser.add_argument("--fill", action="store_true", default=False)
    parser.add_argument("--numiters", type=int, default=100)
    parser.add_argument("--nsteps", type=int, default=20)
    parser.add_argument("--nlabels", type=int, default=10)
    parser.add_argument("--force_overwrite", action="store_true", default=False)
    parser.add_argument("--cpu", action="store_true", default=False)
    parser.add_argument("--max_samples", type=int, default=100000)
    parser.add_argument("--shuffle", action="store_true", default=False)
    parser.add_argument("--dataroot", type=str, default="./data")
    parser.add_argument("--checkpoints", type=str, default="./checkpoints")
    parser.add_argument("--results", type=str, default="./results")
    parser.add_argument("--batch", type=int, default=1,
                        help="seeds per machine invocation (TPU batching)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--fmt", type=str, default="npy", choices=["npy", "pt"])
    parser.add_argument("--precision", type=str, default="highest",
                        choices=["highest", "high", "default"],
                        help="'high' = bf16x3 dots (~2x faster at large k, "
                             "near-parity); 'default' = bf16 fast mode "
                             "(~3e-3 rel err)")
    parser.add_argument("--target_block", type=int, default=None,
                        help="patches per sweep chunk (default 65536; the "
                             "kernel-occupancy knob, PERFORMANCE.md)")
    parser.add_argument("--ndevices", type=int, default=1,
                        help=">1 shards the training set over a device mesh "
                             "(all module types; partial softmax states "
                             "merge over ICI)")
    args = parser.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..data import get_dataset
    from ..pipeline import auto_detect_scales, generate_els_samples
    from ..schedules import cosine_noise_schedule
    from ..scores import ScheduledScoreMachine
    from .common import build_score_module

    ds, metadata = get_dataset(args.dataset, root=args.dataroot)
    in_channels = metadata["num_channels"]
    image_size = metadata["image_size"]

    if args.expname is None:
        expname = f"dataset_{metadata['name']}_option_{args.scoremoduletype}"
        if args.conditional:
            expname += "_conditional"
    else:
        expname = args.expname

    mesh = None
    if args.ndevices > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.ndevices)
    mod = build_score_module(
        args.scoremoduletype,
        (ds.images, ds.labels),
        batch_size=args.scorebatchsize,
        image_size=image_size,
        channels=in_channels,
        schedule=cosine_noise_schedule,
        max_samples=args.max_samples,
        precision=args.precision,
        shuffle=args.shuffle,
        target_block=args.target_block,
        mesh=mesh,
    )

    scalesfile = args.scalesfile or auto_detect_scales(
        args.checkpoints, metadata["name"]
    )
    scales = load_scales_any(scalesfile)
    print(f"scales ({scalesfile}): {scales}")

    machine = ScheduledScoreMachine(
        mod,
        in_channels=in_channels,
        imsize=image_size,
        noise_schedule=cosine_noise_schedule,
        score_backbone=True,
        scales=scales,
    )

    out_dir = os.path.join(args.results, expname)
    n = generate_els_samples(
        machine,
        out_dir,
        numiters=args.numiters,
        in_channels=in_channels,
        image_size=image_size,
        conditional=args.conditional,
        nlabels=args.nlabels,
        idealname=args.idealname,
        fill=args.fill,
        force_overwrite=args.force_overwrite,
        batch=args.batch,
        fmt=args.fmt,
        seed=args.seed,
    )
    print(f"generated {n} samples under {out_dir}")


if __name__ == "__main__":
    main()
