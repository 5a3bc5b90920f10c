"""DDPM training CLI — counterpart of
`/root/reference/scripts/training_script.py` (same flags + recipe).

Example (the README's CIFAR10 recipe):
    python -m convolutional_diffusion_tpu.cli.train --epochs 300 \
        --dataset cifar10 --conditional --mode zeros --layers 8 --resnet
"""

import argparse
import os

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description="DDIM training")
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--batchsize", type=int, default=128)
    parser.add_argument("--dataset", type=str)
    parser.add_argument("--lr", type=float, default=0.0001)
    parser.add_argument("--conditional", action="store_true", default=False)
    parser.add_argument("--mode", type=str, default="circular")
    parser.add_argument("--wd", type=float, default=0)
    parser.add_argument("--mult", type=int, default=2)
    parser.add_argument("--nonorm", action="store_true", default=True)
    parser.add_argument("--saveinterval", type=int, default=5)
    parser.add_argument("--layers", type=int, default=3)
    parser.add_argument("--resnet", action="store_true", default=False)
    parser.add_argument("--homedir", type=str, default="./model_checkpoints")
    parser.add_argument("--suppress", action="store_true", default=False)
    parser.add_argument("--gamma", type=float, default=0.999965)
    parser.add_argument("--maxsamps", type=int, default=100000)
    # TPU-native extensions (absent from the reference):
    parser.add_argument("--dataroot", type=str, default="./data")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ndevices", type=int, default=0,
                        help="data-parallel devices (0 = all available)")
    parser.add_argument("--export_torch", type=str, default=None,
                        help="also export the trained weights as a torch "
                             "state_dict .pt, loadable by the reference via "
                             "backbone.load_state_dict(torch.load(path))")
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="force the CPU backend (the TPU platform is "
                             "pinned at config level; env vars cannot)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from ..data import get_dataset
    from ..models import DiffusionModel
    from ..parallel.mesh import make_mesh
    from ..schedules import cosine_noise_schedule
    from ..training import TrainConfig, train_diffusion
    from ..utils.checkpoint import save_checkpoint
    from .common import build_backbone_from_flags, checkpoint_name_from_flags, model_config_meta

    ds, metadata = get_dataset(args.dataset, root=args.dataroot)

    # --maxsamps subsetting multiplies epochs/save-interval by the subset
    # factor (reference training_script.py:38-42,96,102)
    subset_flag = args.maxsamps < ds.num_samples
    factor = 1
    if subset_flag:
        factor = ds.num_samples // args.maxsamps
        ds = type(ds)(ds.images[: args.maxsamps], ds.labels[: args.maxsamps])

    backbone = build_backbone_from_flags(
        metadata, resnet=args.resnet, mode=args.mode, mult=args.mult,
        layers=args.layers, conditional=args.conditional, nonorm=args.nonorm,
    )
    model = DiffusionModel(
        backbone,
        noise_schedule=cosine_noise_schedule,
        in_channels=metadata["num_channels"],
        default_imsize=metadata["image_size"],
    )
    params = model.init(jax.random.PRNGKey(args.seed), batch_size=1)

    fname = checkpoint_name_from_flags(metadata, args, subset_flag)
    ckpt_dir = os.path.join(args.homedir, fname)

    n_dev = args.ndevices or jax.device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None

    config = TrainConfig(
        epochs=args.epochs * factor,
        batch_size=args.batchsize,
        lr=args.lr,
        weight_decay=args.wd,
        gamma=args.gamma,
        max_t=1000,
        save_interval=args.saveinterval * factor,
        seed=args.seed,
    )
    log = (lambda s: None) if args.suppress else print
    meta_cfg = {"model_config": model_config_meta(
        backbone, metadata["num_channels"], metadata["image_size"]
    )}
    params, opt_state, history = train_diffusion(
        model, params, (ds.images, ds.labels), config,
        conditional=args.conditional, mesh=mesh, checkpoint_dir=ckpt_dir,
        checkpoint_extra=meta_cfg, log_fn=log,
    )
    save_checkpoint(
        ckpt_dir, params=params, opt_state=opt_state,
        step=config.epochs * (ds.num_samples // config.batch_size),
        extra=meta_cfg,
    )
    log(f"saved final checkpoint under {ckpt_dir}")
    if args.export_torch:
        from ..models import MinimalResNet
        from .common import export_torch_state_dict

        export_torch_state_dict(
            params, isinstance(backbone, MinimalResNet),
            layers=args.layers, nonorm=args.nonorm,
            conditional=args.conditional, path=args.export_torch, log=log,
        )


if __name__ == "__main__":
    main()
