"""64x64 training CLI — counterpart of
`/root/reference/scripts/training_script_64x64.py`: same recipe at 64x64
(UNet fsizes [64,128,256,512][:layers], default mode zeros, batch 64, max 4
layers; ResNet unchanged). Checkpoint names carry the _64x64 marker.
"""

import argparse
import os

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description="DDIM training 64x64")
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--batchsize", type=int, default=64)
    parser.add_argument("--dataset", type=str, default="celeba")
    parser.add_argument("--lr", type=float, default=0.0001)
    parser.add_argument("--conditional", action="store_true", default=False)
    parser.add_argument("--mode", type=str, default="zeros")
    parser.add_argument("--wd", type=float, default=0)
    parser.add_argument("--mult", type=int, default=2)
    parser.add_argument("--nonorm", action="store_true", default=True)
    parser.add_argument("--saveinterval", type=int, default=5)
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--resnet", action="store_true", default=False)
    parser.add_argument("--homedir", type=str, default="./checkpoints")
    parser.add_argument("--suppress", action="store_true", default=False)
    parser.add_argument("--gamma", type=float, default=0.999965)
    parser.add_argument("--maxsamps", type=int, default=100000)
    parser.add_argument("--dataroot", type=str, default="./data")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ndevices", type=int, default=0)
    parser.add_argument("--export_torch", type=str, default=None,
                        help="also export a reference-loadable torch "
                             "state_dict .pt")
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="force the CPU backend (the TPU platform is "
                             "pinned at config level; env vars cannot)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    args.layers = min(args.layers, 4)  # reference caps at 4 (64->8 pools)

    from ..data import get_dataset
    from ..models import DiffusionModel, MinimalResNet, MinimalUNet
    from ..parallel.mesh import make_mesh
    from ..schedules import cosine_noise_schedule
    from ..training import TrainConfig, train_diffusion
    from ..utils.checkpoint import save_checkpoint
    from .common import model_config_meta

    ds, metadata = get_dataset(args.dataset, root=args.dataroot, image_size=64)
    metadata = dict(metadata, image_size=64)

    subset_flag = args.maxsamps < ds.num_samples
    factor = 1
    if subset_flag:
        factor = ds.num_samples // args.maxsamps
        ds = type(ds)(ds.images[: args.maxsamps], ds.labels[: args.maxsamps])

    normal = None if args.nonorm else "GroupNorm"
    if args.resnet:
        backbone = MinimalResNet(
            channels=metadata["num_channels"], emb_dim=128 * args.mult,
            mode=args.mode, conditional=args.conditional,
            num_classes=metadata["num_classes"], kernel_size=3,
            num_layers=args.layers, normalization=normal, lastksize=3,
        )
        model_tag = "ResNet"
    else:
        fsizes = tuple([64, 128, 256, 512][: args.layers])
        backbone = MinimalUNet(
            channels=metadata["num_channels"], fsizes=fsizes, mode=args.mode,
            conditional=args.conditional, num_classes=metadata["num_classes"],
            normalization=normal, lastksize=3,
        )
        model_tag = "UNet"

    model = DiffusionModel(
        backbone, noise_schedule=cosine_noise_schedule,
        in_channels=metadata["num_channels"], default_imsize=64,
    )
    params = model.init(jax.random.PRNGKey(args.seed), batch_size=1)

    # reference naming: backbone_{DS}_{Model}_{mode}_64x64... (script :84-98)
    fname = f"backbone_{metadata['name']}_{model_tag}_{args.mode}_64x64"
    if args.conditional:
        fname += "_conditional"
    ckpt_dir = os.path.join(args.homedir, fname)

    n_dev = args.ndevices or jax.device_count()
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    config = TrainConfig(
        epochs=args.epochs * factor, batch_size=args.batchsize, lr=args.lr,
        weight_decay=args.wd, gamma=args.gamma, max_t=1000,
        save_interval=args.saveinterval * factor, seed=args.seed,
    )
    log = (lambda s: None) if args.suppress else print
    meta_cfg = {"model_config": model_config_meta(
        backbone, metadata["num_channels"], 64
    )}
    params, opt_state, _ = train_diffusion(
        model, params, (ds.images, ds.labels), config,
        conditional=args.conditional, mesh=mesh, checkpoint_dir=ckpt_dir,
        checkpoint_extra=meta_cfg, log_fn=log,
    )
    final_step = config.epochs * (ds.num_samples // config.batch_size)
    save_checkpoint(ckpt_dir, params=params, opt_state=opt_state,
                    step=final_step, extra=meta_cfg)
    log(f"saved final checkpoint under {ckpt_dir}")
    if args.export_torch:
        from .common import export_torch_state_dict

        export_torch_state_dict(
            params, args.resnet,
            layers=args.layers, nonorm=args.nonorm,
            conditional=args.conditional, path=args.export_torch, log=log,
        )


if __name__ == "__main__":
    main()
