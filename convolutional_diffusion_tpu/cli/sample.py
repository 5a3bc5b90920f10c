"""Neural sample generation CLI: draw samples from a trained model and save
an image grid + per-sample arrays. (The reference has no dedicated sampling
script — sampling happens inside eval_script/notebooks; this fills that gap
with multi-chip batch sharding.)"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Sample from a trained model")
    parser.add_argument("--modelfile", type=str, required=True)
    parser.add_argument("--nsamples", type=int, default=16)
    parser.add_argument("--nsteps", type=int, default=20)
    parser.add_argument("--ddpm", action="store_true", default=False)
    parser.add_argument("--conditional", action="store_true", default=False)
    parser.add_argument("--label", type=int, default=None)
    parser.add_argument("--nlabels", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="samples.png")
    parser.add_argument("--save_arrays", type=str, default=None)
    import argparse as _ap

    parser.add_argument("--clip", action=_ap.BooleanOptionalAction,
                        default=True,
                        help="clip samples to [-1, 1] (--no-clip disables)")
    parser.add_argument("--ndevices", type=int, default=0)
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="force the CPU backend (the TPU platform is "
                             "pinned at config level; env vars cannot)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from ..parallel.mesh import make_mesh
    from ..sampling import sample, sample_sharded
    from ..utils.visualize import save_image_grid
    from .common import load_model

    model, params = load_model(args.modelfile)
    key = jax.random.PRNGKey(args.seed)
    label = None
    if args.conditional:
        if args.label is not None:
            label = jnp.full((args.nsamples,), args.label, jnp.int32)
        else:
            key, kl = jax.random.split(key)
            label = jax.random.randint(kl, (args.nsamples,), 0, args.nlabels)

    n_dev = args.ndevices or jax.device_count()
    if n_dev > 1 and args.nsamples % n_dev == 0:
        mesh = make_mesh(n_dev)
        out = sample_sharded(
            model, params, mesh, batch_size=args.nsamples, nsteps=args.nsteps,
            label=label, key=key, ddpm=args.ddpm,
        )
    else:
        out = sample(
            model, params, batch_size=args.nsamples, nsteps=args.nsteps,
            label=label, key=key, ddpm=args.ddpm,
        )
    out = np.asarray(out)
    if args.clip:
        out = np.clip(out, -1, 1)
    save_image_grid(out, args.out)
    print(f"wrote {args.out} ({args.nsamples} samples, {args.nsteps} steps)")
    if args.save_arrays:
        os.makedirs(args.save_arrays, exist_ok=True)
        for i in range(out.shape[0]):
            np.save(os.path.join(args.save_arrays, f"{i:04d}.npy"), out[i : i + 1])
        print(f"arrays under {args.save_arrays}")


if __name__ == "__main__":
    main()
