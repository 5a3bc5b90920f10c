"""Patch-distance distribution analysis CLI — counterpart of
`/root/reference/scripts/run_distribution_analysis.py`: sweeps datasets x
patch sizes, fits Weibull/Gumbel/GEV, prints the best-AIC fit per config, and
writes comparison figures + JSON under --results."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Patch distribution analysis")
    parser.add_argument(
        "--datasets", type=str, nargs="*",
        default=["mnist", "fashion_mnist", "cifar10", "celeba"],
    )
    parser.add_argument("--patch_sizes", type=int, nargs="*", default=[3, 6, 10])
    parser.add_argument("--num_samples", type=int, default=200)
    parser.add_argument("--dataroot", type=str, default="./data")
    parser.add_argument("--results", type=str, default="./results/patch_statistics")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--grayscale", action="store_true", default=False)
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="force the CPU backend (the TPU platform is "
                             "pinned at config level; env vars cannot)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from ..analysis.patch_statistics import analyze_multiple_datasets
    from ..data import get_dataset

    loaded = {}
    for name in args.datasets:
        try:
            ds, _ = get_dataset(name, root=args.dataroot)
            images = ds.images
            if args.grayscale and images.shape[-1] > 1:
                # luminance conversion, renormalized to [-1, 1] (counterpart
                # of the reference's PIL grayscale wrapper,
                # run_distribution_analysis_grayscale.py:13-60)
                u = (images + 1.0) / 2.0
                lum = 0.299 * u[..., 0] + 0.587 * u[..., 1] + 0.114 * u[..., 2]
                images = (lum * 2.0 - 1.0)[..., None].astype(np.float32)
                name = f"grayscale_{name}"
            loaded[name] = images
        except (FileNotFoundError, ValueError) as e:
            print(f"skipping {name}: {e}")
    if not loaded:
        raise SystemExit("no datasets available (use --datasets synthetic ...)")

    results = analyze_multiple_datasets(
        loaded,
        patch_sizes=args.patch_sizes,
        num_samples=args.num_samples,
        save_dir=args.results,
        key=jax.random.PRNGKey(args.seed),
    )
    print("\n=== best-fit summary ===")
    for name, per_ds in results.items():
        for ps, res in sorted(per_ds.items()):
            print(f"{name} k={ps}: {res['fits'].get('best_fit')}")


if __name__ == "__main__":
    main()
