"""Patch-statistics walkthrough (counterpart of
/root/reference/examples/patch_analysis_demo.py): single dataset, then the
multi-dataset driver. Works with --dataset synthetic out of the box."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--dataroot", default="./data")
    p.add_argument("--out", default="./results/patch_demo")
    p.add_argument("--num_samples", type=int, default=150)
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU backend")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")


    from convolutional_diffusion_tpu.analysis.patch_statistics import (
        analyze_multiple_datasets,
        analyze_patch_distances,
    )
    from convolutional_diffusion_tpu.data import get_dataset

    ds, meta = get_dataset(args.dataset, root=args.dataroot)

    print("=== single analysis (k=3) ===")
    res = analyze_patch_distances(
        ds.images, patch_size=3, num_samples=args.num_samples,
        key=jax.random.PRNGKey(0), dataset_name=meta["name"], save_dir=args.out,
    )
    print("distance stats:", res["distance_stats"])
    print("best fit:", res["fits"]["best_fit"])
    for name in ("weibull", "gumbel", "gev"):
        r = res["fits"].get(name, {})
        if "aic" in r:
            print(f"  {name}: AIC={r['aic']:.1f} KS p={r['ks_pvalue']:.4f}")

    print("\n=== multi patch-size driver ===")
    analyze_multiple_datasets(
        {meta["name"]: ds.images},
        patch_sizes=(3, 6, 10),
        num_samples=args.num_samples,
        save_dir=args.out,
        key=jax.random.PRNGKey(1),
    )
    print(f"figures + JSON under {args.out}")


if __name__ == "__main__":
    main()
