"""Plot verification CLI — counterpart of
`/root/reference/scripts/verify_plots.py`: checks the expected
`{ds}_distribution_comparison.png` figures exist and prints their sizes."""

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Verify analysis plots")
    parser.add_argument(
        "--datasets", type=str, nargs="*",
        default=["mnist", "fashion_mnist", "cifar10", "celeba"],
    )
    parser.add_argument("--results", type=str, default="./results/patch_statistics")
    args = parser.parse_args(argv)

    missing = []
    for ds in args.datasets:
        path = os.path.join(args.results, f"{ds}_distribution_comparison.png")
        if os.path.exists(path):
            print(f"OK {path} ({os.path.getsize(path)} bytes)")
        else:
            print(f"MISSING {path}")
            missing.append(path)
    if missing:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
