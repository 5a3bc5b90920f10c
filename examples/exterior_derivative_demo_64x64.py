"""64x64 exterior-derivative demo — the locality-breakdown hypothesis.

Counterpart of `/root/reference/examples/exterior_derivative_demo_64x64.py`
(440 LoC torch version). Hypothesis under test (reference header :3-8):

 1. CNN score fields stay (near-)curl-free at 64x64 — convolutions compose
    into fields that remain close to gradients regardless of resolution;
 2. the bbELS analytic machine develops NON-zero apparent curl at 64x64
    when its patch bank is subsampled — pixels fall outside the patch
    distribution and the k x k locality assumption strains.

Uses untrained CNNs for a controlled comparison (no 64x64 checkpoints exist
in the reference either), kernel_size=5 and a 500-image bank (reference
:128-141). Produces the same per-timestep ED comparison + field/imputed-x0
panels as the 32x32 demo, at 64x64.

Run:  python examples/exterior_derivative_demo_64x64.py
      [--dataset celeba|synthetic] [--quick]

NOTE: the 64x64 Jacobian is (64*64*c)^2 entries per field evaluation —
minutes on CPU. --quick drops to 32x32 to smoke-test the flow.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--quick", action="store_true",
                    help="16x16 / 3-step smoke-test of the same flow")
    ap.add_argument("--out", default="./results/ed_demo_64x64")
    args = ap.parse_args()

    size = 16 if args.quick else 64
    print(f"64x64 locality-breakdown demo (running at {size}x{size})")
    print("hypothesis: CNN curl ~ resolution-stable; subsampled bbELS curl grows")
    print("=" * 60)

    # Jacobians this size want the local CPU backend: jacrev programs are
    # huge-output/low-reuse, the worst case for the remote-compile tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    # reuse the full demo flow with the 64x64 hypothesis configuration
    # (reference :128-141: kernel_size=5, max_samples=500, untrained CNNs)
    from examples.exterior_derivative_demo import main as demo_main

    sys.argv = [
        "exterior_derivative_demo_64x64",
        "--dataset", args.dataset,
        "--image_size", str(size),
        "--kernel_size", "5",
        "--max_samples", "100" if args.quick else "500",
        "--nsteps", "3" if args.quick else "8",
        "--checkpoints", "./checkpoints/none_64x64",  # force untrained CNNs
        "--out", args.out,
        "--cpu",
    ]
    demo_main()

    import json

    with open(os.path.join(args.out, "ed_demo_summary.json")) as f:
        summary = json.load(f)
    cnn = min(summary["unet"]["mean_ed"], summary["resnet"]["mean_ed"])
    els = summary["bbels"]["mean_ed"]
    print("\nhypothesis check:")
    print(f"  best CNN mean ||df||_F : {cnn:.5f}")
    print(f"  bbELS mean ||df||_F    : {els:.5f}")
    if els > cnn:
        print("  -> consistent: the subsampled analytic machine shows more "
              "apparent curl than the CNNs at this resolution")
    else:
        print("  -> NOT consistent at this configuration (try more nsteps or "
              "a smaller bank)")


if __name__ == "__main__":
    main()
