"""Exterior-derivative demo (counterpart of
/root/reference/examples/exterior_derivative_demo.py): curl magnitude of
analytic example fields, then of a diffusion score field along a reverse
trajectory. Runs on synthetic data without checkpoints."""

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
    p.add_argument("--image_size", type=int, default=8)
    p.add_argument("--nsteps", type=int, default=10)
    args = p.parse_args()

    from convolutional_diffusion_tpu.analysis.exterior_derivative import (
        compute_exterior_derivative,
        compute_exterior_derivative_nd,
        conservative_field,
        exterior_derivative_magnitude,
        rotation_field,
    )
    from convolutional_diffusion_tpu.data import get_dataset
    from convolutional_diffusion_tpu.sampling import ddim_step
    from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
    from convolutional_diffusion_tpu.scores import LocalEquivBordersScoreModule

    print("=== analytic example fields ===")
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 2))
    for name, f in [("conservative", conservative_field), ("rotation", rotation_field)]:
        df = compute_exterior_derivative(x, f)
        print(f"{name}: ||df||_F = {np.asarray(exterior_derivative_magnitude(df))}")

    print("\n=== bbELS score field along a reverse trajectory ===")
    ds, meta = get_dataset(args.dataset, root=args.dataroot,
                           image_size=args.image_size)
    mod = LocalEquivBordersScoreModule(
        (ds.images[:256], ds.labels[:256]), kernel_size=3, batch_size=64,
        schedule=cosine_noise_schedule,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, args.image_size,
                                                  args.image_size,
                                                  meta["num_channels"]))
    for i in range(args.nsteps, 0, -1):
        t = i / args.nsteps
        beta_t = cosine_noise_schedule(jnp.float32(t))
        df = compute_exterior_derivative_nd(x, lambda xb: mod(t, xb, k=3))
        mag = float(exterior_derivative_magnitude(df)[0])
        print(f"step {i:2d}: ||df||_F = {mag:.4f}")
        eps = mod(t, x, k=3) * (-jnp.sqrt(beta_t))
        beta_prev = cosine_noise_schedule(jnp.float32(t - 1 / args.nsteps))
        x = ddim_step(x, eps, jnp.full((1,), beta_t), jnp.full((1,), beta_prev))


if __name__ == "__main__":
    main()
