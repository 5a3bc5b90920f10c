"""Image spectra walkthrough (counterpart of
/root/reference/notebooks/real_image_spectra.ipynb): FFT magnitude of sample
images, radially-binned power spectra averaged over the dataset, and
random-crop patch statistics. Works with --dataset synthetic."""

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
    p.add_argument("--out", default="image_spectra.png")
    p.add_argument("--num_images", type=int, default=64)
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU backend")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")


    from convolutional_diffusion_tpu.analysis.patch_statistics import (
        pairwise_distances,
        radial_power_spectrum,
        random_patches,
    )
    from convolutional_diffusion_tpu.data import get_dataset

    ds, meta = get_dataset(args.dataset, root=args.dataroot)
    images = jnp.asarray(ds.images[: args.num_images])

    # per-image radial spectra (mean over channels), averaged over the set —
    # one vmapped+jitted call (per-image dispatch would pay the remote-TPU
    # round trip 64x)
    gray = jnp.mean(images, axis=-1)
    radii, _ = radial_power_spectrum(gray[0])
    batched = jax.jit(jax.vmap(lambda im: radial_power_spectrum(im)[1]))
    mean_spec = np.asarray(jnp.mean(batched(gray), axis=0))

    # FFT magnitude of the first image
    fmag = np.abs(np.fft.fftshift(np.fft.fft2(np.asarray(gray[0]))))

    # random-crop distance statistics at a few patch sizes
    crops = {
        k: np.asarray(
            pairwise_distances(
                random_patches(images, k, 100, jax.random.PRNGKey(k))
            )
        )
        for k in (3, 6)
    }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(18, 4))
    axes[0].imshow(np.asarray(gray[0]), cmap="gray")
    axes[0].set_title("image")
    axes[0].axis("off")
    axes[1].imshow(np.log1p(fmag), cmap="magma")
    axes[1].set_title("log FFT magnitude")
    axes[1].axis("off")
    axes[2].loglog(radii[1:], np.maximum(mean_spec[1:], 1e-12))
    axes[2].set_title("mean radial power spectrum")
    axes[2].set_xlabel("radial frequency")
    for k, d in crops.items():
        axes[3].hist(d, bins=40, density=True, alpha=0.5, label=f"k={k}")
    axes[3].legend()
    axes[3].set_title("random-crop pairwise distances")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
