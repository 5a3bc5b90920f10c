"""Patch-distance statistics: extreme-value fits + radial power spectra.

Counterpart of `/root/reference/src/utils/patch_statistics.py`: sample random
k x k patches from a dataset, compute all pairwise L2 distances, fit
Weibull / Gumbel / GEV distributions (AIC + Kolmogorov-Smirnov), and compute
the radial power spectrum of the mean patch. Plots + JSON export + a
multi-dataset driver with per-item error containment (the reference's
catch-and-continue style, `patch_statistics.py:272-278,750-757`).

TPU-native: patch gathering and the pairwise-distance matrix run on device
(one ||a||^2 - 2ab + ||b||^2 matmul on the MXU, replacing torch.cdist at
`:294`); scipy fits stay on host (tiny data).
"""

from __future__ import annotations

import json
import os
import traceback
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "random_patches",
    "pairwise_distances",
    "fit_distributions",
    "radial_power_spectrum",
    "analyze_patch_distances",
    "analyze_multiple_datasets",
    "plot_distribution_comparison",
]


def random_patches(
    images: jnp.ndarray, patch_size: int, num_samples: int, key: jax.Array
) -> jnp.ndarray:
    """num_samples random k x k crops, one per randomly chosen image.

    Accepts [N, h, w, c], [N, h, w] (channelless), or a single [h, w(, c)]
    image (robust-shape handling mirroring the reference's RandomCrop,
    patch_statistics.py:126-193) -> [num_samples, k, k, c].
    """
    images = jnp.asarray(images)
    if images.ndim == 2:  # single grayscale image
        images = images[None, :, :, None]
    elif images.ndim == 3:
        # [N, h, w] stack vs single [h, w, c] image: a trailing dim of 1-4
        # channels disambiguates as a single image
        if images.shape[-1] <= 4:
            images = images[None]
        else:
            images = images[..., None]
    n, h, w, c = images.shape
    k = patch_size
    if k > h or k > w:
        raise ValueError(f"patch_size {k} exceeds image size {h}x{w}")
    ki, kr, kc = jax.random.split(key, 3)
    idx = jax.random.randint(ki, (num_samples,), 0, n)
    rows = jax.random.randint(kr, (num_samples,), 0, h - k + 1)
    cols = jax.random.randint(kc, (num_samples,), 0, w - k + 1)

    def crop(i, r, ccol):
        return jax.lax.dynamic_slice(images[i], (r, ccol, 0), (k, k, c))

    return jax.vmap(crop)(idx, rows, cols)


@jax.jit
def pairwise_distances(patches: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular pairwise L2 distances between flattened patches.

    One MXU matmul: ||a-b||^2 = ||a||^2 - 2ab + ||b||^2 (replaces torch.cdist,
    reference :294). Returns the condensed [m*(m-1)/2] vector.
    """
    m = patches.shape[0]
    flat = patches.reshape(m, -1)
    sq = jnp.sum(flat**2, axis=1)
    gram = jnp.dot(flat, flat.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(sq[:, None] - 2 * gram + sq[None, :], 0.0)
    iu = jnp.triu_indices(m, k=1)
    return jnp.sqrt(d2[iu])


def fit_distributions(data: np.ndarray) -> Dict[str, Dict]:
    """Fit Weibull / Gumbel / GEV; rank by AIC; KS goodness-of-fit.

    Mirrors the reference's candidate set and selection criterion
    (`patch_statistics.py:65-123`). Returns per-distribution dicts plus
    'best_fit' (lowest AIC).
    """
    from scipy import stats

    data = np.asarray(data, np.float64)
    data = data[np.isfinite(data)]
    if data.size < 10:
        raise ValueError(f"need >= 10 samples to fit, got {data.size}")

    candidates = {
        "weibull": stats.weibull_min,
        "gumbel": stats.gumbel_r,
        "gev": stats.genextreme,
    }
    results: Dict[str, Dict] = {}
    for name, dist in candidates.items():
        try:
            params = dist.fit(data)
            loglik = float(np.sum(dist.logpdf(data, *params)))
            aic = 2 * len(params) - 2 * loglik
            ks_stat, ks_p = stats.kstest(data, dist.cdf, args=params)
            results[name] = {
                "params": [float(p) for p in params],
                "loglik": loglik,
                "aic": float(aic),
                "ks_statistic": float(ks_stat),
                "ks_pvalue": float(ks_p),
            }
        except Exception as e:  # keep other fits alive (reference style)
            results[name] = {"error": repr(e)}
    fitted = {k: v for k, v in results.items() if "aic" in v}
    if fitted:
        results["best_fit"] = min(fitted, key=lambda k: fitted[k]["aic"])
    return results


def radial_power_spectrum(patch: jnp.ndarray):
    """Radially-binned power spectrum of a 2D patch (mean over channels).

    Counterpart of the reference's fft2 + radial binning (`:309-346`).
    Returns (radii [r], power [r]).
    """
    if patch.ndim == 3:
        patch = jnp.mean(patch, axis=-1)
    h, w = patch.shape
    f = jnp.fft.fftshift(jnp.fft.fft2(patch))
    power = jnp.abs(f) ** 2
    cy, cx = h // 2, w // 2
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    r = jnp.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    rbin = jnp.round(r).astype(jnp.int32)
    nbins = int(np.ceil(np.sqrt(cy**2 + cx**2))) + 1
    sums = jax.ops.segment_sum(power.reshape(-1), rbin.reshape(-1), num_segments=nbins)
    counts = jax.ops.segment_sum(
        jnp.ones((h * w,)), rbin.reshape(-1), num_segments=nbins
    )
    radial = sums / jnp.maximum(counts, 1)
    # jnp (not numpy) so the function stays vmap/jit-composable
    return np.arange(nbins), radial


def analyze_patch_distances(
    images,
    *,
    patch_size: int = 3,
    num_samples: int = 200,
    key: Optional[jax.Array] = None,
    dataset_name: str = "dataset",
    save_dir: Optional[str] = None,
    make_plots: bool = True,
) -> Dict:
    """Full single-config analysis: sample patches, fit distance
    distributions, compute the mean-patch radial power spectrum; optionally
    write a 6-panel figure + JSON (reference `:370-579`)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    images = jnp.asarray(np.asarray(images), jnp.float32)
    patches = random_patches(images, patch_size, num_samples, key)
    dists = np.asarray(pairwise_distances(patches))
    fits = fit_distributions(dists)
    mean_patch = jnp.mean(patches, axis=0)
    radii, power = radial_power_spectrum(mean_patch)
    results = {
        "dataset": dataset_name,
        "patch_size": patch_size,
        "num_samples": int(num_samples),
        "num_distances": int(dists.size),
        "distance_stats": {
            "mean": float(dists.mean()),
            "std": float(dists.std()),
            "min": float(dists.min()),
            "max": float(dists.max()),
        },
        "fits": fits,
        "power_spectrum": {"radii": radii.tolist(), "power": np.asarray(power).tolist()},
    }
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        base = os.path.join(save_dir, f"{dataset_name}_patch{patch_size}")
        with open(base + "_analysis.json", "w") as f:
            json.dump(results, f, indent=2)
        if make_plots:
            _plot_analysis(dists, fits, mean_patch, radii, power, base)
    results["_distances"] = dists  # in-memory only (not serialized)
    return results


def _plot_analysis(dists, fits, mean_patch, radii, power, base):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy import stats

    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    ax = axes[0, 0]
    ax.hist(dists, bins=50, density=True, alpha=0.6)
    xs = np.linspace(dists.min(), dists.max(), 200)
    for name, dist in (
        ("weibull", stats.weibull_min),
        ("gumbel", stats.gumbel_r),
        ("gev", stats.genextreme),
    ):
        if "params" in fits.get(name, {}):
            ax.plot(xs, dist.pdf(xs, *fits[name]["params"]), label=name)
    ax.legend()
    ax.set_title("patch distance distribution")

    axes[0, 1].imshow(np.asarray(jnp.mean(mean_patch, -1)), cmap="gray")
    axes[0, 1].set_title("mean patch")
    axes[0, 2].semilogy(radii[1:], np.maximum(power[1:], 1e-20))
    axes[0, 2].set_title("radial power spectrum")

    axes[1, 0].hist(dists, bins=50, cumulative=True, density=True, alpha=0.6)
    axes[1, 0].set_title("empirical CDF")
    best = fits.get("best_fit")
    axes[1, 1].axis("off")
    lines = [f"best fit: {best}"]
    for name in ("weibull", "gumbel", "gev"):
        r = fits.get(name, {})
        if "aic" in r:
            lines.append(f"{name}: AIC={r['aic']:.1f} KS p={r['ks_pvalue']:.3f}")
    axes[1, 1].text(0.05, 0.5, "\n".join(lines), fontsize=11, va="center")
    axes[1, 2].boxplot(dists, vert=True)
    axes[1, 2].set_title("distance spread")
    fig.tight_layout()
    fig.savefig(base + "_analysis.png", dpi=100)
    plt.close(fig)


def plot_distribution_comparison(results_by_patch: Dict[int, Dict], dataset_name: str,
                                 save_dir: str):
    """Histogram-vs-best-fit comparison across patch sizes
    (reference `:582-686`; produces `{ds}_distribution_comparison.png`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy import stats

    dmap = {"weibull": stats.weibull_min, "gumbel": stats.gumbel_r,
            "gev": stats.genextreme}
    n = len(results_by_patch)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
    for ax, (ps, res) in zip(axes[0], sorted(results_by_patch.items())):
        d = res.get("_distances")
        if d is None:
            continue
        ax.hist(d, bins=50, density=True, alpha=0.6)
        best = res["fits"].get("best_fit")
        if best and "params" in res["fits"][best]:
            xs = np.linspace(d.min(), d.max(), 200)
            ax.plot(xs, dmap[best].pdf(xs, *res["fits"][best]["params"]),
                    label=f"{best} (best)")
            ax.legend()
        ax.set_title(f"{dataset_name} k={ps}")
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{dataset_name}_distribution_comparison.png")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def analyze_multiple_datasets(
    datasets: Dict[str, object],  # name -> images [N,h,w,c]
    *,
    patch_sizes: Sequence[int] = (3, 6, 10),
    num_samples: int = 200,
    save_dir: Optional[str] = None,
    key: Optional[jax.Array] = None,
    log_fn=print,
) -> Dict[str, Dict[int, Dict]]:
    """Driver over datasets x patch sizes with per-item error containment
    (reference `analyze_multiple_datasets`, `:689-767`)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    all_results: Dict[str, Dict[int, Dict]] = {}
    for name, images in datasets.items():
        per_ds: Dict[int, Dict] = {}
        for ps in patch_sizes:
            try:
                key, sub = jax.random.split(key)
                per_ds[ps] = analyze_patch_distances(
                    images,
                    patch_size=ps,
                    num_samples=num_samples,
                    key=sub,
                    dataset_name=name,
                    save_dir=save_dir,
                )
                best = per_ds[ps]["fits"].get("best_fit")
                log_fn(f"{name} k={ps}: best={best}")
            except Exception as e:
                log_fn(f"{name} k={ps} FAILED: {e!r}")
                traceback.print_exc()
        if per_ds and save_dir:
            try:
                plot_distribution_comparison(per_ds, name, save_dir)
            except Exception as e:
                log_fn(f"{name} comparison plot FAILED: {e!r}")
        all_results[name] = per_ds
    return all_results
