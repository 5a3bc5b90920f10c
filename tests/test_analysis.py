"""Analysis subsystem tests: exterior-derivative mathematical properties
(conservative => df=0, rotation => known curl) and patch statistics
(distribution fits on synthetic Weibull data, power spectra, drivers) —
the same property-test strategy as the reference
(/root/reference/tests/test_exterior_derivative.py, test_patch_statistics.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu.analysis.exterior_derivative import (
    compute_exterior_derivative,
    compute_exterior_derivative_nd,
    conservative_field,
    exterior_derivative_magnitude,
    is_closed,
    rotation_field,
)
from convolutional_diffusion_tpu.analysis import patch_statistics as ps
from convolutional_diffusion_tpu.data import synthetic_dataset


class TestExteriorDerivative:
    def test_conservative_field_is_closed(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 5))
        df = compute_exterior_derivative(x, conservative_field)
        assert df.shape == (4, 5, 5)
        assert bool(is_closed(df).all())

    def test_gradient_field_is_closed(self):
        def f(x):  # grad of a quartic potential
            return 4 * x**3 + 2 * x

        x = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
        df = compute_exterior_derivative(x, f)
        np.testing.assert_allclose(np.asarray(df), 0.0, atol=1e-5)

    def test_rotation_field_known_magnitude(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (5, 2))
        df = compute_exterior_derivative(x, rotation_field)
        # J = [[0,-1],[1,0]]; df = J - J^T = [[0,-2],[2,0]]; ||df||_F = 2*sqrt(2)
        mag = exterior_derivative_magnitude(df)
        np.testing.assert_allclose(np.asarray(mag), 2 * np.sqrt(2), rtol=1e-5)
        assert not bool(is_closed(df).any())

    def test_antisymmetry(self):
        def f(x):
            return jnp.sin(x) * jnp.roll(x, 1)

        x = jax.random.normal(jax.random.PRNGKey(3), (2, 7))
        df = compute_exterior_derivative(x, f)
        np.testing.assert_allclose(
            np.asarray(df), -np.asarray(df).transpose(0, 2, 1), atol=1e-6
        )

    def test_nd_cnn_shaped_input(self):
        """Image-shaped score fields flatten correctly (batch preserved)."""

        def score_fn(x):  # [b, h, w, c] -> [b, h, w, c]
            return -x + 0.1 * jnp.roll(x, 1, axis=1)

        x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 1))
        df = compute_exterior_derivative_nd(x, score_fn)
        assert df.shape == (2, 16, 16)
        np.testing.assert_allclose(
            np.asarray(df), -np.asarray(df).transpose(0, 2, 1), atol=1e-6
        )
        # rows are independent per batch element
        df0 = compute_exterior_derivative_nd(x[:1], score_fn)
        np.testing.assert_allclose(np.asarray(df[:1]), np.asarray(df0), atol=1e-6)

    def test_batch_independence(self):
        def f(x):
            return x**2

        x = jax.random.normal(jax.random.PRNGKey(5), (3, 4))
        df_all = compute_exterior_derivative(x, f)
        for i in range(3):
            df_i = compute_exterior_derivative(x[i : i + 1], f)
            np.testing.assert_allclose(np.asarray(df_all[i]), np.asarray(df_i[0]))


class TestPatchStatistics:
    def test_random_patches_shape_and_range(self):
        ds = synthetic_dataset(num_samples=32, image_size=16, num_channels=3)
        patches = ps.random_patches(jnp.asarray(ds.images), 5, 50, jax.random.PRNGKey(0))
        assert patches.shape == (50, 5, 5, 3)
        assert np.abs(np.asarray(patches)).max() <= 1.0

    def test_shape_robustness(self):
        """2D / 3D inputs accepted (reference RandomCrop robustness)."""
        key = jax.random.PRNGKey(0)
        single2d = jnp.ones((16, 16))
        assert ps.random_patches(single2d, 4, 5, key).shape == (5, 4, 4, 1)
        stack3d = jnp.ones((6, 16, 16))
        assert ps.random_patches(stack3d, 4, 5, key).shape == (5, 4, 4, 1)
        single_hwc = jnp.ones((16, 16, 3))
        assert ps.random_patches(single_hwc, 4, 5, key).shape == (5, 4, 4, 3)

    def test_exterior_derivative_class_wrapper(self):
        from convolutional_diffusion_tpu.analysis.exterior_derivative import (
            ExteriorDerivative,
            conservative_field,
        )

        ed = ExteriorDerivative(conservative_field, flatten=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
        assert ed(x).shape == (2, 4, 4)
        np.testing.assert_allclose(np.asarray(ed.magnitude(x)), 0.0, atol=1e-5)

    def test_patch_too_large_raises(self):
        ds = synthetic_dataset(num_samples=4, image_size=8, num_channels=1)
        with pytest.raises(ValueError):
            ps.random_patches(jnp.asarray(ds.images), 9, 10, jax.random.PRNGKey(0))

    def test_pairwise_distances_match_scipy(self):
        from scipy.spatial.distance import pdist

        rs = np.random.RandomState(0)
        patches = jnp.asarray(rs.normal(size=(20, 3, 3, 2)).astype(np.float32))
        ours = np.asarray(ps.pairwise_distances(patches))
        ref = pdist(np.asarray(patches).reshape(20, -1))
        np.testing.assert_allclose(np.sort(ours), np.sort(ref), rtol=1e-4)

    def test_fit_recovers_weibull(self):
        from scipy import stats

        data = stats.weibull_min.rvs(2.0, loc=0, scale=3.0, size=4000,
                                     random_state=0)
        fits = ps.fit_distributions(data)
        assert fits["best_fit"] in ("weibull", "gev")  # GEV nests Weibull
        assert fits["weibull"]["ks_pvalue"] > 0.01
        c, loc, scale = fits["weibull"]["params"]
        assert abs(c - 2.0) < 0.3 and abs(scale - 3.0) < 0.3

    def test_fit_too_few_samples_raises(self):
        with pytest.raises(ValueError):
            ps.fit_distributions(np.ones(5))

    def test_radial_power_spectrum_constant_patch(self):
        patch = jnp.ones((8, 8))
        radii, power = ps.radial_power_spectrum(patch)
        # all energy at DC (radius 0)
        assert power[0] > 0
        np.testing.assert_allclose(power[1:], 0.0, atol=1e-6)

    def test_analyze_patch_distances_end_to_end(self, tmp_path):
        ds = synthetic_dataset(num_samples=64, image_size=16, num_channels=1)
        res = ps.analyze_patch_distances(
            ds.images,
            patch_size=4,
            num_samples=60,
            key=jax.random.PRNGKey(1),
            dataset_name="synth",
            save_dir=str(tmp_path),
        )
        assert res["num_distances"] == 60 * 59 // 2
        assert "best_fit" in res["fits"]
        assert os.path.exists(tmp_path / "synth_patch4_analysis.json")
        assert os.path.exists(tmp_path / "synth_patch4_analysis.png")
        with open(tmp_path / "synth_patch4_analysis.json") as f:
            blob = json.load(f)
        assert blob["dataset"] == "synth"

    def test_multi_dataset_driver_contains_failures(self, tmp_path):
        good = synthetic_dataset(num_samples=32, image_size=16, num_channels=1).images
        bad = np.zeros((2, 4, 4, 1), np.float32)  # too small for k=6/10
        logs = []
        res = ps.analyze_multiple_datasets(
            {"good": good, "bad": bad},
            patch_sizes=(3, 6),
            num_samples=40,
            save_dir=str(tmp_path),
            log_fn=logs.append,
        )
        assert 3 in res["good"] and 6 in res["good"]
        assert 6 not in res["bad"]  # failed but did not abort the run
        assert any("FAILED" in l for l in logs)
        assert os.path.exists(tmp_path / "good_distribution_comparison.png")
