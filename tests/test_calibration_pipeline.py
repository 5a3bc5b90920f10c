"""Calibration + ELS pipeline tests: aggregation parity with torch
median/mode, end-to-end calibrate() on a tiny model, artifact layout with
resume/fill, and cross-format (.pt) interop with the reference."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu import pipeline
from convolutional_diffusion_tpu.calibration import calibrate, lower_median, mode_smallest
from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet
from convolutional_diffusion_tpu.schedules import cosine_noise_schedule
from convolutional_diffusion_tpu.scores import (
    LocalEquivBordersScoreModule,
    ScheduledScoreMachine,
)


class TestAggregation:
    def test_lower_median_matches_torch(self):
        import torch

        rs = np.random.RandomState(0)
        a = rs.randint(3, 18, size=(10, 7)).astype(np.float32)
        ours = lower_median(a, axis=0)
        theirs = torch.median(torch.tensor(a), dim=0).values.numpy()
        np.testing.assert_array_equal(ours, theirs)

    def test_mode_matches_torch(self):
        import torch

        rs = np.random.RandomState(1)
        a = rs.choice([3, 5, 7, 9], size=(12, 5)).astype(np.float32)
        ours = mode_smallest(a, axis=0)
        theirs = torch.mode(torch.tensor(a), dim=0).values.numpy()
        np.testing.assert_array_equal(ours, theirs)


@pytest.fixture(scope="module")
def tiny_setup():
    ds_imgs = np.random.RandomState(3).uniform(-1, 1, (24, 8, 8, 1)).astype(np.float32)
    ds_labs = np.random.RandomState(4).randint(0, 3, (24,)).astype(np.int32)
    net = MinimalResNet(channels=1, emb_dim=16, num_layers=1, mode="zeros")
    model = DiffusionModel(net, in_channels=1, default_imsize=8)
    params = model.init(jax.random.PRNGKey(0))
    return (ds_imgs, ds_labs), model, params


class TestCalibrate:
    def test_unconditional(self, tiny_setup):
        dataset, model, params = tiny_setup
        mods = {
            k: LocalEquivBordersScoreModule(
                dataset, kernel_size=k, batch_size=24, schedule=cosine_noise_schedule
            )
            for k in (3, 5)
        }

        def eps_fn(t, x, label):
            return model.apply(params, t, x, None)

        res = calibrate(
            eps_fn,
            mods,
            image_size=8,
            in_channels=1,
            nsamps=4,
            nsteps=5,
            key=jax.random.PRNGKey(7),
        )
        assert res["k_optimals"].shape == (4, 5)
        assert set(np.unique(res["k_optimals"])) <= {3, 5}
        assert res["median"].shape == (5,)
        assert res["mode"].shape == (5,)

    def test_conditional_label_grouping(self, tiny_setup):
        dataset, model, params = tiny_setup
        mods = {
            3: LocalEquivBordersScoreModule(
                dataset, kernel_size=3, batch_size=24, schedule=cosine_noise_schedule
            )
        }

        def eps_fn(t, x, label):
            return model.apply(params, t, x, None)

        res = calibrate(
            eps_fn,
            mods,
            image_size=8,
            in_channels=1,
            nsamps=3,
            nsteps=3,
            conditional=True,
            nlabels=3,
            key=jax.random.PRNGKey(8),
        )
        assert np.all(res["k_optimals"] == 3)


GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "calibration.npz")


class TestCalibrationGolden:
    """End-to-end parity with the REFERENCE calibrate()
    (scales_calibration.py:33-188): same CNN weights, same recorded torch
    seed/label draws, same per-step k choices and median/mode aggregates."""

    CASES = {
        # tag -> (module type, conditional, eval_mode, nsteps)
        "uncond_cos": ("bbELS", False, "cos", 4),
        "cond_cos": ("bbELS", True, "cos", 3),
        "uncond_l2": ("ELS", False, "l2_dist", 3),
    }

    @pytest.fixture(scope="class")
    def golden(self):
        if not os.path.exists(GOLDEN):
            pytest.skip("calibration golden missing — run tools/make_goldens.py")
        return np.load(GOLDEN)

    @pytest.mark.parametrize("tag", sorted(CASES))
    def test_matches_reference(self, golden, tag):
        from convolutional_diffusion_tpu import convert
        from convolutional_diffusion_tpu.scores import LocalEquivScoreModule

        smt, conditional, eval_mode, nsteps = self.CASES[tag]
        z = golden
        sd = {
            k[len(f"{tag}/sd/"):]: z[k]
            for k in z.files
            if k.startswith(f"{tag}/sd/")
        }
        net = MinimalResNet(
            channels=1, emb_dim=16, kernel_size=3, num_layers=1, lastksize=3,
            mode="zeros", conditional=conditional,
            **({"num_classes": 3} if conditional else {}),
        )
        params = convert.resnet_params_from_torch(
            sd, num_layers=1, normalization=None, conditional=conditional
        )

        def eps_fn(t, x, label):
            return net.apply({"params": params}, t, x, label)

        imgs = np.transpose(z["imgs"], (0, 2, 3, 1))  # NCHW -> NHWC
        dataset = (imgs, z["labs"].astype(np.int32))
        cls = (
            LocalEquivScoreModule if smt == "ELS"
            else LocalEquivBordersScoreModule
        )
        mods = {
            k: cls(
                dataset, kernel_size=k, batch_size=6,
                schedule=cosine_noise_schedule,
            )
            for k in (3, 5)
        }
        x0 = jnp.asarray(np.transpose(z[f"{tag}/x0"], (0, 2, 3, 1)))
        labels = (
            jnp.asarray(z[f"{tag}/labels"].astype(np.int32))
            if conditional else None
        )
        res = calibrate(
            eps_fn, mods, image_size=8, in_channels=1,
            nsamps=x0.shape[0], nsteps=nsteps, conditional=conditional,
            nlabels=3, eval_mode=eval_mode, x0=x0, labels=labels,
        )
        np.testing.assert_array_equal(
            res["k_optimals"], z[f"{tag}/k_optimals"]
        )
        np.testing.assert_array_equal(res["median"], z[f"{tag}/median"])
        np.testing.assert_array_equal(res["mode"], z[f"{tag}/mode"])


class TestCalibrateWithReferencePickle:
    def test_calibrate_cli_accepts_pt_model(self, tmp_path):
        """The calibrate CLI must ingest a reference-format .pt whole pickle
        directly (scales_calibration.py workflow)."""
        import os

        pkl = os.path.join(
            os.path.dirname(__file__), "goldens", "pickles", "backbone_resnet_cond.pt"
        )
        if not os.path.exists(pkl):
            pytest.skip("golden pickle missing")
        from convolutional_diffusion_tpu.cli import calibrate as cal_cli

        tld = str(tmp_path / "out")
        cal_cli.main([
            "--modelfile", pkl, "--dataset", "synthetic",
            "--kernelsizes", "3", "--nsamps", "2", "--nsteps", "2",
            "--scorebatchsize", "32", "--maxsamps", "32", "--tld", tld, "--cpu",
            "--conditional",
        ])
        med = np.load(str(tmp_path / "out" / "scales_median.npy"))
        assert med.shape == (2,) and set(med) == {3}


class TestPipeline:
    @pytest.fixture
    def machine(self, tiny_setup):
        dataset, _, _ = tiny_setup
        mod = LocalEquivBordersScoreModule(
            dataset, kernel_size=3, batch_size=24, schedule=cosine_noise_schedule
        )
        return ScheduledScoreMachine(
            mod, in_channels=1, imsize=8, scales=[3, 3, 3, 3, 3]
        )

    def test_generate_layout_and_resume(self, machine, tmp_path):
        out = str(tmp_path / "exp")
        n = pipeline.generate_els_samples(
            machine, out, numiters=4, in_channels=1, image_size=8, batch=2,
            log_fn=lambda s: None,
        )
        assert n == 4
        for i in range(4):
            assert os.path.exists(os.path.join(out, "seeds", f"{i:04d}.npy"))
            assert os.path.exists(os.path.join(out, "els_outputs", f"{i:04d}.npy"))
        # resume: delete one output, regenerate only the tail
        os.remove(os.path.join(out, "els_outputs", "0002.npy"))
        n2 = pipeline.generate_els_samples(
            machine, out, numiters=4, in_channels=1, image_size=8, batch=2,
            log_fn=lambda s: None,
        )
        assert n2 == 2  # indices 2 and 3 regenerated
        # deterministic seeds: index 3's seed unchanged by the resume
        s3a = np.load(os.path.join(out, "seeds", "0003.npy"))
        n3 = pipeline.generate_els_samples(
            machine, out, numiters=4, in_channels=1, image_size=8,
            force_overwrite=True, log_fn=lambda s: None,
        )
        s3b = np.load(os.path.join(out, "seeds", "0003.npy"))
        np.testing.assert_array_equal(s3a, s3b)

    def test_conditional_batched_generation(self, machine, tmp_path):
        """Conditional generation groups seeds by label; batched output must
        equal the batch=1 run index-for-index (same fold_in seeds)."""
        out_a = str(tmp_path / "a")
        out_b = str(tmp_path / "b")
        for out, bs in ((out_a, 1), (out_b, 6)):
            pipeline.generate_els_samples(
                machine, out, numiters=6, in_channels=1, image_size=8,
                conditional=True, nlabels=3, batch=bs, log_fn=lambda s: None,
            )
        for i in range(6):
            np.testing.assert_array_equal(
                np.load(os.path.join(out_a, "labels", f"{i:04d}.npy")),
                np.load(os.path.join(out_b, "labels", f"{i:04d}.npy")),
            )
            np.testing.assert_allclose(
                np.load(os.path.join(out_a, "els_outputs", f"{i:04d}.npy")),
                np.load(os.path.join(out_b, "els_outputs", f"{i:04d}.npy")),
                rtol=2e-4, atol=1e-5,
            )

    def test_fill_mode(self, machine, tmp_path):
        out = str(tmp_path / "exp")
        pipeline.generate_els_samples(
            machine, out, numiters=3, in_channels=1, image_size=8,
            log_fn=lambda s: None,
        )
        n = pipeline.generate_els_samples(
            machine, out, numiters=3, in_channels=1, image_size=8,
            idealname="ideal", fill=True, log_fn=lambda s: None,
        )
        assert n == 3
        assert os.path.exists(os.path.join(out, "ideal", "0000.npy"))

    def test_pt_interop_roundtrip(self, tmp_path):
        """Artifacts written as .pt are readable (reference interop)."""
        import torch

        arr = np.random.RandomState(0).normal(size=(1, 1, 8, 8)).astype(np.float32)
        pipeline.save_array(str(tmp_path / "x"), arr, fmt="pt")
        back = pipeline.load_array(str(tmp_path / "x"))
        np.testing.assert_array_equal(arr, back)
        # NCHW reference artifact converts to NHWC on load
        fixed = pipeline._nchw_to_nhwc_if_needed(back, channels=1)
        assert fixed.shape == (1, 8, 8, 1)

    def test_evaluate_correlations(self, machine, tiny_setup, tmp_path):
        dataset, model, params = tiny_setup
        out = str(tmp_path / "exp")
        pipeline.generate_els_samples(
            machine, out, numiters=3, in_channels=1, image_size=8,
            log_fn=lambda s: None,
        )
        pipeline.generate_els_samples(
            machine, out, numiters=3, in_channels=1, image_size=8,
            idealname="ideal", fill=True, log_fn=lambda s: None,
        )
        from convolutional_diffusion_tpu import sampling

        def sample_fn(x, labels):
            return sampling.sample_scan(
                model.apply, model.noise_schedule, params, x, nsteps=5
            )

        res = pipeline.evaluate_correlations(out, sample_fn, channels=1)
        assert res["n"] == 3
        assert len(res["ideal_corrs"]) == 3
        # ELS output == ideal output here (same machine) => identical corrs
        np.testing.assert_allclose(res["ideal_corrs"], res["target_corrs"], atol=1e-6)
        assert -1.01 <= res["median_target"] <= 1.01

    def test_auto_detect_scales_against_reference_layout(self, tmp_path):
        ck = tmp_path / "checkpoints"
        ck.mkdir()
        (ck / "scales_MNIST_ResNet_zeros.pt").write_bytes(b"x")
        found = pipeline.auto_detect_scales(str(ck), "mnist")
        assert found.endswith("scales_MNIST_ResNet_zeros.pt")
        with pytest.raises(FileNotFoundError):
            pipeline.auto_detect_scales(str(ck), "cifar10")
