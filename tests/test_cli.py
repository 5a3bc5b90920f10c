"""CLI tests (strategy per reference tests/test_scripts.py): importability,
--help exits 0, and tiny end-to-end runs on the synthetic dataset — which
would catch a SyntaxError like the reference's els_script bug."""

import importlib
import os
import subprocess
import sys

import numpy as np
import pytest

CLI_MODULES = [
    "train",
    "train_64x64",
    "calibrate",
    "els",
    "evaluate",
    "analyze_ed",
    "patch_stats",
    "patch_stats_grayscale",
    "verify_plots",
]

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))


@pytest.mark.parametrize("name", CLI_MODULES)
def test_importable(name):
    mod = importlib.import_module(f"convolutional_diffusion_tpu.cli.{name}")
    assert callable(mod.main)


@pytest.mark.parametrize("name", CLI_MODULES)
def test_help_exits_zero(name):
    r = subprocess.run(
        [sys.executable, "-m", f"convolutional_diffusion_tpu.cli.{name}", "--help"],
        capture_output=True, env=ENV, timeout=240,
    )
    assert r.returncode == 0, r.stderr.decode()[-500:]


def test_train_end_to_end(tmp_path):
    from convolutional_diffusion_tpu.cli import train

    home = str(tmp_path / "ckpts")
    train.main([
        "--dataset", "synthetic", "--epochs", "2", "--batchsize", "8",
        "--layers", "1", "--mult", "1", "--resnet", "--mode", "zeros",
        "--homedir", home, "--saveinterval", "1", "--suppress",
        "--maxsamps", "32", "--ndevices", "1",
    ])
    # a checkpoint dir with model_config metadata must exist and reload
    sub = os.listdir(home)
    assert len(sub) == 1
    from convolutional_diffusion_tpu.cli.common import load_model

    model, params = load_model(os.path.join(home, sub[0]))
    assert model.backbone.mode == "zeros"


def test_els_and_evaluate_end_to_end(tmp_path):
    from convolutional_diffusion_tpu.cli import els, evaluate
    from convolutional_diffusion_tpu.pipeline import save_array

    ck = tmp_path / "checkpoints"
    ck.mkdir()
    import json

    with open(ck / "scales_SYNTHETIC_ResNet_zeros.json", "w") as f:
        json.dump([3, 3, 3, 3, 3], f)
    results = str(tmp_path / "results")
    common = [
        "--dataset", "synthetic", "--numiters", "3", "--cpu",
        "--checkpoints", str(ck),
        "--scalesfile", str(ck / "scales_SYNTHETIC_ResNet_zeros.json"),
        "--results", results, "--expname", "exp", "--scorebatchsize", "64",
    ]
    els.main(common + ["--scoremoduletype", "bbELS", "--batch", "3"])
    els.main(common + ["--scoremoduletype", "IS", "--idealname", "ideal", "--fill"])
    exp = os.path.join(results, "exp")
    for sub in ("seeds", "els_outputs", "ideal"):
        assert len(os.listdir(os.path.join(exp, sub))) == 3

    # evaluate against a freshly trained tiny model checkpoint
    from convolutional_diffusion_tpu.cli import train

    home = str(tmp_path / "ckpts")
    train.main([
        "--dataset", "synthetic", "--epochs", "1", "--batchsize", "8",
        "--layers", "1", "--mult", "1", "--resnet", "--mode", "zeros",
        "--homedir", home, "--saveinterval", "1", "--suppress",
        "--maxsamps", "32", "--ndevices", "1",
    ])
    model_dir = os.path.join(home, os.listdir(home)[0])
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        evaluate.main([
            "--exp_fname", exp, "--model_fname", model_dir,
            "--dsname", "synthetic", "--nsteps", "5",
        ])
    finally:
        os.chdir(cwd)
    assert os.path.exists(tmp_path / "scatter_corrs.png")


def test_calibrate_end_to_end(tmp_path):
    from convolutional_diffusion_tpu.cli import calibrate, train

    home = str(tmp_path / "ckpts")
    train.main([
        "--dataset", "synthetic", "--epochs", "1", "--batchsize", "8",
        "--layers", "1", "--mult", "1", "--resnet", "--mode", "zeros",
        "--homedir", home, "--saveinterval", "1", "--suppress",
        "--maxsamps", "32", "--ndevices", "1",
    ])
    model_dir = os.path.join(home, os.listdir(home)[0])
    tld = str(tmp_path / "scales_out")
    calibrate.main([
        "--modelfile", model_dir, "--dataset", "synthetic",
        "--kernelsizes", "3", "5", "--nsamps", "2", "--nsteps", "3",
        "--scorebatchsize", "64", "--maxsamps", "64", "--tld", tld, "--cpu",
    ])
    med = np.load(os.path.join(tld, "scales_median.npy"))
    assert med.shape == (3,)
    assert set(med) <= {3, 5}
    import json

    with open(os.path.join(tld, "scales_median.json")) as f:
        assert len(json.load(f)) == 3


def test_patch_stats_and_verify_plots(tmp_path):
    from convolutional_diffusion_tpu.cli import patch_stats, verify_plots

    results = str(tmp_path / "ps")
    patch_stats.main([
        "--datasets", "synthetic", "--patch_sizes", "3", "--num_samples", "40",
        "--results", results,
    ])
    assert os.path.exists(os.path.join(results, "synthetic_distribution_comparison.png"))
    verify_plots.main(["--datasets", "synthetic", "--results", results])
    with pytest.raises(SystemExit):
        verify_plots.main(["--datasets", "missing_ds", "--results", results])


def test_analyze_ed_end_to_end(tmp_path):
    from convolutional_diffusion_tpu.cli import analyze_ed

    results = str(tmp_path / "ed")
    analyze_ed.main([
        "--dataset", "synthetic", "--results", results, "--nsteps", "3",
        "--image_size", "8", "--max_samples", "16", "--kernel_size", "3",
        "--scorebatchsize", "16", "--single", "--checkpoints", str(tmp_path),
    ])
    # reference-parity artifact names under the per-dataset subdirectory
    # (analyze_exterior_derivative.py: output_dir / dataset)
    out = os.path.join(results, "synthetic")
    assert os.path.exists(os.path.join(out, "summary_stats.json"))
    assert os.path.exists(os.path.join(out, "ed_analysis_single.png"))
    assert os.path.exists(os.path.join(out, "ed_analysis_single.npz"))
