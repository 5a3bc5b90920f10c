"""Golden parity for pipeline.evaluate_correlations against the reference
eval_script's printed numbers (scripts/eval_script.py:57-75), recorded by
tools/make_goldens.py --only eval on fixture seed/els_output/ideal triples.
"""

import os

import numpy as np
import pytest

from convolutional_diffusion_tpu import convert, pipeline, sampling
from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "eval_corrs.npz")


def nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


@pytest.mark.parametrize("tag,conditional", [("uncond", False), ("cond", True)])
def test_evaluate_correlations_golden(tmp_path, tag, conditional):
    z = np.load(GOLDEN)
    sd = {k.split("/sd/")[1]: z[k] for k in z.files if k.startswith(f"{tag}/sd/")}
    net = MinimalResNet(
        channels=3, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3,
        mode="zeros", conditional=conditional,
        **({"num_classes": 10} if conditional else {}),
    )
    params = convert.resnet_params_from_torch(
        sd, num_layers=2, normalization=None, conditional=conditional
    )
    model = DiffusionModel(net, in_channels=3, default_imsize=16)

    exp = str(tmp_path / "exp")
    for sub in ("seeds", "els_outputs", "ideal", "labels"):
        os.makedirs(os.path.join(exp, sub))
    seeds = z[f"{tag}/seeds"]  # [n, c, h, w] NCHW, the reference layout
    for i in range(seeds.shape[0]):
        pipeline.save_array(os.path.join(exp, "seeds", f"{i:04d}"), seeds[i : i + 1])
        pipeline.save_array(
            os.path.join(exp, "els_outputs", f"{i:04d}"), z[f"{tag}/theo"][i : i + 1]
        )
        pipeline.save_array(
            os.path.join(exp, "ideal", f"{i:04d}"), z[f"{tag}/ideal"][i : i + 1]
        )
        if conditional:
            pipeline.save_array(
                os.path.join(exp, "labels", f"{i:04d}"),
                np.asarray(z[f"{tag}/labels"][i]).reshape(1),
            )

    def sample_fn(x, labels):
        return sampling.sample(
            model, params, x=x, nsteps=20, label=labels
        )

    res = pipeline.evaluate_correlations(
        exp, sample_fn, conditional=conditional, channels=3
    )
    assert res["n"] == seeds.shape[0]
    # the reference prints median(ideal), median(target), frac(target>ideal)
    np.testing.assert_allclose(
        res["median_ideal"], float(z[f"{tag}/median_ideal"]), atol=5e-5
    )
    np.testing.assert_allclose(
        res["median_target"], float(z[f"{tag}/median_target"]), atol=5e-5
    )
    assert res["frac_els_beats_is"] == float(z[f"{tag}/frac"])
