"""Model unit tests: creation, forward shapes, conditional paths, sampling
(mirrors the reference test surface, /root/reference/tests/test_models.py,
at the same shape-level granularity; numeric parity is covered by
test_parity_torch.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_diffusion_tpu import sampling
from convolutional_diffusion_tpu.models import (
    DiffusionModel,
    MinimalResNet,
    MinimalUNet,
    TimeClassEmbedding,
)


def _init_and_run(backbone, x, label=None):
    t = jnp.full((x.shape[0],), 0.5, jnp.float32)
    params = backbone.init(jax.random.PRNGKey(0), t, x, label)["params"]
    return backbone.apply({"params": params}, t, x, label)


class TestEmbedding:
    def test_shape(self):
        emb = TimeClassEmbedding(32)
        t = jnp.array([0.1, 0.9])
        out = emb.apply({"params": {}}, t)
        assert out.shape == (2, 32)

    def test_conditional_adds_class_embedding(self):
        emb = TimeClassEmbedding(32, conditional=True, num_classes=10)
        t = jnp.array([0.1, 0.9])
        lab = jnp.array([0, 3])
        params = emb.init(jax.random.PRNGKey(0), t, lab)["params"]
        out = emb.apply({"params": params}, t, lab)
        base = TimeClassEmbedding(32).apply({"params": {}}, t)
        table = params["class_embeddings"]["embedding"]
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base + table[np.array([0, 3])]), rtol=1e-6
        )

    def test_frequency_quirk(self):
        # highest frequency divisor must be exactly 10000 (d-1 denominator)
        emb = TimeClassEmbedding(8)
        t = jnp.array([1.0])
        out = np.asarray(emb.apply({"params": {}}, t))
        d = 4
        denom = 10000 ** (np.arange(d) / (d - 1))
        expect = np.concatenate([np.sin(1 / denom), np.cos(1 / denom)])
        np.testing.assert_allclose(out[0], expect, rtol=1e-5)


@pytest.mark.parametrize("mode", ["circular", "zeros"])
class TestResNet:
    def test_forward_shape(self, mode, batch_images):
        net = MinimalResNet(emb_dim=32, num_layers=2, mode=mode)
        out = _init_and_run(net, batch_images)
        assert out.shape == batch_images.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_conditional(self, mode, batch_images, batch_labels):
        net = MinimalResNet(
            emb_dim=32, num_layers=2, mode=mode, conditional=True, num_classes=10
        )
        out = _init_and_run(net, batch_images, batch_labels)
        assert out.shape == batch_images.shape


@pytest.mark.parametrize("mode", ["circular", "zeros"])
class TestUNet:
    def test_forward_shape(self, mode, batch_images):
        net = MinimalUNet(fsizes=(8, 16, 32), emb_dim=16, mode=mode)
        out = _init_and_run(net, batch_images)
        assert out.shape == batch_images.shape

    def test_conditional(self, mode, batch_images, batch_labels):
        net = MinimalUNet(
            fsizes=(8, 16), emb_dim=16, mode=mode, conditional=True, num_classes=10
        )
        out = _init_and_run(net, batch_images, batch_labels)
        assert out.shape == batch_images.shape

    def test_groupnorm_variant(self, mode, batch_images):
        net = MinimalUNet(
            fsizes=(8, 16), emb_dim=16, mode=mode, normalization="GroupNorm",
            last_norm=True,
        )
        out = _init_and_run(net, batch_images)
        assert out.shape == batch_images.shape


class TestSampling:
    @pytest.fixture
    def model_and_params(self):
        net = MinimalResNet(channels=1, emb_dim=16, num_layers=1, mode="zeros")
        model = DiffusionModel(net, in_channels=1, default_imsize=8)
        params = model.init(jax.random.PRNGKey(0))
        return model, params

    def test_ddim_sample_shape(self, model_and_params):
        model, params = model_and_params
        out = sampling.sample(
            model, params, batch_size=2, nsteps=5, key=jax.random.PRNGKey(1)
        )
        assert out.shape == (2, 8, 8, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_ddpm_sample_shape(self, model_and_params):
        model, params = model_and_params
        out = sampling.sample(
            model, params, batch_size=2, nsteps=5, key=jax.random.PRNGKey(1), ddpm=True
        )
        assert out.shape == (2, 8, 8, 1)
        assert np.isfinite(np.asarray(out)).all()

    def test_breakstep_freezes_tail(self, model_and_params):
        model, params = model_and_params
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 1))
        # breakstep=nsteps returns the input unchanged (loop exits at first i)
        out = sampling.sample_scan(
            model.apply, model.noise_schedule, params, x0, nsteps=5, breakstep=5
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0))
        # breakstep=3 equals manually running steps 5, 4
        out3 = sampling.sample_scan(
            model.apply, model.noise_schedule, params, x0, nsteps=5, breakstep=3
        )
        x = x0
        for i in [5, 4]:
            t = jnp.full((1,), i / 5.0)
            beta_t = model.noise_schedule(t)
            beta_prev = model.noise_schedule(t - 1 / 5.0)
            eps = model.apply(params, t, x, None)
            x = sampling.ddim_step(x, eps, beta_t, beta_prev)
        np.testing.assert_allclose(np.asarray(out3), np.asarray(x), rtol=1e-5, atol=1e-5)

    def test_deterministic(self, model_and_params):
        model, params = model_and_params
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 1))
        a = sampling.sample_scan(
            model.apply, model.noise_schedule, params, x0, nsteps=5
        )
        b = sampling.sample_scan(
            model.apply, model.noise_schedule, params, x0, nsteps=5
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_jitted_sampler(self, model_and_params):
        model, params = model_and_params
        fn = sampling.make_sampler(model, nsteps=5)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
        out = fn(params, x0)
        assert out.shape == x0.shape


def test_breakstep_beyond_nsteps_runs_full_loop():
    """Reference semantics (models.py:48-51): a breakstep the loop never
    reaches means the full reverse pass runs — regression for the scan
    freeze that returned the untouched seed."""
    import numpy as np

    from convolutional_diffusion_tpu import sampling
    from convolutional_diffusion_tpu.models import DiffusionModel, MinimalResNet

    net = MinimalResNet(channels=1, emb_dim=16, num_layers=1, mode="zeros")
    model = DiffusionModel(net, in_channels=1, default_imsize=8)
    params = model.init(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    full = sampling.sample(model, params, x=x0, nsteps=5)
    beyond = sampling.sample(model, params, x=x0, nsteps=5, breakstep=9)
    np.testing.assert_allclose(np.asarray(beyond), np.asarray(full))
    assert not np.allclose(np.asarray(beyond), np.asarray(x0))


def test_lazy_submodule_api():
    """Top-level package exposes subsystems lazily: cdt.scores etc. resolve
    on first attribute access without eager heavy imports."""
    import convolutional_diffusion_tpu as cdt

    assert cdt.scores.LocalEquivScoreModule is not None
    assert cdt.sampling.sample is not None
    assert "analysis" in dir(cdt)
    try:
        cdt.not_a_module
    except AttributeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected AttributeError")
