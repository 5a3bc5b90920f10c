"""convolutional_diffusion_tpu — a TPU-native framework for convolutional
diffusion models and their analytic (ideal-score) theory.

Ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch codebase (henhen724/convolutional_diffusion): trained convolutional
diffusion backbones + DDIM/DDPM samplers, exact Bayes-optimal analytic score
machines (IS/LS/ELS/bbELS) with calibrated kernel-size schedules, and the
patch-statistics / exterior-derivative analysis subsystems — built TPU-first:
NHWC layouts, `lax.scan` samplers, flash-attention-style Pallas kernels for
the patch-softmax inner loop, and `jax.sharding` data/dataset parallelism.
"""

__version__ = "0.1.0"

from . import schedules
from .models import DiffusionModel, MinimalResNet, MinimalUNet, TimeClassEmbedding, UBlock
from .schedules import (
    cosine_noise_schedule,
    exponential_schedule,
    get_schedule,
    linear_noise_schedule,
)

# Heavier subsystems load lazily: `cdt.scores`, `cdt.sampling`, ... work
# without eager submodule imports (keeps `import convolutional_diffusion_tpu`
# light — the scores/analysis stacks pull in the Pallas kernel machinery).
_LAZY_SUBMODULES = (
    "analysis",
    "calibration",
    "convert",
    "data",
    "ops",
    "parallel",
    "pipeline",
    "sampling",
    "scores",
    "training",
    "utils",
)


def __getattr__(name):
    if name in _LAZY_SUBMODULES:
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY_SUBMODULES))


__all__ = [
    "schedules",
    "DiffusionModel",
    "MinimalResNet",
    "MinimalUNet",
    "TimeClassEmbedding",
    "UBlock",
    "cosine_noise_schedule",
    "exponential_schedule",
    "linear_noise_schedule",
    "get_schedule",
    *_LAZY_SUBMODULES,
]
