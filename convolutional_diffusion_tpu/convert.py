"""torch <-> Flax parameter conversion.

Two jobs:
 1. Map a torch ``state_dict`` of the reference backbones
    (`/root/reference/src/models.py`: MinimalResNet / MinimalUNet / UBlock /
    EmbeddingModule, saved as whole pickles by `src/utils/train.py:62-63`)
    onto this framework's Flax parameter trees.
 2. Unpickle reference ``backbone_*.pt`` files *without importing the
    reference package*, via stub classes (see `load_torch_pickle`).

Layout conventions:
 - torch Conv2d weight [O, I, kh, kw]  -> flax kernel [kh, kw, I, O]
 - torch Linear weight [O, I]          -> flax kernel [I, O]
 - torch ConvTranspose2d weight [I, O, kh, kw] -> flax ConvTranspose
   (transpose_kernel=True) kernel [kh, kw, O, I]
 - torch GroupNorm weight/bias         -> flax scale/bias
 - torch Embedding weight              -> flax Embed embedding
"""

from __future__ import annotations

import io
import pickle
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def conv_kernel(w) -> np.ndarray:
    """torch [O, I, kh, kw] -> flax [kh, kw, I, O]."""
    return _np(w).transpose(2, 3, 1, 0)


def conv_transpose_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d [I, O, kh, kw] -> flax transpose_kernel=True
    kernel [kh, kw, O, I]."""
    return _np(w).transpose(2, 3, 1, 0)


def dense_kernel(w) -> np.ndarray:
    """torch [O, I] -> flax [I, O]."""
    return _np(w).transpose(1, 0)


def _conv_entry(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": conv_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _dense_entry(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": dense_kernel(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _norm_entry(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def resnet_params_from_torch(
    sd: Mapping[str, Any], *, num_layers: int, normalization: Optional[str] = None,
    add_one: bool = True, conditional: bool = False,
) -> Dict[str, Any]:
    """Map a reference MinimalResNet state_dict onto our MinimalResNet tree.

    torch module layout: src/models.py:139-157.
    """
    params: Dict[str, Any] = {}
    if conditional:
        params["embedding"] = {
            "class_embeddings": {
                "embedding": _np(sd["embedding.class_embeddings.weight"])
            }
        }
    params["up_projection"] = {"conv": _conv_entry(sd, "up_projection")}

    n_embs = num_layers + (1 if add_one else 0)
    for i in range(n_embs):
        params[f"emb_{i}"] = {
            "dense": _dense_entry(sd, f"embs.{i}.0"),
            "norm": _norm_entry(sd, f"embs.{i}.1"),
        }
    for i in range(num_layers):
        params[f"conv_{i}"] = {"conv": _conv_entry(sd, f"convs.{i}.0")}
        if normalization is not None:
            params[f"conv_norm_{i}"] = _norm_entry(sd, f"convs.{i}.1")

    if normalization is None:
        params["down_projection"] = {"conv": _conv_entry(sd, "down_projection")}
    else:
        params["down_norm"] = _norm_entry(sd, "down_projection.0")
        params["down_projection"] = {"conv": _conv_entry(sd, "down_projection.1")}
    return params


def _bn_stats_entry(sd, prefix) -> Dict[str, np.ndarray]:
    """torch BatchNorm running stats -> TorchBatchNorm batch_stats leaves."""
    return {
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }


def _ublock_params_from_torch(sd: Mapping[str, Any], prefix: str):
    """Map a torch UBlock (src/models.py:285-312) under `prefix`.

    The torch block is one nn.Sequential mixing convs / norms / ReLUs; convs
    are 4-D weights, norms 1-D — classify by ndim in index order. Returns
    (params, batch_stats); batch_stats is non-empty iff the norms are
    BatchNorm (detected by their running_mean buffers, src/models.py:308-309).
    """
    params: Dict[str, Any] = {"emb_dense": _dense_entry(sd, f"{prefix}.emb.1")}
    stats: Dict[str, Any] = {}
    idxs = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(re.escape(prefix) + r"\.model\.(\d+)\.weight$", k))
        }
    )
    n_conv = n_norm = 0
    for idx in idxs:
        w = _np(sd[f"{prefix}.model.{idx}.weight"])
        if w.ndim == 4:
            params[f"conv_{n_conv}"] = {"conv": _conv_entry(sd, f"{prefix}.model.{idx}")}
            n_conv += 1
        else:
            params[f"norm_{n_norm}"] = _norm_entry(sd, f"{prefix}.model.{idx}")
            if f"{prefix}.model.{idx}.running_mean" in sd:
                stats[f"norm_{n_norm}"] = _bn_stats_entry(sd, f"{prefix}.model.{idx}")
            n_norm += 1
    return params, stats


def unet_variables_from_torch(
    sd: Mapping[str, Any], *, n_feature_blocks: int, conditional: bool = False,
    last_norm: bool = False,
) -> Dict[str, Any]:
    """Map a reference MinimalUNet state_dict (src/models.py:212-237) to a
    Flax variables dict: {'params': ...} plus {'batch_stats': ...} when the
    checkpoint is a BatchNorm config (running_mean/var converted — NOT
    dropped)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    if conditional:
        params["embedding"] = {
            "class_embeddings": {
                "embedding": _np(sd["embedding.class_embeddings.weight"])
            }
        }

    def put_block(name, prefix):
        p, s = _ublock_params_from_torch(sd, prefix)
        params[name] = p
        if s:
            stats[name] = s

    for i in range(n_feature_blocks):
        put_block(f"feature_block_{i}", f"feature_blocks.{i}")
    put_block("bottleneck", "bottleneck")
    for j in range(n_feature_blocks):
        params[f"upsample_{j}"] = {
            "kernel": conv_transpose_kernel(sd[f"upsamples.{j}.weight"]),
            "bias": _np(sd[f"upsamples.{j}.bias"]),
        }
        put_block(f"output_block_{j}", f"output_blocks.{j}")
    params["last_emb_dense"] = _dense_entry(sd, "last_emb.1")
    params["output_conv"] = {"conv": _conv_entry(sd, "output_conv")}
    if last_norm and "last_normalizer.weight" in sd:
        params["last_normalizer"] = _norm_entry(sd, "last_normalizer")
        if "last_normalizer.running_mean" in sd:
            stats["last_normalizer"] = _bn_stats_entry(sd, "last_normalizer")
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def unet_params_from_torch(
    sd: Mapping[str, Any], *, n_feature_blocks: int, conditional: bool = False,
    last_norm: bool = False,
) -> Dict[str, Any]:
    """Params-only mapping; REFUSES BatchNorm checkpoints loudly (their
    running stats live outside 'params' — use unet_variables_from_torch)."""
    variables = unet_variables_from_torch(
        sd, n_feature_blocks=n_feature_blocks, conditional=conditional,
        last_norm=last_norm,
    )
    if "batch_stats" in variables:
        raise ValueError(
            "BatchNorm checkpoint: running_mean/var must not be dropped — "
            "use unet_variables_from_torch and apply the model with the "
            "full variables dict"
        )
    return variables["params"]


# ---------------------------------------------------------------------------
# Whole-pickle checkpoint ingestion (backbone_*.pt from src/utils/train.py:63)
# ---------------------------------------------------------------------------


class _StubModule:
    """Duck-typed stand-in for a pickled reference-defined nn.Module subclass.

    torch.nn.* classes unpickle as REAL torch modules (torch is importable);
    only the reference's own classes (src.models.*) become stubs — the tree
    is mixed, so use the module-level helpers below, which work on both
    (both store state in __dict__['_parameters'/'_buffers'/'_modules'])."""

    _stub_classname: str = "?"

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


def module_children(m) -> Dict[str, Any]:
    return dict(m.__dict__.get("_modules") or {})


def module_attr(m, name, default=None):
    return m.__dict__.get(name, default)


def module_child(m, name):
    return (m.__dict__.get("_modules") or {}).get(name)


def module_state_dict(m, prefix="") -> Dict[str, Any]:
    """Flat state_dict from a mixed stub/torch module tree."""
    out: Dict[str, Any] = {}
    for name, p in (m.__dict__.get("_parameters") or {}).items():
        if p is not None:
            out[prefix + name] = p
    for name, b in (m.__dict__.get("_buffers") or {}).items():
        if b is not None:
            out[prefix + name] = b
    for name, c in module_children(m).items():
        if c is not None:
            out.update(module_state_dict(c, prefix + name + "."))
    return out


def load_torch_pickle(path: str):
    """Unpickle a reference ``backbone_*.pt`` (or any torch.save'd module)
    without the reference package importable: every unknown class resolves to
    a `_StubModule`. Requires torch for tensor deserialization.

    Returns the stub object tree; use `.named_parameters_dict()` for a flat
    state_dict and `.attr(...)` for constructor metadata (emb_dim, mode, ...).
    """
    import torch

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            # exact 'torch' or 'torch.*' — a bare startswith('torch') would
            # also match torchvision/torch_geometric and bypass the stubs
            if module == "torch" or module.startswith("torch.") or module in (
                "collections",
                "builtins",
                "__builtin__",  # py2-style names in torch pickle streams
                "numpy",
                "numpy._core.multiarray",
                "numpy.core.multiarray",
            ):
                return super().find_class(module, name)
            cls = type(name, (_StubModule,), {"_stub_classname": f"{module}.{name}"})
            return cls

    with open(path, "rb") as f:
        return torch.load(f, map_location="cpu", pickle_module=_PickleShim(_Unpickler))


class _PickleShim:
    """Minimal pickle-module shim so torch.load uses our Unpickler."""

    __name__ = "pickle_stub_shim"  # torch.load introspects this

    def __init__(self, unpickler_cls):
        self.Unpickler = unpickler_cls
        self.load = lambda f, **kw: unpickler_cls(f, **kw).load()
        self.loads = lambda b, **kw: unpickler_cls(io.BytesIO(b), **kw).load()
        # torch.load introspects these:
        self.HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL
        self.UnpicklingError = pickle.UnpicklingError


def diffusion_model_from_torch_pickle(path: str, dtype=None, precision="highest"):
    """Reference ``backbone_*.pt`` (a whole pickled DDIM module,
    src/utils/train.py:63) -> (DiffusionModel, flax params).

    Reconstructs the architecture from the pickled module's attributes and
    maps its weights — no reference code is imported or executed.
    """
    from .models import DiffusionModel, MinimalResNet, MinimalUNet

    stub = load_torch_pickle(path)
    cls = getattr(stub, "_stub_classname", "")
    if cls.endswith("DDIM"):
        backbone = module_child(stub, "backbone")
        in_channels = module_attr(stub, "in_channels", 3)
        default_imsize = module_attr(stub, "default_imsize", 32)
    else:
        backbone = stub
        in_channels = module_attr(stub, "channels", 3)
        default_imsize = 32
    if backbone is None:
        raise ValueError(f"no backbone module found in {path}")

    bcls = getattr(backbone, "_stub_classname", "")
    sd = module_state_dict(backbone)
    conditional = bool(module_attr(backbone, "conditional", False))
    if bcls.endswith("MinimalResNet"):
        num_layers = int(module_attr(backbone, "num_layers", 6))
        normalization = module_attr(backbone, "normalization", None)
        add_one = len(module_children(module_child(backbone, "embs"))) > num_layers
        kernel_size = int(sd["up_projection.weight"].shape[-1])
        lastksize = int(
            (sd.get("down_projection.weight") if normalization is None else sd["down_projection.1.weight"]).shape[-1]
        )
        emb_dim = int(module_attr(backbone, "emb_dim", sd["up_projection.weight"].shape[0]))
        num_classes = module_attr(backbone, "num_classes")
        net = MinimalResNet(
            channels=in_channels, emb_dim=emb_dim,
            mode=module_attr(backbone, "mode", "circular"),
            normalization=normalization, conditional=conditional,
            num_classes=num_classes, kernel_size=kernel_size,
            num_layers=num_layers, lastksize=lastksize, add_one=add_one,
            dtype=dtype, precision=precision,
        )
        params = resnet_params_from_torch(
            sd, num_layers=num_layers, normalization=normalization,
            add_one=add_one, conditional=conditional,
        )
    elif bcls.endswith("MinimalUNet"):
        fsizes = tuple(
            int(f) for f in module_attr(backbone, "fsizes", (32, 64, 128, 256))
        )
        # UBlock normalization isn't stored as an attr on MinimalUNet; detect
        # from the presence of 1-D weights inside feature block Sequentials,
        # and BatchNorm specifically by its running_mean buffers (:308-309).
        has_norm = any(
            re.match(r"feature_blocks\.\d+\.model\.\d+\.weight$", k)
            and _np(v).ndim == 1
            for k, v in sd.items()
        )
        has_bn = any(k.endswith(".running_mean") for k in sd)
        normalization = ("BatchNorm" if has_bn else "GroupNorm") if has_norm else None
        last_norm = bool(module_attr(backbone, "last_norm", False)) and (
            "last_normalizer.weight" in sd
        )
        num_classes = (
            int(_np(sd["embedding.class_embeddings.weight"]).shape[0])
            if conditional
            else None
        )
        # MinimalUNet does not store `mode`; read the padding_mode baked into
        # its first conv (src/models.py:305).
        mode = "circular"
        fb = module_child(backbone, "feature_blocks")
        if fb is not None:
            first = module_child(fb, "0")
            if first is not None:
                conv0 = module_child(module_child(first, "model"), "0")
                mode = module_attr(conv0, "padding_mode", "circular")
        net = MinimalUNet(
            channels=in_channels, fsizes=fsizes, mode=mode,
            conditional=conditional,
            num_classes=num_classes,
            emb_dim=int(module_attr(backbone, "emb_dim", 256)),
            normalization=normalization, last_norm=last_norm,
            kernel_size=int(module_attr(backbone, "kernel_size", 3)),
            lastksize=int(module_attr(backbone, "lastksize", 1)),
            dtype=dtype, precision=precision,
        )
        variables = unet_variables_from_torch(
            sd, n_feature_blocks=len(fsizes) - 1, conditional=conditional,
            last_norm=last_norm,
        )
        # BatchNorm checkpoints carry their running stats as a full variables
        # dict (DiffusionModel.apply accepts either form)
        params = variables if "batch_stats" in variables else variables["params"]
    else:
        raise ValueError(f"unsupported backbone class {bcls!r} in {path}")

    from .schedules import cosine_noise_schedule

    model = DiffusionModel(
        net,
        noise_schedule=cosine_noise_schedule,
        in_channels=in_channels,
        default_imsize=int(default_imsize),
    )
    return model, params


def load_scales(path: str):
    """Load a reference ``scales_*.pt`` file -> list[int].

    These are torch.save'd plain Python lists of per-timestep kernel sizes
    (verified in BASELINE.md; consumed at src/utils/idealscore.py:95).
    """
    import torch

    scales = torch.load(path, map_location="cpu", weights_only=False)
    out = []
    for s in scales:
        if hasattr(s, "item"):
            s = s.item()
        out.append(int(s))
    return out


# ---------------------------------------------------------------------------
# Inverse export: Flax params -> torch state_dict (.pt)
# ---------------------------------------------------------------------------
# Lets reference users round-trip: models trained here load back into the
# reference's torch modules via `backbone.load_state_dict(torch.load(path))`.
# (A whole-pickle DDIM export is impossible by design — that would require
# instantiating the reference's classes, i.e. importing its code.)


def _t_conv(kernel) -> np.ndarray:
    """flax [kh, kw, I, O] -> torch Conv2d [O, I, kh, kw]."""
    return np.asarray(kernel).transpose(3, 2, 0, 1)


def _t_dense(kernel) -> np.ndarray:
    """flax [I, O] -> torch Linear [O, I]."""
    return np.asarray(kernel).transpose(1, 0)


def _t_conv_transpose(kernel) -> np.ndarray:
    """flax transpose_kernel=True [kh, kw, O, I] -> torch [I, O, kh, kw]."""
    return np.asarray(kernel).transpose(3, 2, 0, 1)


def _put_conv(sd, prefix, entry):
    sd[prefix + ".weight"] = _t_conv(entry["conv"]["kernel"])
    if "bias" in entry["conv"]:
        sd[prefix + ".bias"] = np.asarray(entry["conv"]["bias"])


def _put_dense(sd, prefix, entry):
    sd[prefix + ".weight"] = _t_dense(entry["kernel"])
    if "bias" in entry:
        sd[prefix + ".bias"] = np.asarray(entry["bias"])


def _put_norm(sd, prefix, entry, stats=None):
    sd[prefix + ".weight"] = np.asarray(entry["scale"])
    sd[prefix + ".bias"] = np.asarray(entry["bias"])
    if stats is not None:  # BatchNorm running statistics
        sd[prefix + ".running_mean"] = np.asarray(stats["mean"])
        sd[prefix + ".running_var"] = np.asarray(stats["var"])
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def resnet_state_dict_from_params(
    params: Mapping[str, Any], *, num_layers: int,
    normalization: Optional[str] = None, add_one: bool = True,
    conditional: bool = False,
) -> Dict[str, np.ndarray]:
    """Inverse of resnet_params_from_torch (reference layout
    src/models.py:139-157)."""
    sd: Dict[str, np.ndarray] = {}
    if conditional:
        sd["embedding.class_embeddings.weight"] = np.asarray(
            params["embedding"]["class_embeddings"]["embedding"]
        )
    _put_conv(sd, "up_projection", params["up_projection"])
    n_embs = num_layers + (1 if add_one else 0)
    for i in range(n_embs):
        _put_dense(sd, f"embs.{i}.0", params[f"emb_{i}"]["dense"])
        _put_norm(sd, f"embs.{i}.1", params[f"emb_{i}"]["norm"])
    for i in range(num_layers):
        _put_conv(sd, f"convs.{i}.0", params[f"conv_{i}"])
        if normalization is not None:
            _put_norm(sd, f"convs.{i}.1", params[f"conv_norm_{i}"])
    if normalization is None:
        _put_conv(sd, "down_projection", params["down_projection"])
    else:
        _put_norm(sd, "down_projection.0", params["down_norm"])
        _put_conv(sd, "down_projection.1", params["down_projection"])
    return sd


def _ublock_state_dict(sd, prefix, block, stats, *, normalization, depth=2):
    """Inverse of _ublock_params_from_torch: the torch UBlock Sequential is
    [Conv, (Norm), ReLU] x depth (src/models.py:298-312)."""
    _put_dense(sd, f"{prefix}.emb.1", block["emb_dense"])
    stride = 3 if normalization is not None else 2
    for i in range(depth):
        _put_conv(sd, f"{prefix}.model.{i * stride}", block[f"conv_{i}"])
        if normalization is not None:
            _put_norm(
                sd, f"{prefix}.model.{i * stride + 1}", block[f"norm_{i}"],
                stats.get(f"norm_{i}") if stats else None,
            )


def unet_state_dict_from_params(
    variables: Mapping[str, Any], *, n_feature_blocks: int,
    normalization: Optional[str] = None, conditional: bool = False,
    last_norm: bool = False, depth: int = 2,
) -> Dict[str, np.ndarray]:
    """Inverse of unet_variables_from_torch (reference layout
    src/models.py:212-237). `variables` may be a bare params tree or a
    {'params', 'batch_stats'} dict (BatchNorm running stats export too)."""
    if "params" in variables:
        params = variables["params"]
        bstats = variables.get("batch_stats", {})
    else:
        params, bstats = variables, {}
    sd: Dict[str, np.ndarray] = {}
    if conditional:
        sd["embedding.class_embeddings.weight"] = np.asarray(
            params["embedding"]["class_embeddings"]["embedding"]
        )
    for i in range(n_feature_blocks):
        _ublock_state_dict(
            sd, f"feature_blocks.{i}", params[f"feature_block_{i}"],
            bstats.get(f"feature_block_{i}"), normalization=normalization,
            depth=depth,
        )
    _ublock_state_dict(
        sd, "bottleneck", params["bottleneck"], bstats.get("bottleneck"),
        normalization=normalization, depth=depth,
    )
    for j in range(n_feature_blocks):
        up = params[f"upsample_{j}"]
        sd[f"upsamples.{j}.weight"] = _t_conv_transpose(up["kernel"])
        sd[f"upsamples.{j}.bias"] = np.asarray(up["bias"])
        _ublock_state_dict(
            sd, f"output_blocks.{j}", params[f"output_block_{j}"],
            bstats.get(f"output_block_{j}"), normalization=normalization,
            depth=depth,
        )
    _put_dense(sd, "last_emb.1", params["last_emb_dense"])
    _put_conv(sd, "output_conv", params["output_conv"])
    if last_norm and "last_normalizer" in params:
        _put_norm(
            sd, "last_normalizer", params["last_normalizer"],
            bstats.get("last_normalizer"),
        )
    return sd


def save_torch_state_dict(sd: Mapping[str, np.ndarray], path: str) -> None:
    """torch.save a numpy state_dict as tensors (loadable by the reference
    via `module.load_state_dict(torch.load(path))`)."""
    import torch

    torch.save(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()},
        path,
    )
