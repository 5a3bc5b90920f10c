"""Shared CLI helpers: backbone construction from flags, checkpoint-name
conventions, model loading from either Orbax dirs or reference .pt pickles."""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np


def build_backbone_from_flags(metadata, *, resnet: bool, mode: str, mult: int,
                              layers: int, conditional: bool, nonorm: bool,
                              precision="highest"):
    """The reference training_script construction logic
    (scripts/training_script.py:65-84): ResNet emb_dim=128*mult lastksize=3;
    UNet fsizes=[mult*32*2^i for i in range(layers)] lastksize=3."""
    from ..models import MinimalResNet, MinimalUNet

    normal = None if nonorm else "GroupNorm"
    if resnet:
        return MinimalResNet(
            channels=metadata["num_channels"],
            emb_dim=128 * mult,
            mode=mode,
            conditional=conditional,
            num_classes=metadata["num_classes"],
            kernel_size=3,
            num_layers=layers,
            normalization=normal,
            lastksize=3,
            precision=precision,
        )
    return MinimalUNet(
        channels=metadata["num_channels"],
        fsizes=tuple(mult * 32 * (2**i) for i in range(layers)),
        mode=mode,
        conditional=conditional,
        num_classes=metadata["num_classes"],
        normalization=normal,
        lastksize=3,
        precision=precision,
    )


def checkpoint_name_from_flags(metadata, args, subset_flag: bool) -> str:
    """The reference's auto-generated checkpoint filename
    (scripts/training_script.py:46-61)."""
    fname = "MinimalResNet_" if args.resnet else "MinimalUNet_"
    fname += (
        metadata["name"]
        + f"_{args.mode}_lr_{args.lr}_batchsize_{args.batchsize}_wd_{args.wd}"
    )
    if subset_flag:
        fname += f"_maxsamps_{args.maxsamps}"
    if args.conditional:
        fname += "_conditional"
    if args.nonorm:
        fname += "_nonorm"
    if args.mult != 1:
        fname += f"_mult_{args.mult}"
    return fname


def load_model(path: str):
    """Load a trained DiffusionModel + params from either a reference .pt
    whole pickle or one of this framework's Orbax checkpoint dirs (which
    store the architecture config in meta)."""
    from .. import convert
    from ..models import DiffusionModel, MinimalResNet, MinimalUNet
    from ..schedules import cosine_noise_schedule

    if path.endswith(".pt"):
        return convert.diffusion_model_from_torch_pickle(path)

    from ..utils.checkpoint import restore_checkpoint

    blob = restore_checkpoint(path)
    meta = blob.get("meta", {})
    cfg = meta.get("model_config")
    if cfg is None:
        raise ValueError(
            f"{path} has no model_config metadata; re-save with cli.train or "
            "pass a reference .pt file"
        )
    if isinstance(cfg, str):
        cfg = json.loads(cfg)
    kind = cfg.pop("kind")
    in_channels = cfg.pop("in_channels")
    imsize = cfg.pop("default_imsize")
    if kind == "MinimalResNet":
        net = MinimalResNet(**cfg)
    else:
        if cfg.get("fsizes"):
            cfg["fsizes"] = tuple(cfg["fsizes"])
        net = MinimalUNet(**cfg)
    model = DiffusionModel(
        net, noise_schedule=cosine_noise_schedule, in_channels=in_channels,
        default_imsize=imsize,
    )
    return model, blob["state"]["params"]


def model_config_meta(backbone, in_channels: int, imsize: int) -> str:
    """Serialize architecture config into checkpoint metadata (JSON)."""
    from ..models import MinimalResNet

    if isinstance(backbone, MinimalResNet):
        cfg = dict(
            kind="MinimalResNet",
            channels=backbone.channels,
            emb_dim=backbone.emb_dim,
            mode=backbone.mode,
            normalization=backbone.normalization,
            conditional=backbone.conditional,
            num_classes=backbone.num_classes,
            kernel_size=backbone.kernel_size,
            num_layers=backbone.num_layers,
            lastksize=backbone.lastksize,
            add_one=backbone.add_one,
        )
    else:
        cfg = dict(
            kind="MinimalUNet",
            channels=backbone.channels,
            fsizes=list(backbone.fsizes) if backbone.fsizes else None,
            mode=backbone.mode,
            conditional=backbone.conditional,
            num_classes=backbone.num_classes,
            emb_dim=backbone.emb_dim,
            normalization=backbone.normalization,
            last_norm=backbone.last_norm,
            kernel_size=backbone.kernel_size,
            lastksize=backbone.lastksize,
        )
    cfg["in_channels"] = in_channels
    cfg["default_imsize"] = imsize
    return json.dumps(cfg)


def build_score_module(kind: str, dataset_tuple, *, batch_size: int,
                       image_size: int, channels: int, schedule,
                       max_samples: Optional[int] = None, kernel_size: int = 3,
                       precision: str = "highest", shuffle: bool = False,
                       bank_ledger=None, target_block: int | None = None,
                       mesh=None):
    """Score-module factory matching els_script.py:69-96 / calibration
    :91-117 (LS and IS get batch_size=len(dataset) there). `shuffle` reaches
    only the ELS module, exactly like the reference els_script (its --shuffle
    is passed solely to LocalEquivScoreModule, els_script.py:75; LS always
    shuffles internally, bbELS/IS default off).

    mesh: a jax.sharding.Mesh with a 'data' axis shards the training set
    over its devices (every kind; partial softmax states merge over ICI —
    parallel.sharded_score)."""
    from ..scores import (
        IdealScoreModule,
        LocalEquivBordersScoreModule,
        LocalEquivScoreModule,
        LocalScoreModule,
    )

    if mesh is not None:
        from ..parallel.sharded_score import (
            ShardedIdealScoreModule,
            ShardedLocalEquivBordersScoreModule,
            ShardedLocalEquivScoreModule,
            ShardedLocalScoreModule,
        )

        classes = {
            "ELS": ShardedLocalEquivScoreModule,
            "bbELS": ShardedLocalEquivBordersScoreModule,
            "LS": ShardedLocalScoreModule,
            "IS": ShardedIdealScoreModule,
        }
        mkw = {"mesh": mesh}
    else:
        classes = {
            "ELS": LocalEquivScoreModule,
            "bbELS": LocalEquivBordersScoreModule,
            "LS": LocalScoreModule,
            "IS": IdealScoreModule,
        }
        mkw = {}

    n = len(dataset_tuple[0])
    blk = {} if target_block is None else {"target_block": target_block}
    if kind == "ELS":
        return classes["ELS"](
            dataset_tuple, kernel_size=kernel_size, batch_size=batch_size,
            image_size=image_size, channels=channels, schedule=schedule,
            max_samples=max_samples, precision=precision, shuffle=shuffle,
            bank_ledger=bank_ledger, **blk, **mkw,
        )
    if kind == "bbELS":
        return classes["bbELS"](
            dataset_tuple, kernel_size=kernel_size, batch_size=batch_size,
            image_size=image_size, channels=channels, schedule=schedule,
            max_samples=max_samples, precision=precision,
            bank_ledger=bank_ledger, **blk, **mkw,
        )
    # the reference els_script passes max_samples ONLY to ELS/bbELS
    # (els_script.py:69-96); LS/IS run batch_size=len(dataset), and a
    # max_samples below n would FILTER-exclude that single batch entirely
    # (all-zero weights -> NaN scores)
    if kind == "LS":
        return classes["LS"](
            dataset_tuple, kernel_size=kernel_size, batch_size=n,
            image_size=image_size, schedule=schedule,
            precision=precision, **mkw,
        )
    if kind == "IS":
        return classes["IS"](
            dataset_tuple, batch_size=n, image_size=image_size,
            schedule=schedule, precision=precision, **mkw,
        )
    raise ValueError(f"Unknown scoremoduletype: {kind}")


def export_torch_state_dict(params, backbone_is_resnet: bool, *,
                            layers: int, nonorm: bool, conditional: bool,
                            path: str, log=print):
    """Export trained params as a reference-loadable torch state_dict
    (shared by the 32x32 and 64x64 train CLIs)."""
    from .. import convert

    normal = None if nonorm else "GroupNorm"
    p = params["params"] if isinstance(params, dict) and "params" in params else params
    if backbone_is_resnet:
        sd = convert.resnet_state_dict_from_params(
            p, num_layers=layers, normalization=normal,
            conditional=conditional,
        )
    else:
        sd = convert.unet_state_dict_from_params(
            params, n_feature_blocks=layers - 1,
            normalization=normal, conditional=conditional,
        )
    convert.save_torch_state_dict(sd, path)
    log(f"exported torch state_dict to {path}")
