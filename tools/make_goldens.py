"""Generate golden parity fixtures by RUNNING the torch reference
(/root/reference, read-only) on tiny deterministic inputs.

Outputs .npz files under tests/goldens/ containing reference state_dicts,
inputs, and outputs. The test suite converts the state_dicts with
`convolutional_diffusion_tpu.convert` and checks our NHWC/Flax forward passes
and samplers against the recorded torch outputs.

Run once on a machine with torch (CPU is fine):
    python tools/make_goldens.py
"""

import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")
REFERENCE = "/root/reference"


def stub_torchvision():
    """The reference imports torchvision but its score/model code never calls
    it; this environment has no torchvision, so install empty stubs."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    for sub in ("transforms", "datasets", "models"):
        m = types.ModuleType(f"torchvision.{sub}")
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m
    sys.modules["torchvision"] = tv


def sd_to_numpy(sd, prefix=""):
    return {prefix + k: v.detach().cpu().numpy() for k, v in sd.items()}


def save(name, **arrays):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({len(arrays)} arrays)")


def main():
    stub_torchvision()
    sys.path.insert(0, REFERENCE)
    from src.models import DDIM, MinimalResNet, MinimalUNet
    from src.utils import idealscore
    from src.utils.noise_schedules import cosine_noise_schedule, exponential_schedule

    torch.manual_seed(42)
    dev = torch.device("cpu")

    b, c, h = 2, 3, 16
    x = torch.randn(b, c, h, h)
    t = torch.tensor([0.3, 0.8])
    label = torch.tensor([1, 3])

    # ---------------- ResNet forwards ----------------
    resnet_cfgs = {
        "zeros_plain": dict(mode="zeros", normalization=None, conditional=False),
        "circular_plain": dict(mode="circular", normalization=None, conditional=False),
        "zeros_norm_cond": dict(
            mode="zeros", normalization="GroupNorm", conditional=True, num_classes=10
        ),
        "zeros_noaddone": dict(
            mode="zeros", normalization=None, conditional=False, add_one=False
        ),
    }
    arrays = {"x": x.numpy(), "t": t.numpy(), "label": label.numpy()}
    for name, cfg in resnet_cfgs.items():
        torch.manual_seed(7)
        net = MinimalResNet(
            channels=c, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3, **cfg
        ).eval()
        with torch.no_grad():
            out = net(t, x, label=label if cfg.get("conditional") else None)
        arrays.update(sd_to_numpy(net.state_dict(), f"{name}/sd/"))
        arrays[f"{name}/out"] = out.numpy()
    save("resnet_forward", **arrays)

    # ---------------- UNet forwards ----------------
    unet_cfgs = {
        "zeros_plain": dict(mode="zeros", normalization=None, conditional=False),
        "circular_plain": dict(mode="circular", normalization=None, conditional=False),
        "zeros_norm_cond": dict(
            mode="zeros",
            normalization="GroupNorm",
            conditional=True,
            num_classes=10,
            last_norm=True,
        ),
    }
    arrays = {"x": x.numpy(), "t": t.numpy(), "label": label.numpy()}
    for name, cfg in unet_cfgs.items():
        torch.manual_seed(7)
        net = MinimalUNet(
            channels=c, fsizes=[8, 16, 32], emb_dim=16, kernel_size=3, lastksize=1, **cfg
        ).eval()
        with torch.no_grad():
            out = net(t, x, label=label if cfg.get("conditional") else None)
        arrays.update(sd_to_numpy(net.state_dict(), f"{name}/sd/"))
        arrays[f"{name}/out"] = out.numpy()
    save("unet_forward", **arrays)

    # ---------------- DDIM / DDPM sampling ----------------
    torch.manual_seed(7)
    net = MinimalResNet(
        channels=c, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3, mode="zeros"
    ).eval()
    model = DDIM(pretrained_backbone=net, in_channels=c, default_imsize=h)
    torch.manual_seed(11)
    x0 = torch.randn(b, c, h, h)
    with torch.no_grad():
        out_ddim = model.sample(batch_size=b, x=x0.clone(), nsteps=5, device=dev)
        out_break = model.sample(
            batch_size=b, x=x0.clone(), nsteps=5, breakstep=3, device=dev
        )
        # DDPM with the stochastic part zeroed (we cannot match torch RNG):
        orig = torch.randn_like
        torch.randn_like = lambda v: torch.zeros_like(v)
        try:
            out_ddpm0 = model.sample(
                batch_size=b, x=x0.clone(), nsteps=5, ddpm=True, device=dev
            )
        finally:
            torch.randn_like = orig
    save(
        "sample",
        **sd_to_numpy(net.state_dict(), "sd/"),
        x0=x0.numpy(),
        out_ddim=out_ddim.numpy(),
        out_break=out_break.numpy(),
        out_ddpm0=out_ddpm0.numpy(),
    )

    # ---------------- Whole-pickle checkpoints (backbone_*.pt format) ------
    pickle_dir = os.path.join(GOLDEN_DIR, "pickles")
    os.makedirs(pickle_dir, exist_ok=True)
    torch.manual_seed(7)
    rn = MinimalResNet(
        channels=c, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3,
        mode="zeros", normalization=None, conditional=True, num_classes=10,
    ).eval()
    ddim_rn = DDIM(pretrained_backbone=rn, in_channels=c, default_imsize=h)
    with torch.no_grad():
        out_rn = ddim_rn(t, x, label=label)
    torch.save(ddim_rn, os.path.join(pickle_dir, "backbone_resnet_cond.pt"))
    torch.manual_seed(9)
    un = MinimalUNet(
        channels=c, fsizes=[8, 16], emb_dim=16, kernel_size=3, lastksize=1,
        mode="zeros", normalization="GroupNorm", last_norm=True,
    ).eval()
    ddim_un = DDIM(pretrained_backbone=un, in_channels=c, default_imsize=h)
    with torch.no_grad():
        out_un = ddim_un(t, x)
    torch.save(ddim_un, os.path.join(pickle_dir, "backbone_unet.pt"))
    save(
        "pickle_forward",
        x=x.numpy(), t=t.numpy(), label=label.numpy(),
        resnet_out=out_rn.numpy(), unet_out=out_un.numpy(),
    )

    # ---------------- Analytic score machines ----------------
    from torch.utils.data import TensorDataset

    rs = np.random.RandomState(3)
    N, cc, hh = 12, 3, 8
    imgs = torch.tensor(rs.uniform(-1, 1, size=(N, cc, hh, hh)).astype(np.float32))
    labs = torch.tensor(rs.randint(0, 3, size=(N,)).astype(np.int64))
    ds = TensorDataset(imgs, labs)
    torch.manual_seed(5)
    xs = torch.randn(1, cc, hh, hh)  # b=1 contract (see SURVEY §2 bbELS note)
    ts = torch.tensor([0.45])

    arrays = {
        "imgs": imgs.numpy(),
        "labs": labs.numpy().astype(np.int64),
        "x": xs.numpy(),
        "t": ts.numpy(),
    }

    # IdealScore: full-image posterior, cosine schedule
    for bs, tag in [(5, "b5"), (12, "b12")]:
        mod = idealscore.IdealScoreModule(
            ds, batch_size=bs, schedule=cosine_noise_schedule, image_size=hh
        )
        with torch.no_grad():
            arrays[f"is/{tag}/out"] = mod(ts, xs.clone(), device=dev).numpy()
    mod = idealscore.IdealScoreModule(
        ds, batch_size=5, schedule=cosine_noise_schedule, image_size=hh
    )
    with torch.no_grad():
        arrays["is/label1/out"] = mod(ts, xs.clone(), label=1, device=dev).numpy()
        # max_samples semantics: break once i(+=bsize) exceeds value
        mod2 = idealscore.IdealScoreModule(
            ds, batch_size=5, schedule=cosine_noise_schedule, max_samples=8
        )
        arrays["is/max8/out"] = mod2(ts, xs.clone(), device=dev).numpy()

    # LocalScore (note: DataLoader(shuffle=True) in reference; with
    # batch_size >= N a single full batch makes ordering irrelevant)
    for k in (3, 5):
        mod = idealscore.LocalScoreModule(
            ds, kernel_size=k, batch_size=N, schedule=cosine_noise_schedule
        )
        with torch.no_grad():
            arrays[f"ls/k{k}/out"] = mod(ts, xs.clone(), device=dev).numpy()
    mod = idealscore.LocalScoreModule(
        ds, kernel_size=3, batch_size=N, schedule=exponential_schedule
    )
    with torch.no_grad():
        arrays["ls/k3exp/out"] = mod(ts, xs.clone(), device=dev).numpy()

    # ELS (circular, translation-equivariant)
    for k in (3, 5):
        for bs, tag in [(5, "b5"), (12, "b12")]:
            mod = idealscore.LocalEquivScoreModule(
                ds, kernel_size=k, batch_size=bs, schedule=cosine_noise_schedule
            )
            with torch.no_grad():
                arrays[f"els/k{k}{tag}/out"] = mod(ts, xs.clone(), device=dev).numpy()
    mod = idealscore.LocalEquivScoreModule(
        ds, kernel_size=3, batch_size=5, schedule=cosine_noise_schedule
    )
    with torch.no_grad():
        arrays["els/k3label2/out"] = mod(ts, xs.clone(), label=2, device=dev).numpy()

    # bbELS (zeros boundary, border-broken)
    for k in (3, 5):
        for bs, tag in [(5, "b5"), (12, "b12")]:
            mod = idealscore.LocalEquivBordersScoreModule(
                ds,
                kernel_size=k,
                batch_size=bs,
                image_size=hh,
                schedule=cosine_noise_schedule,
            )
            with torch.no_grad():
                arrays[f"bbels/k{k}{tag}/out"] = mod(
                    ts, xs.clone(), device=dev
                ).numpy()

    # larger-border bbELS: k=7 on 12x12 (3-pixel border bands) stresses the
    # region decomposition beyond the k=3/5-on-8x8 cases
    rs2 = np.random.RandomState(9)
    imgs12 = torch.tensor(rs2.uniform(-1, 1, size=(10, 2, 12, 12)).astype(np.float32))
    labs12 = torch.tensor(rs2.randint(0, 2, size=(10,)).astype(np.int64))
    ds12 = TensorDataset(imgs12, labs12)
    x12 = torch.randn(1, 2, 12, 12, generator=torch.Generator().manual_seed(2))
    arrays["big/imgs"] = imgs12.numpy()
    arrays["big/labs"] = labs12.numpy()
    arrays["big/x"] = x12.numpy()
    mod = idealscore.LocalEquivBordersScoreModule(
        ds12, kernel_size=7, batch_size=4, image_size=12,
        schedule=cosine_noise_schedule,
    )
    with torch.no_grad():
        arrays["big/bbels_k7/out"] = mod(ts, x12.clone(), device=dev).numpy()

    # batched (b=2) ELS / IS parity (the reference supports b>1 for these)
    xs2 = torch.cat([xs, 0.5 * torch.flip(xs, dims=[-1])], dim=0)
    arrays["x2"] = xs2.numpy()
    mod = idealscore.LocalEquivScoreModule(
        ds, kernel_size=3, batch_size=5, schedule=cosine_noise_schedule
    )
    with torch.no_grad():
        arrays["els/k3b5x2/out"] = mod(ts, xs2.clone(), device=dev).numpy()
    # NOTE: IdealScoreModule crashes for b>1 in the reference (its [b]
    # denominator cannot broadcast against [b,c,h,w] unless b==w or b==1,
    # idealscore.py:636) — verified here; our IS module lifts that.

    # ScheduledScoreMachine end-to-end (ELS backbone, 5 scales)
    scales = [3, 3, 5, 5, 3]
    mod = idealscore.LocalEquivScoreModule(
        ds, kernel_size=3, batch_size=6, schedule=cosine_noise_schedule
    )
    machine = idealscore.ScheduledScoreMachine(
        mod, in_channels=cc, imsize=hh, scales=scales, score_backbone=True
    )
    with torch.no_grad():
        arrays["machine/els/out"] = machine(xs.clone(), device=dev).numpy()
    modbb = idealscore.LocalEquivBordersScoreModule(
        ds, kernel_size=3, batch_size=6, image_size=hh, schedule=cosine_noise_schedule
    )
    machinebb = idealscore.ScheduledScoreMachine(
        modbb, in_channels=cc, imsize=hh, scales=scales, score_backbone=True
    )
    with torch.no_grad():
        arrays["machine/bbels/out"] = machinebb(xs.clone(), device=dev).numpy()
    arrays["machine/scales"] = np.array(scales)

    # Large-d regime: k=13/19 on 24x24 (dp 512 / 1152) and k=27 on 28x28
    # (dp 2304) — the padded-d bands the TPU kernel's block policy, chunked
    # path and dispatch segmentation treat separately (ops/flash_score.py).
    # The small-k goldens never leave dp<=256; these pin the large-k MATH
    # against the reference so the hardware bands have reference-recorded
    # numbers too (tools/parity_tpu.py runs them on the real chip).
    # Fresh explicit RNGs only — appending here must not perturb the draws
    # of any existing golden above.
    rs3 = np.random.RandomState(17)
    imgs24 = torch.tensor(
        rs3.uniform(-1, 1, size=(8, 3, 24, 24)).astype(np.float32)
    )
    labs24 = torch.tensor(rs3.randint(0, 2, size=(8,)).astype(np.int64))
    ds24 = TensorDataset(imgs24, labs24)
    x24 = torch.randn(2, 3, 24, 24, generator=torch.Generator().manual_seed(4))
    arrays["bigk/imgs24"] = imgs24.numpy()
    arrays["bigk/labs24"] = labs24.numpy()
    arrays["bigk/x24"] = x24.numpy()
    # b=1: at b>1 the reference's max-subtraction is SHARED across the
    # batch per pixel (idealscore.py:458-465 reduces over dims (0,1)), so
    # the weaker seed's denominators go subnormal at large d and ~1% of its
    # outputs are NaN/garbage. At b=1 the subtraction is genuinely
    # per-query and the reference is healthy — record that.
    for k in (13, 19):
        mod = idealscore.LocalEquivScoreModule(
            ds24, kernel_size=k, batch_size=5, schedule=cosine_noise_schedule
        )
        with torch.no_grad():
            arrays[f"bigk/els_k{k}/out"] = mod(
                ts, x24[:1].clone(), device=dev
            ).numpy()
    mod = idealscore.LocalEquivBordersScoreModule(
        ds24, kernel_size=13, batch_size=5, image_size=24,
        schedule=cosine_noise_schedule,
    )
    with torch.no_grad():  # b=1: the reference bbELS contract
        arrays["bigk/bbels_k13/out"] = mod(
            ts, x24[:1].clone(), device=dev
        ).numpy()
    # machine with a large-k schedule: groups steps by k across the
    # dp<=512 / dp=1152 bands (i runs nsteps-1..1 -> k = 3,13,19,13)
    scales24 = [3, 13, 19, 13, 3]
    mod = idealscore.LocalEquivScoreModule(
        ds24, kernel_size=3, batch_size=5, schedule=cosine_noise_schedule
    )
    machine24 = idealscore.ScheduledScoreMachine(
        mod, in_channels=3, imsize=24, scales=scales24, score_backbone=True
    )
    with torch.no_grad():
        arrays["bigk/machine/out"] = machine24(
            x24[:1].clone(), device=dev
        ).numpy()
    arrays["bigk/machine/scales"] = np.array(scales24)

    rs4 = np.random.RandomState(23)
    imgs28 = torch.tensor(
        rs4.uniform(-1, 1, size=(6, 3, 28, 28)).astype(np.float32)
    )
    labs28 = torch.tensor(rs4.randint(0, 2, size=(6,)).astype(np.int64))
    ds28 = TensorDataset(imgs28, labs28)
    x28 = torch.randn(2, 3, 28, 28, generator=torch.Generator().manual_seed(6))
    arrays["bigk/imgs28"] = imgs28.numpy()
    arrays["bigk/labs28"] = labs28.numpy()
    arrays["bigk/x28"] = x28.numpy()
    mod = idealscore.LocalEquivScoreModule(
        ds28, kernel_size=27, batch_size=6, schedule=cosine_noise_schedule
    )
    with torch.no_grad():  # b=1: see the subtraction note above
        arrays["bigk/els_k27/out"] = mod(
            ts, x28[:1].clone(), device=dev
        ).numpy()

    # Grayscale (c=1) regime: the MNIST/FashionMNIST workloads — 4 of the
    # reference's 10 stored scales files are single-channel
    # (checkpoints/scales_MNIST_*/FashionMNIST_*, BASELINE.md) — and d = k^2
    # hits different lane-padding bands than k^2*3 (e.g. k=7 -> d=49, dp=128).
    # All four modules + a machine, reference `channels=1` ctor arg
    # (idealscore.py:133,381). Fresh explicit RNGs only (see note above).
    rs5 = np.random.RandomState(29)
    imgs16 = torch.tensor(
        rs5.uniform(-1, 1, size=(10, 1, 16, 16)).astype(np.float32)
    )
    labs16 = torch.tensor(rs5.randint(0, 3, size=(10,)).astype(np.int64))
    ds16 = TensorDataset(imgs16, labs16)
    x16 = torch.randn(1, 1, 16, 16, generator=torch.Generator().manual_seed(8))
    arrays["gray/imgs16"] = imgs16.numpy()
    arrays["gray/labs16"] = labs16.numpy()
    arrays["gray/x16"] = x16.numpy()
    for k in (3, 7):
        mod = idealscore.LocalEquivScoreModule(
            ds16, kernel_size=k, batch_size=4, channels=1,
            schedule=cosine_noise_schedule,
        )
        with torch.no_grad():
            arrays[f"gray/els_k{k}/out"] = mod(ts, x16.clone(), device=dev).numpy()
    mod = idealscore.LocalEquivBordersScoreModule(
        ds16, kernel_size=5, batch_size=4, image_size=16, channels=1,
        schedule=cosine_noise_schedule,
    )
    with torch.no_grad():
        arrays["gray/bbels_k5/out"] = mod(ts, x16.clone(), device=dev).numpy()
    mod = idealscore.LocalScoreModule(
        ds16, kernel_size=3, batch_size=10, schedule=cosine_noise_schedule
    )
    with torch.no_grad():
        arrays["gray/ls_k3/out"] = mod(ts, x16.clone(), device=dev).numpy()
    mod = idealscore.IdealScoreModule(
        ds16, batch_size=4, schedule=cosine_noise_schedule, image_size=16
    )
    with torch.no_grad():
        arrays["gray/is/out"] = mod(ts, x16.clone(), device=dev).numpy()
    scales16 = [3, 5, 7, 5, 3]  # MNIST-style ramp (scales_MNIST_* shape)
    mod = idealscore.LocalEquivScoreModule(
        ds16, kernel_size=3, batch_size=4, channels=1,
        schedule=cosine_noise_schedule,
    )
    machine16 = idealscore.ScheduledScoreMachine(
        mod, in_channels=1, imsize=16, scales=scales16, score_backbone=True
    )
    with torch.no_grad():
        arrays["gray/machine/out"] = machine16(x16.clone(), device=dev).numpy()
    arrays["gray/machine/scales"] = np.array(scales16)

    save("scores", **arrays)


def dataloader_perm(seed: int, n: int, batch_size: int):
    """The permutation a shuffle=True DataLoader yields under torch global
    seed `seed` — replicated by iterating an index-valued DataLoader with the
    identical RNG-consumption sequence (verified: order is content-independent
    for equal N)."""
    from torch.utils.data import DataLoader, TensorDataset

    torch.manual_seed(seed)
    dl = DataLoader(TensorDataset(torch.arange(n)), batch_size=batch_size, shuffle=True)
    return [int(i) for (b,) in dl for i in b]


def make_cutoff_goldens():
    """max_samples / label / shuffle semantics per module (VERDICT round 1
    item 4): the four modules' distinct cutoff rules, exercised at values
    that discriminate them — mid-batch, exact-boundary, and partial-last-
    batch cases — plus the label x max_samples interplay and the shuffled
    LS/ELS streams (reference idealscore.py:184-187,432-444,524-535,602-615,
    489)."""
    stub_torchvision()
    sys.path.insert(0, REFERENCE)
    from src.utils import idealscore
    from src.utils.noise_schedules import cosine_noise_schedule
    from torch.utils.data import TensorDataset

    dev = torch.device("cpu")
    rs = np.random.RandomState(3)
    N, cc, hh, BS = 12, 3, 8, 5  # batches [5, 5, 2] — partial last batch
    imgs = torch.tensor(rs.uniform(-1, 1, size=(N, cc, hh, hh)).astype(np.float32))
    labs = torch.tensor(rs.randint(0, 3, size=(N,)).astype(np.int64))
    ds = TensorDataset(imgs, labs)
    torch.manual_seed(5)
    xs = torch.randn(1, cc, hh, hh)
    ts = torch.tensor([0.45])
    arrays = {
        "imgs": imgs.numpy(), "labs": labs.numpy().astype(np.int64),
        "x": xs.numpy(), "t": ts.numpy(),
    }

    def run_is(tag, **kw):
        label = kw.pop("label", None)
        mod = idealscore.IdealScoreModule(
            ds, batch_size=BS, schedule=cosine_noise_schedule, **kw
        )
        with torch.no_grad():
            arrays[f"is/{tag}/out"] = mod(ts, xs.clone(), label=label, device=dev).numpy()

    # FILTERED cutoff: cumulative label-kept count incl. this batch <= max
    run_is("max11", max_samples=11)  # partial-batch edge: 5,10<=11, 12>11
    run_is("label1max6", max_samples=6, label=1)  # filtered cumsum mid-batch

    def run_els(tag, seed=None, **kw):
        label = kw.pop("label", None)
        mod = idealscore.LocalEquivScoreModule(
            ds, kernel_size=3, batch_size=BS, schedule=cosine_noise_schedule, **kw
        )
        if seed is not None:
            torch.manual_seed(seed)
            arrays[f"els/{tag}/perm"] = np.array(dataloader_perm(seed, N, BS))
            torch.manual_seed(seed)
        with torch.no_grad():
            arrays[f"els/{tag}/out"] = mod(ts, xs.clone(), label=label, device=dev).numpy()

    # UNFILTERED cutoff: cumulative RAW batch sizes incl. this batch <= max
    run_els("max8", max_samples=8)    # 5<=8, 10>8 -> batch 0 only
    run_els("max10", max_samples=10)  # exact boundary: 10<=10 -> 2 batches
    run_els("max11", max_samples=11)  # 12>11 -> 2 batches (QUOTA would take 3)
    run_els("label1max6", max_samples=6, label=1)  # raw cutoff, filtered means
    run_els("max8shuf", max_samples=8, shuffle=True, seed=77)  # random subset

    def run_ls(tag, seed, **kw):
        label = kw.pop("label", None)
        mod = idealscore.LocalScoreModule(
            ds, kernel_size=3, batch_size=BS, schedule=cosine_noise_schedule, **kw
        )
        # LS hardcodes shuffle=True (idealscore.py:489): record the exact
        # permutation its DataLoader will draw under this global seed
        torch.manual_seed(seed)
        arrays[f"ls/{tag}/perm"] = np.array(dataloader_perm(seed, N, BS))
        torch.manual_seed(seed)
        with torch.no_grad():
            arrays[f"ls/{tag}/out"] = mod(ts, xs.clone(), label=label, device=dev).numpy()

    run_ls("max8shuf", seed=31, max_samples=8)  # FILTERED over a random subset
    run_ls("label0max4shuf", seed=13, max_samples=4, label=0)

    def run_bbels(tag, **kw):
        mod = idealscore.LocalEquivBordersScoreModule(
            ds, kernel_size=3, batch_size=BS, image_size=hh,
            schedule=cosine_noise_schedule, **kw
        )
        with torch.no_grad():
            arrays[f"bbels/{tag}/out"] = mod(ts, xs.clone(), device=dev).numpy()

    # BATCH_QUOTA cutoff: batch i processed iff i*batch_size <= max_samples
    run_bbels("max4", max_samples=4)    # only batch 0 (5 > 4)
    run_bbels("max5", max_samples=5)    # 1*5 <= 5 -> batches 0,1
    run_bbels("max11", max_samples=11)  # 2*5=10 <= 11 -> ALL 3 (UNFILTERED: 2)

    save("cutoffs", **arrays)


def make_ddpm_moments():
    """Statistical golden for the stochastic DDPM path (VERDICT item 8):
    per-pixel mean/std over 512 seeds of the reference's ancestral sampler
    (src/models.py:57-64), at breakstep 3 and at the final step. Our sampler
    cannot match torch's RNG draw-for-draw; it must match these moments."""
    sys.path.insert(0, REFERENCE)
    from src.models import DDIM, MinimalResNet

    dev = torch.device("cpu")
    b, c, h = 512, 3, 16
    torch.manual_seed(7)
    net = MinimalResNet(
        channels=c, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3,
        mode="zeros",
    ).eval()
    model = DDIM(pretrained_backbone=net, in_channels=c, default_imsize=h)
    torch.manual_seed(21)
    x0 = torch.randn(b, c, h, h)
    with torch.no_grad():
        out = model.sample(batch_size=b, x=x0.clone(), nsteps=5, ddpm=True, device=dev)
        mid = model.sample(
            batch_size=b, x=x0.clone(), nsteps=5, ddpm=True, breakstep=3, device=dev
        )
    save(
        "ddpm_moments",
        **sd_to_numpy(net.state_dict(), "sd/"),
        x0=x0.numpy(),
        final_mean=out.mean(dim=0).numpy(), final_std=out.std(dim=0).numpy(),
        mid_mean=mid.mean(dim=0).numpy(), mid_std=mid.std(dim=0).numpy(),
    )


def make_batchnorm_goldens():
    """BatchNorm UNet parity (VERDICT item 5): train-mode forwards update
    running stats (reference src/models.py:306-309,232-237), then an
    eval-mode forward uses them. Records the post-training state_dict
    (incl. running_mean/var), the train-mode outputs, and the eval output."""
    stub_torchvision()
    sys.path.insert(0, REFERENCE)
    from src.models import MinimalUNet

    b, c, h = 4, 3, 16
    torch.manual_seed(7)
    net = MinimalUNet(
        channels=c, fsizes=[8, 16], emb_dim=16, kernel_size=3, lastksize=1,
        mode="zeros", normalization="BatchNorm", last_norm=True,
    )
    torch.manual_seed(3)
    xs = [torch.randn(b, c, h, h) for _ in range(3)]
    t = torch.tensor([0.3, 0.8, 0.5, 0.1])
    net.train()
    train_outs = []
    with torch.no_grad():
        for xb in xs:
            train_outs.append(net(t, xb).numpy())
    net.eval()
    torch.manual_seed(11)
    xe = torch.randn(b, c, h, h)
    with torch.no_grad():
        out_eval = net(t, xe).numpy()
    save(
        "unet_batchnorm",
        **sd_to_numpy(net.state_dict(), "sd/"),
        t=t.numpy(),
        **{f"x{i}": xb.numpy() for i, xb in enumerate(xs)},
        **{f"train_out{i}": o for i, o in enumerate(train_outs)},
        x_eval=xe.numpy(),
        out_eval=out_eval,
    )


def make_eval_goldens():
    """Eval-correlation golden (round-3 VERDICT item 5): run the REAL
    reference eval_script.main() (scripts/eval_script.py:57-75 — mean-center,
    L2-normalize, inner products, medians, ELS>IS fraction) on fixture
    seed/els_output/ideal triples + a saved whole-model pickle, and record
    its three printed numbers. `pipeline.evaluate_correlations` must
    reproduce them from the same fixtures."""
    import contextlib
    import importlib.util
    import io
    import tempfile

    stub_torchvision()
    sys.path.insert(0, REFERENCE)
    import matplotlib

    matplotlib.use("Agg")
    from src.models import DDIM, MinimalResNet

    spec = importlib.util.spec_from_file_location(
        "ref_eval_script", os.path.join(REFERENCE, "scripts", "eval_script.py")
    )
    es = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(es)
    # get_dataset's metadata is unused by the script (eval_script.py:38);
    # neutralize it (the torchvision stubs cannot download) + headless fig
    es.get_dataset = lambda name: (None, {})
    es.plt.show = lambda: None

    n, c, h = 5, 3, 16
    cases = {
        "uncond": dict(conditional=False),
        "cond": dict(conditional=True, num_classes=10),
    }
    arrays = {}
    for tag, cfg in cases.items():
        torch.manual_seed(7)
        net = MinimalResNet(
            channels=c, emb_dim=16, kernel_size=3, num_layers=2, lastksize=3,
            mode="zeros", conditional=cfg["conditional"],
            **({"num_classes": cfg["num_classes"]} if cfg["conditional"] else {}),
        ).eval()
        model = DDIM(pretrained_backbone=net, in_channels=c, default_imsize=h)
        torch.manual_seed(19)
        seeds = torch.randn(n, 1, c, h, h)
        theo = torch.randn(n, 1, c, h, h) * 0.6
        ideal = torch.randn(n, 1, c, h, h) * 0.6
        labels = torch.randint(0, 10, (n, 1))
        with tempfile.TemporaryDirectory() as tmp:
            for sub in ("seeds", "els_outputs", "ideal", "labels"):
                os.makedirs(os.path.join(tmp, sub))
            for i in range(n):
                torch.save(seeds[i].clone(), os.path.join(tmp, "seeds", f"{i:04d}.pt"))
                torch.save(theo[i].clone(), os.path.join(tmp, "els_outputs", f"{i:04d}.pt"))
                torch.save(ideal[i].clone(), os.path.join(tmp, "ideal", f"{i:04d}.pt"))
                if cfg["conditional"]:
                    torch.save(
                        labels[i].clone(), os.path.join(tmp, "labels", f"{i:04d}.pt")
                    )
            torch.save(model, os.path.join(tmp, "model.pt"))
            argv = [
                "eval_script.py", "--exp_fname", tmp,
                "--model_fname", os.path.join(tmp, "model.pt"),
                "--dsname", "cifar10", "--figname", "corrs.png",
            ] + (["--conditional"] if cfg["conditional"] else [])
            old_argv, old_cwd = sys.argv, os.getcwd()
            buf = io.StringIO()
            try:
                sys.argv = argv
                os.chdir(tmp)  # the scatter figure writes to cwd
                with torch.no_grad(), contextlib.redirect_stdout(buf):
                    es.main()
            finally:
                sys.argv, _ = old_argv, os.chdir(old_cwd)
        med_ideal, med_target, frac = (
            float(v) for v in buf.getvalue().strip().splitlines()[:3]
        )
        arrays.update(sd_to_numpy(net.state_dict(), f"{tag}/sd/"))
        arrays[f"{tag}/seeds"] = seeds[:, 0].numpy()
        arrays[f"{tag}/theo"] = theo[:, 0].numpy()
        arrays[f"{tag}/ideal"] = ideal[:, 0].numpy()
        arrays[f"{tag}/labels"] = labels[:, 0].numpy()
        arrays[f"{tag}/median_ideal"] = np.array(med_ideal)
        arrays[f"{tag}/median_target"] = np.array(med_target)
        arrays[f"{tag}/frac"] = np.array(frac)
    save("eval_corrs", **arrays)


def make_calibration_goldens():
    """End-to-end calibration golden: run the REAL reference
    scales_calibration.calibrate() (scripts/scales_calibration.py:33-188 —
    per-step CNN DDIM advance, per-k analytic estimates, argmax-cos /
    argmin-L2 selection, median/mode aggregation) on a tiny fixture dataset
    + pickled model, recording the torch seed/label draws by interception so
    our batched `calibration.calibrate(x0=..., labels=...)` can replay them
    exactly."""
    import importlib.util
    import tempfile

    stub_torchvision()
    sys.path.insert(0, REFERENCE)
    from src.models import DDIM, MinimalResNet

    spec = importlib.util.spec_from_file_location(
        "ref_scales_calibration",
        os.path.join(REFERENCE, "scripts", "scales_calibration.py"),
    )
    sc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sc)

    from torch.utils.data import TensorDataset

    rs = np.random.RandomState(17)
    N, c, h = 12, 1, 8
    imgs = torch.tensor(rs.uniform(-1, 1, size=(N, c, h, h)).astype(np.float32))
    labs = torch.tensor(rs.randint(0, 3, size=(N,)).astype(np.int64))
    ds = TensorDataset(imgs, labs)
    sc.get_dataset = lambda name, root=None: (
        ds, {"num_channels": c, "image_size": h}
    )

    cases = {
        # (scoremoduletype, conditional, eval_mode, nsamps, nsteps, torch seed)
        "uncond_cos": ("bbELS", False, "cos", 3, 4, 123),
        "cond_cos": ("bbELS", True, "cos", 3, 3, 31),
        "uncond_l2": ("ELS", False, "l2_dist", 2, 3, 7),
    }
    arrays = {"imgs": imgs.numpy(), "labs": labs.numpy().astype(np.int64)}
    for tag, (smt, conditional, eval_mode, nsamps, nsteps, seed) in cases.items():
        torch.manual_seed(5 if conditional else 6)
        net = MinimalResNet(
            channels=c, emb_dim=16, kernel_size=3, num_layers=1, lastksize=3,
            mode="zeros", conditional=conditional,
            **({"num_classes": 3} if conditional else {}),
        ).eval()
        model = DDIM(pretrained_backbone=net, in_channels=c, default_imsize=h)
        # record the reference's torch.randn / torch.randint draws in call
        # order (per sample: [randint when conditional,] randn — no other RNG
        # consumer runs inside the no_grad loop; loaders are shuffle=False)
        drawn_x, drawn_lab = [], []
        orig_randn, orig_randint = torch.randn, torch.randint

        def rec_randn(*a, **kw):
            v = orig_randn(*a, **kw)
            drawn_x.append(v.clone())
            return v

        def rec_randint(*a, **kw):
            v = orig_randint(*a, **kw)
            drawn_lab.append(v.clone())
            return v

        with tempfile.TemporaryDirectory() as tmp:
            torch.save(model, os.path.join(tmp, "m.pt"))
            torch.manual_seed(seed)
            torch.randn, torch.randint = rec_randn, rec_randint
            try:
                with torch.no_grad():
                    res = sc.calibrate(
                        tld=tmp, modelfile="m.pt", dataset_name="fixture",
                        scoremoduletype=smt, conditional=conditional,
                        kernelsizes=[3, 5], scorebatchsize=6, nsamps=nsamps,
                        nsteps=nsteps, nlabels=3, eval_mode=eval_mode, cpu=True,
                    )
            finally:
                torch.randn, torch.randint = orig_randn, orig_randint
        assert len(drawn_x) == nsamps, (tag, len(drawn_x))
        arrays.update(sd_to_numpy(net.state_dict(), f"{tag}/sd/"))
        arrays[f"{tag}/x0"] = torch.cat(drawn_x, dim=0).numpy()  # [nsamps,c,h,h]
        if conditional:
            assert len(drawn_lab) == nsamps
            arrays[f"{tag}/labels"] = torch.cat(drawn_lab).numpy()
        arrays[f"{tag}/k_optimals"] = res["k_optimals"].numpy().astype(np.int32)
        arrays[f"{tag}/median"] = res["median"].numpy().astype(np.int32)
        arrays[f"{tag}/mode"] = res["mode"].numpy().astype(np.int32)
    save("calibration", **arrays)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", default=None,
        choices=[None, "main", "cutoffs", "ddpm_moments", "batchnorm", "eval",
                 "calibration"],
    )
    a = ap.parse_args()
    if a.only in (None, "main"):
        main()
    if a.only in (None, "cutoffs"):
        make_cutoff_goldens()
    if a.only in (None, "ddpm_moments"):
        make_ddpm_moments()
    if a.only in (None, "batchnorm"):
        make_batchnorm_goldens()
    if a.only in (None, "eval"):
        make_eval_goldens()
    if a.only in (None, "calibration"):
        make_calibration_goldens()
