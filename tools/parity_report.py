"""Generate PARITY.md: max deviations of this framework vs the recorded
torch-reference goldens, across every golden case. Run on CPU:

    python tools/parity_report.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def dev(ours, ref_nchw):
    expect = nhwc(ref_nchw)
    a = np.abs(np.asarray(ours) - expect)
    scale = max(np.abs(expect).max(), 1e-12)
    return a.max(), a.max() / scale


def main():
    import jax.numpy as jnp

    from convolutional_diffusion_tpu import convert, sampling
    from convolutional_diffusion_tpu.models import (
        DiffusionModel,
        MinimalResNet,
        MinimalUNet,
    )
    from convolutional_diffusion_tpu.schedules import (
        cosine_noise_schedule,
        exponential_schedule,
    )
    from convolutional_diffusion_tpu.scores import (
        IdealScoreModule,
        LocalEquivBordersScoreModule,
        LocalEquivScoreModule,
        LocalScoreModule,
        ScheduledScoreMachine,
    )

    rows = []

    def add(section, case, ours, ref):
        mx, rel = dev(ours, ref)
        rows.append((section, case, mx, rel))

    # ---- model forwards ----
    z = np.load(os.path.join(GOLDEN_DIR, "resnet_forward.npz"))
    cfgs = {
        "zeros_plain": dict(mode="zeros", normalization=None, conditional=False),
        "circular_plain": dict(mode="circular", normalization=None, conditional=False),
        "zeros_norm_cond": dict(mode="zeros", normalization="GroupNorm",
                                conditional=True, num_classes=10),
        "zeros_noaddone": dict(mode="zeros", normalization=None,
                               conditional=False, add_one=False),
    }
    for name, cfg in cfgs.items():
        sd = {k.split("/sd/")[1]: z[k] for k in z.files if k.startswith(f"{name}/sd/")}
        net = MinimalResNet(channels=3, emb_dim=16, kernel_size=3, num_layers=2,
                            lastksize=3, **cfg)
        params = convert.resnet_params_from_torch(
            sd, num_layers=2, normalization=cfg["normalization"],
            add_one=cfg.get("add_one", True), conditional=cfg["conditional"])
        lab = jnp.asarray(z["label"]) if cfg["conditional"] else None
        out = net.apply({"params": params}, jnp.asarray(z["t"]),
                        jnp.asarray(nhwc(z["x"])), lab)
        add("MinimalResNet forward", name, out, z[f"{name}/out"])

    z = np.load(os.path.join(GOLDEN_DIR, "unet_forward.npz"))
    ucfgs = {
        "zeros_plain": dict(mode="zeros", normalization=None, conditional=False),
        "circular_plain": dict(mode="circular", normalization=None, conditional=False),
        "zeros_norm_cond": dict(mode="zeros", normalization="GroupNorm",
                                conditional=True, num_classes=10, last_norm=True),
    }
    for name, cfg in ucfgs.items():
        sd = {k.split("/sd/")[1]: z[k] for k in z.files if k.startswith(f"{name}/sd/")}
        net = MinimalUNet(channels=3, fsizes=(8, 16, 32), emb_dim=16,
                          kernel_size=3, lastksize=1, **cfg)
        params = convert.unet_params_from_torch(
            sd, n_feature_blocks=2, conditional=cfg["conditional"],
            last_norm=cfg.get("last_norm", False))
        lab = jnp.asarray(z["label"]) if cfg["conditional"] else None
        out = net.apply({"params": params}, jnp.asarray(z["t"]),
                        jnp.asarray(nhwc(z["x"])), lab)
        add("MinimalUNet forward", name, out, z[f"{name}/out"])

    # ---- samplers ----
    z = np.load(os.path.join(GOLDEN_DIR, "sample.npz"))
    sd = {k.split("sd/")[1]: z[k] for k in z.files if k.startswith("sd/")}
    net = MinimalResNet(channels=3, emb_dim=16, kernel_size=3, num_layers=2,
                        lastksize=3, mode="zeros")
    params = convert.resnet_params_from_torch(sd, num_layers=2,
                                              normalization=None,
                                              conditional=False)
    model = DiffusionModel(net, in_channels=3, default_imsize=16)
    out = sampling.sample(model, params, x=jnp.asarray(nhwc(z["x0"])), nsteps=5)
    add("DDIM sampler (5 steps)", "deterministic", out, z["out_ddim"])
    out = sampling.sample(model, params, x=jnp.asarray(nhwc(z["x0"])), nsteps=5,
                          breakstep=3)
    add("DDIM sampler", "breakstep=3", out, z["out_break"])

    # ---- score machines ----
    z = np.load(os.path.join(GOLDEN_DIR, "scores.npz"))
    imgs = nhwc(z["imgs"])
    labs = z["labs"].astype(np.int32)
    x = jnp.asarray(nhwc(z["x"]))
    t = float(z["t"][0])

    add("IdealScore", "uneven batches (b5)",
        IdealScoreModule((imgs, labs), batch_size=5,
                         schedule=cosine_noise_schedule)(t, x), z["is/b5/out"])
    add("IdealScore", "label filter",
        IdealScoreModule((imgs, labs), batch_size=5,
                         schedule=cosine_noise_schedule)(t, x, label=1),
        z["is/label1/out"])
    add("IdealScore", "max_samples=8",
        IdealScoreModule((imgs, labs), batch_size=5,
                         schedule=cosine_noise_schedule, max_samples=8)(t, x),
        z["is/max8/out"])
    for k in (3, 5):
        add("LocalScore", f"k={k}",
            LocalScoreModule((imgs, labs), kernel_size=k, batch_size=12,
                             schedule=cosine_noise_schedule)(t, x),
            z[f"ls/k{k}/out"])
    add("LocalScore", "exponential default schedule",
        LocalScoreModule((imgs, labs), kernel_size=3, batch_size=12)(t, x),
        z["ls/k3exp/out"])
    for k in (3, 5):
        for bs in (5, 12):
            add("ELS", f"k={k} batch={bs}",
                LocalEquivScoreModule((imgs, labs), kernel_size=k, batch_size=bs,
                                      schedule=cosine_noise_schedule)(t, x),
                z[f"els/k{k}b{bs}/out"])
    add("ELS", "label filter",
        LocalEquivScoreModule((imgs, labs), kernel_size=3, batch_size=5,
                              schedule=cosine_noise_schedule)(t, x, label=2),
        z["els/k3label2/out"])
    add("ELS", "batched x (b=2)",
        LocalEquivScoreModule((imgs, labs), kernel_size=3, batch_size=5,
                              schedule=cosine_noise_schedule)(
            t, jnp.asarray(nhwc(z["x2"]))),
        z["els/k3b5x2/out"])
    for k in (3, 5):
        for bs in (5, 12):
            add("bbELS", f"k={k} batch={bs}",
                LocalEquivBordersScoreModule(
                    (imgs, labs), kernel_size=k, batch_size=bs,
                    schedule=cosine_noise_schedule)(t, x),
                z[f"bbels/k{k}b{bs}/out"])
    add("bbELS", "k=7 on 12x12 (3px borders)",
        LocalEquivBordersScoreModule(
            (nhwc(z["big/imgs"]), z["big/labs"].astype(np.int32)),
            kernel_size=7, batch_size=4, image_size=12,
            schedule=cosine_noise_schedule)(t, jnp.asarray(nhwc(z["big/x"]))),
        z["big/bbels_k7/out"])

    # large-d goldens (b=1 — the reference NaNs at b>1 / large d, see
    # tools/make_goldens.py "bigk")
    imgs24 = nhwc(z["bigk/imgs24"])
    labs24 = z["bigk/labs24"].astype(np.int32)
    x24 = jnp.asarray(nhwc(z["bigk/x24"])[:1])
    for k in (13, 19):
        add("ELS large-d", f"k={k} 24x24",
            LocalEquivScoreModule((imgs24, labs24), kernel_size=k,
                                  batch_size=5,
                                  schedule=cosine_noise_schedule)(t, x24),
            z[f"bigk/els_k{k}/out"])
    add("bbELS large-d", "k=13 24x24",
        LocalEquivBordersScoreModule(
            (imgs24, labs24), kernel_size=13, batch_size=5,
            schedule=cosine_noise_schedule)(t, x24),
        z["bigk/bbels_k13/out"])
    add("ScheduledScoreMachine large-d", "k 3/13/19 trajectory, 24x24",
        ScheduledScoreMachine(
            LocalEquivScoreModule((imgs24, labs24), kernel_size=3,
                                  batch_size=5,
                                  schedule=cosine_noise_schedule),
            in_channels=3, imsize=24,
            scales=[int(s) for s in z["bigk/machine/scales"]])(x24),
        z["bigk/machine/out"])
    add("ELS large-d", "k=27 28x28",
        LocalEquivScoreModule(
            (nhwc(z["bigk/imgs28"]), z["bigk/labs28"].astype(np.int32)),
            kernel_size=27, batch_size=6,
            schedule=cosine_noise_schedule)(t, jnp.asarray(nhwc(z["bigk/x28"])[:1])),
        z["bigk/els_k27/out"])

    # grayscale (c=1) goldens — the MNIST/FashionMNIST workload family
    # (4 of the reference's 10 stored scales files are single-channel)
    imgs16 = nhwc(z["gray/imgs16"])
    labs16 = z["gray/labs16"].astype(np.int32)
    x16 = jnp.asarray(nhwc(z["gray/x16"]))
    for k in (3, 7):
        add("ELS grayscale", f"k={k} c=1 16x16",
            LocalEquivScoreModule((imgs16, labs16), kernel_size=k,
                                  batch_size=4,
                                  schedule=cosine_noise_schedule)(t, x16),
            z[f"gray/els_k{k}/out"])
    add("bbELS grayscale", "k=5 c=1 16x16",
        LocalEquivBordersScoreModule(
            (imgs16, labs16), kernel_size=5, batch_size=4,
            schedule=cosine_noise_schedule)(t, x16),
        z["gray/bbels_k5/out"])
    add("LS grayscale", "k=3 c=1 16x16",
        LocalScoreModule((imgs16, labs16), kernel_size=3, batch_size=10,
                         schedule=cosine_noise_schedule)(t, x16),
        z["gray/ls_k3/out"])
    add("IS grayscale", "c=1 16x16",
        IdealScoreModule((imgs16, labs16), batch_size=4,
                         schedule=cosine_noise_schedule)(t, x16),
        z["gray/is/out"])
    add("ScheduledScoreMachine grayscale", "ELS backbone, 5 steps, c=1",
        ScheduledScoreMachine(
            LocalEquivScoreModule((imgs16, labs16), kernel_size=3,
                                  batch_size=4,
                                  schedule=cosine_noise_schedule),
            in_channels=1, imsize=16,
            scales=[int(s) for s in z["gray/machine/scales"]])(x16),
        z["gray/machine/out"])

    scales = [int(s) for s in z["machine/scales"]]
    add("ScheduledScoreMachine", "ELS backbone, 5 steps",
        ScheduledScoreMachine(
            LocalEquivScoreModule((imgs, labs), kernel_size=3, batch_size=6,
                                  schedule=cosine_noise_schedule),
            in_channels=3, imsize=8, scales=scales)(x),
        z["machine/els/out"])
    add("ScheduledScoreMachine", "bbELS backbone, 5 steps",
        ScheduledScoreMachine(
            LocalEquivBordersScoreModule((imgs, labs), kernel_size=3, batch_size=6,
                                         schedule=cosine_noise_schedule),
            in_channels=3, imsize=8, scales=scales)(x),
        z["machine/bbels/out"])

    # ---- cutoff / shuffle semantics (round 2; tests/test_cutoffs.py) ----
    zc = np.load(os.path.join(GOLDEN_DIR, "cutoffs.npz"))
    imgs_c = nhwc(zc["imgs"])
    labs_c = zc["labs"].astype(np.int32)
    xc = jnp.asarray(nhwc(zc["x"]))
    tc = float(zc["t"][0])

    def IS(**kw):
        return IdealScoreModule(
            (imgs_c, labs_c), batch_size=5, schedule=cosine_noise_schedule, **kw
        )

    def ELS(**kw):
        return LocalEquivScoreModule(
            (imgs_c, labs_c), kernel_size=3, batch_size=5,
            schedule=cosine_noise_schedule, **kw
        )

    def LS(**kw):
        return LocalScoreModule(
            (imgs_c, labs_c), kernel_size=3, batch_size=5,
            schedule=cosine_noise_schedule, **kw
        )

    def BB(**kw):
        return LocalEquivBordersScoreModule(
            (imgs_c, labs_c), kernel_size=3, batch_size=5,
            schedule=cosine_noise_schedule, **kw
        )

    add("IS cutoff (FILTERED)", "max=11, partial last batch",
        IS(max_samples=11)(tc, xc), zc["is/max11/out"])
    add("IS cutoff (FILTERED)", "label=1 + max=6",
        IS(max_samples=6)(tc, xc, label=1), zc["is/label1max6/out"])
    for ms, tag in ((8, "max8"), (10, "max10"), (11, "max11")):
        add("ELS cutoff (UNFILTERED)", f"max={ms}",
            ELS(max_samples=ms)(tc, xc), zc[f"els/{tag}/out"])
    add("ELS cutoff (UNFILTERED)", "label=1 + max=6",
        ELS(max_samples=6)(tc, xc, label=1), zc["els/label1max6/out"])
    add("ELS shuffle", "recorded DataLoader perm, max=8",
        ELS(max_samples=8)(tc, xc, order=zc["els/max8shuf/perm"]),
        zc["els/max8shuf/out"])
    add("LS shuffle", "recorded perm + max=8",
        LS(max_samples=8)(tc, xc, order=zc["ls/max8shuf/perm"]),
        zc["ls/max8shuf/out"])
    add("LS shuffle", "recorded perm + label=0 + max=4",
        LS(max_samples=4)(tc, xc, label=0, order=zc["ls/label0max4shuf/perm"]),
        zc["ls/label0max4shuf/out"])
    for ms, tag in ((4, "max4"), (5, "max5"), (11, "max11")):
        add("bbELS cutoff (BATCH_QUOTA)", f"max={ms}",
            BB(max_samples=ms)(tc, xc), zc[f"bbels/{tag}/out"])

    # ---- BatchNorm UNet (round 2; tests/test_batchnorm.py) ----
    zb = np.load(os.path.join(GOLDEN_DIR, "unet_batchnorm.npz"))
    sdb = {k[len("sd/"):]: zb[k] for k in zb.files if k.startswith("sd/")}
    netb = MinimalUNet(
        channels=3, fsizes=(8, 16), emb_dim=16, kernel_size=3, lastksize=1,
        mode="zeros", normalization="BatchNorm", last_norm=True,
    )
    variables = convert.unet_variables_from_torch(
        sdb, n_feature_blocks=1, last_norm=True
    )
    tb = jnp.asarray(zb["t"])
    add("BatchNorm UNet", "eval w/ converted running stats",
        netb.apply(variables, tb, jnp.asarray(nhwc(zb["x_eval"]))),
        zb["out_eval"])
    fresh = netb.init(jax.random.PRNGKey(0), tb, jnp.asarray(nhwc(zb["x0"])))
    vars_now = {"params": variables["params"], "batch_stats": fresh["batch_stats"]}
    for i in range(3):
        o, upd = netb.apply(
            vars_now, tb, jnp.asarray(nhwc(zb[f"x{i}"])), train=True,
            mutable=["batch_stats"],
        )
        vars_now = {"params": vars_now["params"], **upd}
        add("BatchNorm UNet", f"train-mode forward {i} (stats updating)",
            o, zb[f"train_out{i}"])

    # ---- whole-pickle ingestion ----
    zp = np.load(os.path.join(GOLDEN_DIR, "pickle_forward.npz"))
    pk = os.path.join(GOLDEN_DIR, "pickles")
    m, p = convert.diffusion_model_from_torch_pickle(
        os.path.join(pk, "backbone_resnet_cond.pt"))
    add("Checkpoint ingestion", "conditional ResNet .pt",
        m.apply(p, jnp.asarray(zp["t"]), jnp.asarray(nhwc(zp["x"])),
                jnp.asarray(zp["label"])), zp["resnet_out"])
    m, p = convert.diffusion_model_from_torch_pickle(
        os.path.join(pk, "backbone_unet.pt"))
    add("Checkpoint ingestion", "GroupNorm UNet .pt",
        m.apply(p, jnp.asarray(zp["t"]), jnp.asarray(nhwc(zp["x"])), None),
        zp["unet_out"])

    # ---- write report ----
    lines = [
        "# PARITY — this framework vs the torch reference",
        "",
        "Max deviations against golden outputs recorded by RUNNING the",
        "reference (/root/reference) on fixed inputs (tools/make_goldens.py).",
        "All runs fp32 `precision='highest'`. Target: <1e-3 relative-to-scale",
        "(normative convention + rationale: BASELINE.md \"Parity-deviation",
        "convention\"); regenerate with `python tools/parity_report.py`.",
        "",
        "| component | case | max abs dev | max rel-to-scale dev |",
        "|---|---|---|---|",
    ]
    worst = 0.0
    for section, case, mx, rel in rows:
        lines.append(f"| {section} | {case} | {mx:.2e} | {rel:.2e} |")
        worst = max(worst, rel)
    lines += [
        "",
        f"**Worst relative deviation across all {len(rows)} cases: {worst:.2e}**",
        "",
    ]
    path = os.path.join(REPO, "PARITY.md")
    # preserve the hardware section tools/parity_tpu.py maintains between
    # its markers — this tool owns only the CPU-golden part above it
    tpu_section = ""
    if os.path.exists(path):
        old = open(path).read()
        start = old.find("<!-- TPU-MOSAIC-START -->")
        if start != -1:
            tpu_section = old[start:]
    with open(path, "w") as f:
        f.write("\n".join(lines) + tpu_section)
    print(f"wrote {path}: {len(rows)} cases, worst rel dev {worst:.2e}"
          + (" (TPU section preserved)" if tpu_section else ""))


if __name__ == "__main__":
    main()
