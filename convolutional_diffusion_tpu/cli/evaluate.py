"""Evaluation CLI — counterpart of `/root/reference/scripts/eval_script.py`.

Compares neural samples (from saved seeds) against ELS and IS machine outputs
by normalized correlation; prints the medians and the fraction of seeds where
the ELS machine beats the IS machine; writes the scatter figure.
"""

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluation Script")
    parser.add_argument("--exp_fname", type=str, default="./")
    parser.add_argument("--model_fname", type=str, default="./model_checkpoints/test.pt")
    parser.add_argument("--outputname", type=str, default="els_outputs")
    parser.add_argument("--dsname", type=str, default="cifar10")
    parser.add_argument("--conditional", action="store_true", default=False)
    parser.add_argument("--title", type=str, default="")
    parser.add_argument("--figname", type=str, default="corrs.png")
    parser.add_argument("--nsteps", type=int, default=20)
    parser.add_argument("--cpu", action="store_true", default=False,
                        help="force the CPU backend (the TPU platform is "
                             "pinned at config level; env vars cannot)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    from ..data import get_metadata
    from ..pipeline import evaluate_correlations
    from ..sampling import sample_scan
    from .common import load_model

    metadata = get_metadata(args.dsname)
    model, params = load_model(args.model_fname)
    if model.conditional and not args.conditional:
        raise SystemExit(
            "model is conditional but --conditional not given (and the "
            "experiment has no labels/ directory to read labels from)"
        )

    def sample_fn(x, labels):
        return sample_scan(
            model.apply, model.noise_schedule, params, x,
            nsteps=args.nsteps, label=labels,
        )

    res = evaluate_correlations(
        args.exp_fname,
        sample_fn,
        outputname=args.outputname,
        conditional=args.conditional,
        channels=metadata["num_channels"],
    )
    print(res["median_ideal"])
    print(res["median_target"])
    print(res["frac_els_beats_is"])

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_xlabel(r"$r^2$, IS Machine")
    ax.set_ylabel(r"$r^2$, ELS Machine")
    ax.scatter(res["ideal_corrs"], res["target_corrs"])
    ax.plot([0, 1], [0, 1], color="orange")
    ax.set_title(args.title)
    figname = "scatter_" + args.figname
    fig.savefig(figname, bbox_inches="tight", pad_inches=0)
    print(f"wrote {figname}")


if __name__ == "__main__":
    main()
