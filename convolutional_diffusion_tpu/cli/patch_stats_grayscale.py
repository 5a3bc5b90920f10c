"""Grayscale patch-distance analysis CLI — counterpart of
`/root/reference/scripts/run_distribution_analysis_grayscale.py` (a thin
wrapper: same sweep with on-the-fly grayscale conversion; results prefixed
`grayscale_`)."""

from .patch_stats import main as _main


def main(argv=None):
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    if "--grayscale" not in argv:
        argv.append("--grayscale")
    _main(argv)


if __name__ == "__main__":
    main()
