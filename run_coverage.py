#!/usr/bin/env python
"""Coverage runner (counterpart of /root/reference/run_coverage.py): wraps
pytest with coverage over the package when pytest-cov is available, plain
pytest otherwise."""

import subprocess
import sys


def main():
    base = [sys.executable, "-m", "pytest", "tests/", "-q"]
    try:
        import pytest_cov  # noqa: F401

        base += [
            "--cov=convolutional_diffusion_tpu",
            "--cov-report=term-missing",
            "--cov-report=html",
        ]
    except ImportError:
        print("pytest-cov not installed; running plain pytest", file=sys.stderr)
    raise SystemExit(subprocess.call(base + sys.argv[1:]))


if __name__ == "__main__":
    main()
