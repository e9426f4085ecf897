"""The example scripts must keep running (small configs, CPU)."""

import pathlib
import runpy
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(str(ROOT / script), run_name="__main__")
    except SystemExit as e:
        assert not e.code
    finally:
        sys.argv = old


def test_parity_2d_example():
    _run("examples/parity_2d.py", ["--points", "300", "--cells", "6"])


def test_parity_3d_example():
    _run("examples/parity_3d.py", ["--points", "150", "--cells", "4"])
