"""CLI surface tests (argparse paths + a tiny end-to-end run).

The full-pipeline run uses a small synthetic pair and a narrow disparity
range so the XLA CPU compile stays quick.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "adcensus_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        **kw,
    )


def test_cli_rejects_unknown_pair():
    r = _run_cli(["--pair", "Bogus"])
    assert r.returncode != 0
    assert "unknown pair" in r.stderr
    assert "Cone" in r.stderr  # lists the valid names


def test_cli_requires_inputs():
    r = _run_cli([])
    assert r.returncode != 0
    assert "provide LEFT RIGHT paths or --pair NAME" in r.stderr


def test_cli_end_to_end_tiny(tmp_path):
    """Synthetic pair through the real CLI: metrics JSON + saved PNGs +
    point cloud."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    from adcensus_tpu.io import native_png

    left, right = g._tiny_pair(32, 48)
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    assert native_png.encode(left, lp) and native_png.encode(right, rp)

    prefix = str(tmp_path / "out")
    cloud = str(tmp_path / "cloud.txt")
    r = _run_cli(
        [lp, rp, "0", "8", "--out", prefix, "--cloud", cloud],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "density_pct" in r.stdout
    for suffix in ("-d.png", "-c.png"):
        img = native_png.decode(prefix + suffix)
        assert img is not None and img.shape[:2] == (32, 48)
    lines = open(cloud).read().strip().splitlines()
    assert lines and len(lines[0].split()) == 6


def test_cli_tunable_flags(tmp_path):
    """Every ADCensusOption tunable is reachable from the CLI
    (adcensus_types.h:45-75); overrides actually change the pipeline."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g
    from adcensus_tpu.io import native_png

    left, right = g._tiny_pair(32, 48)
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    assert native_png.encode(left, lp) and native_png.encode(right, rp)

    r = _run_cli(
        [
            lp, rp, "0", "8", "--no-save",
            "--lambda-ad", "12", "--lambda-census", "25",
            "--cross-l1", "8", "--cross-l2", "4",
            "--so-p1", "0.5", "--so-p2", "2.0",
            "--no-do-lr-check", "--no-do-filling", "--exact-median",
        ],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "density_pct" in r.stdout

    r = _run_cli([lp, rp, "0", "8", "--no-save", "--bogus-flag", "1"])
    assert r.returncode != 0
