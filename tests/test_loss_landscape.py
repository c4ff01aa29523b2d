"""Smoke test for the tracking-loss landscape diagnostic
(tools/loss_landscape.py): plumbing only — a fresh (untrained) map, two
frames, a 3-point sweep.  The landscape VALUES are exercised for shape
and finiteness, not meaning (that needs a trained checkpoint; see
RESULTS.md 2b for the real r5 use)."""

import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_loss_landscape_smoke(tmp_path):
    rec = tmp_path / "landscape.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "nice_slam_tpu.tools.loss_landscape",
         "--out", str(tmp_path / "out"), "--no_resume",
         "--frames", "0", "2", "--deltas_cm", "-2", "0", "2",
         "--pixels", "64", "--n_frames", "4",
         "--record", str(rec)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    book = json.loads(rec.read_text())
    assert set(book) == {"0", "2"}
    for rows in book.values():
        assert set(rows) == {"lateral-x", "vertical-y", "yaw"}
        for r_ in rows.values():
            assert len(r_["losses"]) == 3
            assert all(isinstance(v, float) for v in r_["losses"])
            assert r_["argmin_delta"] in (-0.02, 0.0, 0.02)
