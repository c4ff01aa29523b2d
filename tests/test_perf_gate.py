"""Performance regression gates (VERDICT r2 next #3).

The driver runs ``bench.py`` on the real TPU at the end of every round and
records the JSON line in ``BENCH_r{N}.json``.  This gate asserts the most
recent recorded benchmark stays above the achieved floors, so a silent 2x
mapping/step-time regression ships a red suite instead of a green one.

Floors are set against round-3's HONEST measured semantics (BENCH_r03:
7.94 e2e FPS on the real strict loop, 69.4 tracking wall-FPS/frame
including per-frame host+tunnel cost, 6.38 ms/mapping-iter) at roughly
2/3 of the achieved numbers — far above the paper baseline (0.49 FPS
e2e, ~47 ms/tracking-iter, ~130 ms/mapping-iter) but loose enough for
tunnel variance.  Round 2's 1557 "tracking FPS" was a pipelined-dispatch
fiction (PERF.md r3); a floor derived from it would be red forever.
"""

import glob
import json
import os
import re

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

E2E_FPS_FLOOR = 6.5
TRACKING_FPS_FLOOR = 45.0
MAPPING_MS_PER_ITER_CEIL = 11.0


def _latest_bench():
    paths = glob.glob(os.path.join(ROOT, "BENCH_r*.json"))
    if not paths:
        return None, None
    def round_no(p):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    path = max(paths, key=round_no)
    with open(path) as f:
        rec = json.load(f)
    # the driver wraps the bench line under 'parsed'
    return path, rec.get("parsed", rec)


def test_bench_floors():
    path, rec = _latest_bench()
    if rec is None:
        pytest.skip("no BENCH_r*.json recorded yet")
    if not isinstance(rec, dict) or "value" not in rec:
        pytest.skip(f"{path} has no parsed bench line (bench run failed?)")
    assert rec["value"] >= E2E_FPS_FLOOR, (
        f"{path}: end-to-end {rec['value']} FPS fell below the "
        f"{E2E_FPS_FLOOR} FPS floor")
    if "tracking_fps" in rec:
        assert rec["tracking_fps"] >= TRACKING_FPS_FLOOR, (
            f"{path}: tracking {rec['tracking_fps']} FPS below floor")
    if "mapping_ms_per_iter" in rec:
        assert rec["mapping_ms_per_iter"] <= MAPPING_MS_PER_ITER_CEIL, (
            f"{path}: mapping {rec['mapping_ms_per_iter']} ms/iter above "
            f"ceiling")
