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


# --- sync-mode parity gates (VERDICT r4 #3) --------------------------------
# scripts/bench_loose.py measures strict/loose/free on the same 61-frame
# workload and writes BENCH_SYNC.json.  Loose trades throughput for its
# reference-semantics mapper gate (every//2 remap cadence -> ~1.4x the
# mapping events, matching /root/reference/src/Mapper.py:556-558) — the
# whole-run FPS floor asserts the engineering stays within that semantic
# cost.  Measured samples (PERF.md r5): loose/strict 0.57 and 0.69 across
# two TPU runs whose strict baseline itself swung 2.75 -> 4.65 FPS (tunnel
# variance), hence the 0.5 floor: wide enough for the tunnel, tight enough
# that a 2x engineering regression trips it.
#
# Free mode's whole-run FPS is NOT a parity metric: its mapper thread maps
# as often as polling allows, so the total mapping work per run is
# schedule-dependent (6 vs 9 events across the two samples; FPS 2.2 vs
# 3.4).  Free is gated on liveness + per-frame tracking cost instead.
# The per-event columns are the engineering-parity evidence proper:
# loose's mapping cost per event matched strict within measurement noise
# (951 vs 955 ms in the cleaner sample).

LOOSE_OVER_STRICT_FLOOR = 0.5
LOOSE_MAPPING_PER_EVENT_CEIL = 1.6  # x strict (measured 1.00-1.32x)


def test_sync_mode_gates():
    path = os.path.join(ROOT, "BENCH_SYNC.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_SYNC.json recorded yet")
    with open(path) as f:
        rec = json.load(f)
    modes = rec["modes"]
    assert set(modes) == {"strict", "loose", "free"}
    for mode, row in modes.items():
        assert row["fps"] > 0 and row["tracked_frames"] > 0, (mode, row)
        assert row["mapping_events"] > 0, (mode, row)
    assert rec["loose_over_strict"] >= LOOSE_OVER_STRICT_FLOOR, (
        f"loose fell to {rec['loose_over_strict']}x strict "
        f"(floor {LOOSE_OVER_STRICT_FLOOR})")
    # engineering parity: a loose mapping event runs the same jitted
    # program as a strict one and must cost about the same wall time
    s_map = modes["strict"]["mapping_ms_per_event"]
    assert modes["loose"]["mapping_ms_per_event"] <= (
        LOOSE_MAPPING_PER_EVENT_CEIL * s_map), (
        f"loose mapping {modes['loose']['mapping_ms_per_event']} ms/event "
        f"vs strict {s_map} (ceil {LOOSE_MAPPING_PER_EVENT_CEIL}x)")
    # free: liveness only for mapping (see module comment); its per-event
    # wall time legitimately absorbs concurrent tracker work
    assert modes["free"]["coarse_mapping_events"] > 0
    # per-tracked-frame engineering parity: threaded tracking dispatch
    # may cost more than strict's batched presampled path (which fuses
    # non-mapping frames into one module), but not catastrophically
    s = modes["strict"]["tracking_ms_per_frame"]
    for mode in ("loose", "free"):
        assert modes[mode]["tracking_ms_per_frame"] <= max(4.0 * s, 25.0), (
            f"{mode} per-frame tracking cost "
            f"{modes[mode]['tracking_ms_per_frame']} ms vs strict {s} ms")
