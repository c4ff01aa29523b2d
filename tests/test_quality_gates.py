"""Quality regression gates at ACHIEVED levels (VERDICT r2 next #3, #5, #7).

``python -m nice_slam_tpu.tools.selfcheck --record QUALITY.json`` (and the
``--gt_camera --frames 150 --orbit_radians 6.283`` / ``--imap`` variants,
plus ``tools.track_envelope --record QUALITY.json``) runs on the real TPU
(~8 min each) and records its metrics; this gate pins each recorded run
kind to its achieved quality so a 1.5-2x regression ships a red suite, not
a green one.  Bounds sit between the achieved value and ~1.5x of it —
loose enough for RNG/selection variance (the orbit seed is fixed), tight
enough that a real quality regression trips them.

Achieved (round 3, RESULTS.md / QUALITY.json):
  * tracked 30-frame sweep:   ATE family median 5.9 cm -> median gate
                              6.5 cm, per-seed gate 9.5 cm.  (Family =
                              tracked + tracked_s0/s1/s2: 3.7/5.0/6.9/6.9.)
                              The 30-frame sweep is
                              chaotically sensitive: epsilon perturbations
                              (pixel RNG stream, u8/u16 frame quantization)
                              move a single run across 3.5-6.9 cm (measured
                              A/B matrix, RESULTS.md), so the gate statistic
                              is the MEDIAN over the default-seed record and
                              the seed-swept records (tracked_s0/s1/s2); a
                              real 2x regression moves the whole family.
  * gt-camera 150-frame tour: acc 0.86 cm        -> gate 1.5 cm
                              depth-L1 0.19 cm   -> gate 0.5 cm
                              completion 0.83 cm -> gate 1.5 cm
  * iMAP* tour:               acc 6.7 cm         -> gate 10 cm
                              depth-L1 3.9 cm    -> gate 6 cm
    (QUALITY.json 'imap' IS the keyframe_every=5 default; the sweep
    variants are imap_kf10/25/50 — kf25 is the measured optimum.)
"""

import json
import os

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
QUALITY = os.path.join(ROOT, "QUALITY.json")

GATES = {
    "gt_tour": {"accuracy_cm": ("<=", 1.5),
                "completion_cm": ("<=", 1.5),
                "depth_l1_cm": ("<=", 0.5),
                "completion_ratio_pct": (">=", 98.0)},
    "imap": {"accuracy_cm": ("<=", 10.0),
             "depth_l1_cm": ("<=", 6.0)},
    # the measured-best iMAP* operating point on the tour (see RESULTS.md
    # 3b): keyframe_every=25 balances rehearsal span vs anchor density
    "imap_kf25": {"accuracy_cm": ("<=", 7.0),
                  "depth_l1_cm": ("<=", 5.0)},
    # tracked FULL-COVERAGE tour (RESULTS.md 2b): 750 frames, full 2pi
    # orbit at 0.48 deg/frame, BA on, hash texture.  The achieved 27.1 cm
    # ATE is the sqrt(N)-integrated per-frame tracking noise of the
    # 30-frame protocol (5.9 cm median x sqrt(750/30) = 29.5 cm), NOT a
    # divergence — the gate pins that random-walk regime; a tracker
    # regression that turns drift into divergence (the 100-322 cm failures
    # the texture/BA ladder fixed) trips it with huge margin.
    "tracked_tour": {"ate_rmse_cm": ("<=", 40.0),
                     "completion_ratio_pct": (">=", 25.0),
                     "depth_l1_cm": ("<=", 3.0)},
    # iMAP* with REAL tracking on the 30-frame synthetic sweep (VERDICT
    # r4 #5): achieved ATE 0.50 / 0.53 / 0.48 cm (default / s0 / s1 pixel
    # seeds) — a far tighter family than NICE's 3.7-6.9 cm, because the
    # single-MLP map renders SMOOTH depth, giving the renderer-tracker a
    # wide convex basin where NICE's grid interpolation adds cell-scale
    # texture to the loss surface (analysis: RESULTS.md 3c).  Gate at
    # 5 cm: 10x the seed family, still below the NICE tracked median, so
    # a regression to divergence trips it by 20x+.  Recon columns are NOT
    # gated — short-sweep coverage artifacts (frustum shells of
    # unobserved space, RESULTS.md §2 note).
    "imap_tracked": {"ate_rmse_cm": ("<=", 5.0),
                     "depth_l1_cm": ("<=", 3.0)},
    "imap_tracked_s0": {"ate_rmse_cm": ("<=", 5.0)},
    "imap_tracked_s1": {"ate_rmse_cm": ("<=", 5.0)},
}


def _book():
    if not os.path.exists(QUALITY):
        pytest.skip("QUALITY.json not recorded yet (run tools.selfcheck "
                    "--record QUALITY.json on the TPU)")
    with open(QUALITY) as f:
        return json.load(f)


@pytest.mark.parametrize("kind", sorted(GATES))
def test_quality_floor(kind):
    book = _book()
    if kind not in book:
        pytest.skip(f"'{kind}' not recorded in QUALITY.json")
    rec = book[kind]
    for metric, (op, bound) in GATES[kind].items():
        val = rec.get(metric)
        assert val is not None, f"{kind}: {metric} missing/NaN in record"
        if op == "<=":
            assert val <= bound, (
                f"{kind}: {metric}={val} above the {bound} gate")
        else:
            assert val >= bound, (
                f"{kind}: {metric}={val} below the {bound} gate")


def test_tracked_ate_family():
    """Median-over-seeds tracked ATE <= 6.5 cm; every individual draw
    <= 9.5 cm.  The single-draw statistic is too noisy to gate (see module
    docstring); the family median is stable and a genuine 2x tracking
    regression trips both bounds."""
    book = _book()
    vals = [rec["ate_rmse_cm"] for kind, rec in sorted(book.items())
            if kind == "tracked" or kind.startswith("tracked_s")]
    if not vals:
        pytest.skip("no tracked records in QUALITY.json")
    vals.sort()
    median = vals[len(vals) // 2] if len(vals) % 2 else (
        0.5 * (vals[len(vals) // 2 - 1] + vals[len(vals) // 2]))
    assert median <= 6.5, f"tracked ATE family median {median} > 6.5 cm gate"
    assert vals[-1] <= 9.5, f"tracked ATE worst draw {vals[-1]} > 9.5 cm gate"


def test_pretrain_beats_scratch_on_tour():
    """The self-pretrained decoder priors must help (or at least not hurt)
    full-tour quality vs scratch init (VERDICT r2 next #6)."""
    book = _book()
    if "gt_tour" not in book or "gt_tour_scratch" not in book:
        pytest.skip("pretrained-vs-scratch tour pair not recorded")
    pre, scr = book["gt_tour"], book["gt_tour_scratch"]
    assert pre["accuracy_cm"] <= scr["accuracy_cm"] * 1.15, (
        "pretrained decoders made tour accuracy >15% worse than scratch")


def test_tracking_envelope_cf_extends_range():
    """The opt-in coarse-to-fine LR schedule must hold tracking together
    at a per-frame motion where it measurably beats the default budget
    (VERDICT r2 next #5)."""
    book = _book()
    if "envelope" not in book:
        pytest.skip("tracking envelope not recorded")
    rows = book["envelope"]["rows"]
    by = {}
    for r in rows:
        by.setdefault(r["mode"], {})[r["deg_per_frame"]] = r["ate_rmse_cm"]
    if "cf" not in by:
        pytest.skip("cf mode not swept")
    # at every motion level where the default diverges (>20 cm ATE) but cf
    # holds (<10 cm), cf must keep doing so; and cf must extend the
    # <10 cm operating envelope to at least as fast a motion as default
    def max_ok(curve, bound=10.0):
        ok = [d for d, a in curve.items() if a < bound]
        return max(ok) if ok else 0.0
    assert max_ok(by["cf"]) >= max_ok(by["default"]), (
        f"cf envelope {max_ok(by['cf'])} deg/frame shrank below default "
        f"{max_ok(by['default'])}")
