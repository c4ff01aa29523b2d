"""Tracking-loss landscape probe: sweep the loss along single pose DOFs.

For each requested frame, evaluates the TRACKING loss (the exact
``slam.tracker.tracking_loss`` the per-frame optimizer descends,
reference ``src/Tracker.py:71-128``) on a frozen map at the GT pose and
at offsets along three camera-frame DOFs:

  * ``lateral-x`` — translation along the camera x axis (meters)
  * ``vertical-y`` — translation along the camera y axis (meters)
  * ``yaw`` — rotation about the camera y axis (radians = 2.5 * delta)

If the minimum over the sweep is NOT at the zero offset, the tracker's
fixed point is biased away from the true pose on this map — per-frame
descent will converge off-GT no matter how many iterations it gets.
This separates the two failure modes of a drifting tracked run:

  * biased minima on a GT-consistent map  -> the loss/render is at fault
  * clean minima but a degraded map       -> map feedback (forgetting,
    keyframe-window starvation) is at fault

Round-5 finding (RESULTS.md 2b): on a gt-camera 150-frame orbit map the
minima are clean (within +/-1 cm) at recently-mapped frames but the
EARLY orbit region renders at ~10x the loss with minima biased >=4 cm —
the keyframe window had moved on and the map forgot it ('overlap'
selection never re-picks frames with no overlap against the current
view).  The ``keyframe_selection_method: global`` rehearsal mode is the
reference's own countermeasure (``src/Mapper.py:78-80``).

Usage (after a selfcheck/run.py run left checkpoints in OUT):

  python -m nice_slam_tpu.tools.loss_landscape --out OUT \
      --frames 5 30 60 --n_frames 150 --orbit_radians 1.257 \
      --texture hash --scene furnished --pixels 2000
"""

import argparse
import json
import os

import numpy as np

from nice_slam_tpu.utils.cache import setup_cache

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def probe_frame(slam, loss_jit, key, i, deltas):
    """Sweep the tracking loss around frame ``i``'s GT pose.

    Returns {dof: {"losses": [...], "argmin_delta": d, "biased": bool}}.
    """
    import jax.numpy as jnp

    from nice_slam_tpu.slam.tracker import tensor_from_c2w

    _, color, depth, gt_c2w = slam.frame_reader[i]
    gt_c2w = np.asarray(gt_c2w)
    color_j = jnp.asarray(color, jnp.float32)
    depth_j = jnp.asarray(depth, jnp.float32)
    xaxis, yaxis = gt_c2w[:3, 0], gt_c2w[:3, 1]

    def at(c2w):
        cam = tensor_from_c2w(c2w[:3])
        return float(loss_jit(slam.spec, slam.state, jnp.asarray(cam),
                              color_j, depth_j, key, slam.tcfg, slam.rcfg))

    out = {}
    for name, axis in (("lateral-x", xaxis), ("vertical-y", yaxis)):
        vals = []
        for d in deltas:
            c = gt_c2w.copy()
            c[:3, 3] = c[:3, 3] + d * axis
            vals.append(at(c))
        out[name] = vals
    vals = []
    for d in deltas:
        ang = d * 2.5  # 1 cm of sweep step = 1.43 deg of yaw
        c = gt_c2w.copy()
        K = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        c[:3, :3] = c[:3, :3] @ K
        vals.append(at(c))
    out["yaw"] = vals
    rows = {}
    z = int(np.argmin(np.abs(deltas)))
    for name, vals in out.items():
        k = int(np.argmin(vals))
        rows[name] = {"losses": [round(v, 1) for v in vals],
                      "argmin_delta": float(deltas[k]),
                      "base": round(vals[z], 1),
                      "biased": k != z}
    return rows


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, required=True,
                        help="output dir of a previous run (resumed from "
                             "its latest checkpoint); also used as "
                             "cfg data.output")
    parser.add_argument("--frames", type=int, nargs="+",
                        default=[5, 30, 60])
    parser.add_argument("--deltas_cm", type=float, nargs="+",
                        default=[-4, -2, -1, 0, 1, 2, 4])
    parser.add_argument("--pixels", type=int, default=2000)
    parser.add_argument("--n_frames", type=int, default=150)
    parser.add_argument("--orbit_radians", type=float, default=None)
    parser.add_argument("--texture", type=str, default=None,
                        choices=["checker", "hash"])
    parser.add_argument("--scene", type=str, default=None,
                        choices=["box", "furnished"])
    parser.add_argument("--imap", action="store_true")
    parser.add_argument("--no_resume", action="store_true",
                        help="probe the FRESH (untrained) map — smoke/"
                             "plumbing mode, the landscape itself is "
                             "meaningless")
    parser.add_argument("--record", type=str, default=None,
                        help="write the per-frame sweep rows as JSON")
    args = parser.parse_args()

    setup_cache(_HERE)

    import jax

    from nice_slam_tpu.config import load_config
    from nice_slam_tpu.slam.slam import NiceSLAM
    from nice_slam_tpu.slam.tracker import tracking_loss

    base = "imap.yaml" if args.imap else "nice_slam.yaml"
    cfg = load_config(os.path.join(_HERE, "configs", "Synthetic",
                                   "box.yaml"),
                      os.path.join(_HERE, "configs", base))
    cfg["coarse"] = False
    cfg["verbose"] = False
    cfg["data"]["n_frames"] = args.n_frames
    if args.orbit_radians is not None:
        cfg["data"]["orbit_radians"] = args.orbit_radians
    cfg["data"]["output"] = args.out
    cfg["tracking"]["pixels"] = args.pixels
    cfg["mapping"]["ckpt_freq"] = 10 ** 6
    if args.texture is not None:
        cfg["data"]["texture"] = args.texture
    if args.scene is not None:
        cfg["data"]["scene"] = args.scene

    ns = argparse.Namespace(nice=not args.imap, input_folder=None,
                            output=None)
    slam = NiceSLAM(cfg, ns)
    if not args.no_resume:
        slam.resume()

    loss_jit = jax.jit(tracking_loss, static_argnums=(0, 6, 7))
    key = jax.random.PRNGKey(0)  # same pixels at every offset
    deltas = np.asarray(args.deltas_cm, np.float64) / 100.0

    book = {}
    for i in args.frames:
        rows = probe_frame(slam, loss_jit, key, i, deltas)
        book[str(i)] = rows
        print(f"frame {i} (deltas cm: {np.asarray(args.deltas_cm)}):")
        for name, r in rows.items():
            base = r["base"]
            rel = " ".join(f"{v - base:+9.1f}" for v in r["losses"])
            mark = ("OK" if not r["biased"]
                    else f"BIASED-MIN@{r['argmin_delta'] * 100:g}cm")
            print(f"  {name:11s} {rel}   [{mark}] base={base}")
    if args.record:
        with open(args.record, "w") as f:
            json.dump(book, f, indent=1)
        print(f"recorded -> {args.record}")


if __name__ == "__main__":
    main()
