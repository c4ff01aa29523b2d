"""Self-pretraining recipe for the hierarchical decoders.

The reference consumes ConvONet decoder checkpoints (pretrained/coarse.pt,
pretrained/middle_fine.pt — reference src/NICE_SLAM.py:159-190) whose blobs
are distribution artifacts.  This tool reproduces the capability from
scratch: it meta-trains the coarse/middle/fine decoders into a geometric
occupancy prior over procedurally generated rooms, then exports them in the
exact torch naming scheme the loader expects (middle decoder under
'decoder.coarse_*', fine under 'decoder.fine_*' — the reference's
historical naming).

Protocol (episodic, MAML-flavored like occupancy-network pretraining):
  per scene: fresh feature grids (fast weights) + the shared decoders are
  jointly fit to analytic occupancy samples of a random room (walls +
  random boxes/spheres); only the decoder updates persist across scenes.
  After many scenes the decoders encode a reusable feature->occupancy
  decoding prior, which is what NICE-SLAM needs them for.

CLI: python -m nice_slam_tpu.tools.pretrain_decoders --out pretrained
     [--scenes 40] [--steps 300] [--samples 4096]
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models import decoders as D
from nice_slam_tpu.models import grids as G
from nice_slam_tpu.slam.optim import group_adam_update, init_group_adam


# ---------------------------------------------------------------------------
# Procedural occupancy worlds
# ---------------------------------------------------------------------------

def random_scene(rng: np.random.Generator):
    """A room with random inner boxes + spheres; returns params for the
    analytic occupancy function."""
    half = rng.uniform(1.5, 2.5, size=3)
    n_obj = rng.integers(2, 6)
    boxes = []
    spheres = []
    for _ in range(n_obj):
        c = rng.uniform(-0.6, 0.6, size=3) * half
        if rng.random() < 0.5:
            e = rng.uniform(0.2, 0.7, size=3)
            boxes.append((c, e))
        else:
            r = rng.uniform(0.2, 0.6)
            spheres.append((c, r))
    return half, boxes, spheres


def occupancy_of(points: np.ndarray, half, boxes, spheres) -> np.ndarray:
    """1 where occupied (outside room walls or inside an object)."""
    occ = np.any(np.abs(points) > half, axis=-1)
    for c, e in boxes:
        occ |= np.all(np.abs(points - c) < e, axis=-1)
    for c, r in spheres:
        occ |= np.linalg.norm(points - c, axis=-1) < r
    return occ.astype(np.float32)


# ---------------------------------------------------------------------------
# Episodic training
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("sub", "concat_middle"))
def _fit_step(dec_params, grid, middle_grid, mid_dec, adam, pts, occ_gt,
              bound, sub, concat_middle, lr_dec, lr_grid):
    """One joint decoder+grid Adam step on occupancy supervision."""

    def loss_fn(groups):
        grids = {"grid_" + sub.name: groups["grid"]}
        if concat_middle:
            grids["grid_middle"] = middle_grid
        if sub.no_xyz:
            logit = D.apply_mlp_no_xyz(groups["dec"], sub, pts, grids, bound)
        else:
            logit = D.apply_mlp(groups["dec"], sub, pts, grids, bound)
        prob = jax.nn.sigmoid(10.0 * logit)
        return jnp.mean((prob - occ_gt) ** 2)

    groups = {"dec": dec_params, "grid": grid}
    loss, grads = jax.value_and_grad(loss_fn)(groups)
    groups, adam = group_adam_update(
        groups, grads, adam,
        {"dec": lr_dec, "grid": lr_grid},
        {"dec": True, "grid": True},
    )
    return groups["dec"], groups["grid"], adam, loss


def pretrain(scenes: int, steps: int, samples: int, seed: int = 0,
             c_dim: int = 32, hidden: int = 32, verbose: bool = True):
    """Returns decoder params dict {coarse, middle, fine} with a learned
    occupancy prior."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)

    spec = D.NICESpec(c_dim=c_dim, hidden_size=hidden, coarse=True)
    subs = spec.sub_specs()
    dec = D.init_nice(key, spec)

    bound_np = np.array([[-3.0, 3.0]] * 3, np.float32)
    bound = jnp.asarray(bound_np)
    shapes = {
        "grid_coarse": (6, 6, 6),
        "grid_middle": (19, 19, 19),
        "grid_fine": (38, 38, 38),
    }

    for s in range(scenes):
        half, boxes, spheres = random_scene(rng)
        k_scene = jax.random.fold_in(key, s)
        grids = G.init_grids(k_scene, shapes, c_dim)

        pts_np = rng.uniform(bound_np[:, 0], bound_np[:, 1],
                             size=(steps, samples, 3)).astype(np.float32)
        occ_np = np.stack([
            occupancy_of(pts_np[i], half, boxes, spheres)
            for i in range(steps)
        ])
        pts_all = jnp.asarray(pts_np)
        occ_all = jnp.asarray(occ_np)

        losses = {}
        for name in ("coarse", "middle", "fine"):
            sub = subs[name]
            concat_middle = name == "fine"
            grid = grids["grid_" + name]
            adam = init_group_adam({"dec": dec[name], "grid": grid})
            d_params = dec[name]
            for i in range(steps):
                d_params, grid, adam, loss = _fit_step(
                    d_params, grid, grids["grid_middle"], dec["middle"],
                    adam, pts_all[i], occ_all[i], bound, sub, concat_middle,
                    5e-4, 5e-2,
                )
            dec[name] = d_params
            grids["grid_" + name] = grid
            losses[name] = float(loss)
        if verbose:
            print(f"scene {s + 1}/{scenes} losses "
                  + " ".join(f"{k}={v:.4f}" for k, v in losses.items()))
    return dec


def export_torch(dec, out_dir: str) -> None:
    """Write coarse.pt / middle_fine.pt with the reference's key scheme."""
    import torch

    from nice_slam_tpu.utils.logger import _mlp_to_state_dict

    os.makedirs(out_dir, exist_ok=True)

    coarse_sd = {
        "decoder." + k: v
        for k, v in _mlp_to_state_dict(dec["coarse"], "").items()
    }
    torch.save({"model": coarse_sd}, os.path.join(out_dir, "coarse.pt"))

    mf_sd = {}
    for k, v in _mlp_to_state_dict(dec["middle"], "").items():
        mf_sd["decoder.coarse_" + k] = v  # historical ConvONet naming
    for k, v in _mlp_to_state_dict(dec["fine"], "").items():
        mf_sd["decoder.fine_" + k] = v
    torch.save({"model": mf_sd}, os.path.join(out_dir, "middle_fine.pt"))
    print(f"wrote {out_dir}/coarse.pt and {out_dir}/middle_fine.pt")


def main() -> None:
    parser = argparse.ArgumentParser(
        description="Self-pretrain the hierarchical occupancy decoders."
    )
    parser.add_argument("--out", type=str, default="pretrained")
    parser.add_argument("--scenes", type=int, default=40)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--samples", type=int, default=4096)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    dec = pretrain(args.scenes, args.steps, args.samples, args.seed)
    export_torch(dec, args.out)


if __name__ == "__main__":
    main()
