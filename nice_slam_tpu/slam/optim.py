"""Group-wise masked Adam matching torch's staged param-group semantics.

The reference mapper builds one torch Adam over 5-6 param groups and
rewrites each group's LR every iteration according to the optimization
stage (reference: src/Mapper.py:365-389,403-419).  Torch semantics this
module reproduces exactly:

  * per-parameter moment state with bias correction driven by a
    per-parameter step count that advances only when the parameter
    receives a gradient (inactive groups at a stage keep their counts);
  * a fresh optimizer per ``optimize_map`` call (moments reset,
    src/Mapper.py:365);
  * frustum feature selection = optimizing only a masked subset of grid
    features (src/Mapper.py:314-333): with a fresh optimizer and gradient
    masking, full-tensor Adam updates are bitwise-equal to the reference's
    compacted-vector updates, because masked-out entries have identically
    zero gradients, hence zero moments, hence zero update.

Group activity per stage is STATIC (which decoders/grids participate in a
stage's forward graph is known at trace time), so each stage compiles its
own update with no traced branching.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


class GroupAdamState(NamedTuple):
    mu: Any      # like-params pytree of first moments
    nu: Any      # like-params pytree of second moments
    steps: Any   # dict group_name -> int32 step count


def init_group_adam(params: Dict[str, Any]) -> GroupAdamState:
    """``params`` is a dict of named groups (each an arbitrary pytree)."""
    zeros = jax.tree.map(jnp.zeros_like, params)
    steps = {k: jnp.zeros((), jnp.int32) for k in params}
    return GroupAdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params), steps=steps)


def group_adam_update(
    params: Dict[str, Any],
    grads: Dict[str, Any],
    state: GroupAdamState,
    lrs: Dict[str, jnp.ndarray],
    active: Dict[str, bool],
) -> tuple[Dict[str, Any], GroupAdamState]:
    """One Adam step over named groups.

    Args:
        lrs: per-group learning rate (traced scalars are fine).
        active: per-group STATIC participation flag for this stage; inactive
            groups are passed through untouched (moments, counts, values).
    """
    new_params: Dict[str, Any] = {}
    new_mu: Dict[str, Any] = {}
    new_nu: Dict[str, Any] = {}
    new_steps: Dict[str, Any] = {}
    for name, p in params.items():
        if not active.get(name, False):
            new_params[name] = p
            new_mu[name] = state.mu[name]
            new_nu[name] = state.nu[name]
            new_steps[name] = state.steps[name]
            continue
        g = grads[name]
        step = state.steps[name] + 1
        lr = lrs[name]
        bc1 = 1.0 - ADAM_B1 ** step.astype(jnp.float32)
        bc2 = 1.0 - ADAM_B2 ** step.astype(jnp.float32)

        def upd(pl, gl, ml, nl):
            m = ADAM_B1 * ml + (1 - ADAM_B1) * gl
            n = ADAM_B2 * nl + (1 - ADAM_B2) * gl * gl
            update = (m / bc1) / (jnp.sqrt(n / bc2) + ADAM_EPS)
            return pl - lr * update, m, n

        out = jax.tree.map(upd, p, g, state.mu[name], state.nu[name])
        # unzip the (param, mu, nu) triples
        leaves, treedef = jax.tree.flatten(out, is_leaf=lambda x: isinstance(x, tuple))
        new_params[name] = jax.tree.unflatten(treedef, [l[0] for l in leaves])
        new_mu[name] = jax.tree.unflatten(treedef, [l[1] for l in leaves])
        new_nu[name] = jax.tree.unflatten(treedef, [l[2] for l in leaves])
        new_steps[name] = step
    return new_params, GroupAdamState(mu=new_mu, nu=new_nu, steps=new_steps)


def plain_adam_init(params):
    """Single-group Adam for the tracker's 7-dof pose tensor."""
    return init_group_adam({"p": params})


def plain_adam_update(params, grads, state, lr):
    new_p, new_s = group_adam_update(
        {"p": params}, {"p": grads}, state, {"p": lr}, {"p": True}
    )
    return new_p["p"], new_s
