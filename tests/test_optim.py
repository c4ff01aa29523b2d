"""Group-masked Adam: step-for-step parity with torch.optim.Adam.

The mapper's convergence depends on reproducing torch's param-group
semantics exactly (fresh moments per call, per-param step counts, LR
rewritten per stage) — see slam/optim.py.
"""

import jax.numpy as jnp
import numpy as np
import torch

from nice_slam_tpu.slam.optim import (
    group_adam_update,
    init_group_adam,
    plain_adam_init,
    plain_adam_update,
)


def test_matches_torch_adam_quadratic():
    # optimize f(x) = sum((x - t)^2) with both implementations
    t_np = np.array([1.0, -2.0, 3.0], np.float32)
    x_torch = torch.zeros(3, requires_grad=True)
    opt = torch.optim.Adam([x_torch], lr=0.1)
    x_jax = jnp.zeros(3)
    state = plain_adam_init(x_jax)

    for _ in range(25):
        opt.zero_grad()
        loss = ((x_torch - torch.from_numpy(t_np)) ** 2).sum()
        loss.backward()
        opt.step()

        g = 2 * (x_jax - jnp.asarray(t_np))
        x_jax, state = plain_adam_update(x_jax, g, state, 0.1)

    np.testing.assert_allclose(
        np.asarray(x_jax), x_torch.detach().numpy(), atol=5e-4
    )


def test_group_staging_matches_torch_param_groups():
    # Two groups with different LRs; group B inactive (grad None) for the
    # first 10 steps, then active — exactly torch's behavior when a param
    # joins the graph at a later stage.
    a_t = torch.zeros(4, requires_grad=True)
    b_t = torch.zeros(4, requires_grad=True)
    opt = torch.optim.Adam([{"params": [a_t], "lr": 0.0},
                            {"params": [b_t], "lr": 0.0}])

    groups = {"a": jnp.zeros(4), "b": jnp.zeros(4)}
    state = init_group_adam(groups)

    target = torch.arange(4, dtype=torch.float32) + 1

    for i in range(20):
        stage_b_active = i >= 10
        opt.param_groups[0]["lr"] = 0.05
        opt.param_groups[1]["lr"] = 0.01 if stage_b_active else 0.0

        opt.zero_grad()
        loss = ((a_t - target) ** 2).sum()
        if stage_b_active:
            loss = loss + ((b_t - 2 * target) ** 2).sum()
        loss.backward()
        opt.step()

        grads = {"a": 2 * (groups["a"] - jnp.asarray(target.numpy()))}
        lrs = {"a": 0.05, "b": 0.01}
        active = {"a": True, "b": stage_b_active}
        if stage_b_active:
            grads["b"] = 2 * (groups["b"] - 2 * jnp.asarray(target.numpy()))
        else:
            grads["b"] = jnp.zeros(4)
        groups, state = group_adam_update(groups, grads, state, lrs, active)

    np.testing.assert_allclose(np.asarray(groups["a"]), a_t.detach().numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(groups["b"]), b_t.detach().numpy(),
                               atol=5e-4)


def test_masked_grad_equals_compacted_subset():
    # Frustum selection: optimizing a masked subset with its own Adam is
    # equivalent to full-tensor Adam with masked (zeroed) grads.
    rng = np.random.default_rng(0)
    full = jnp.asarray(rng.normal(size=(10,)).astype(np.float32))
    mask = jnp.asarray(rng.random(10) > 0.5)

    sub_t = torch.from_numpy(np.asarray(full[mask])).clone().requires_grad_(True)
    opt = torch.optim.Adam([sub_t], lr=0.1)

    groups = {"g": full}
    state = init_group_adam(groups)

    for i in range(15):
        opt.zero_grad()
        (sub_t ** 2).sum().backward()
        opt.step()

        g = 2 * groups["g"] * mask  # masked gradient
        groups, state = group_adam_update(
            groups, {"g": g}, state, {"g": 0.1}, {"g": True}
        )

    np.testing.assert_allclose(
        np.asarray(groups["g"][mask]), sub_t.detach().numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(groups["g"][~mask]), np.asarray(full[~mask]), atol=0
    )


def test_separate_lr_vector():
    # per-component LR (tracker seperate_LR): quat at 0.2x
    x = jnp.ones(7)
    state = plain_adam_init(x)
    lr = jnp.array([0.2] * 4 + [1.0] * 3) * 0.1
    g = jnp.ones(7)
    x2, _ = plain_adam_update(x, g, state, lr)
    step = np.asarray(x - x2)
    np.testing.assert_allclose(step[:4], 0.02, rtol=1e-4)
    np.testing.assert_allclose(step[4:], 0.1, rtol=1e-4)
