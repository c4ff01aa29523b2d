"""nice_slam_tpu — a TPU-native (JAX/XLA/Pallas) dense RGB-D neural-implicit SLAM framework.

Re-designed from scratch with the capabilities of NICE-SLAM (CVPR 2022,
reference implementation studied at /root/reference): hierarchical feature
grids + MLP decoders, NeRF-style depth-guided volume rendering, a gradient
-descent camera tracker and a staged map optimizer, meshing, checkpointing
and evaluation tooling.

Architecture differences from the reference (deliberate, TPU-first):
  * Functional state: the scene map is an immutable pytree (``MapState``);
    tracker snapshots are free value passes instead of deepcopies
    (reference: src/Tracker.py:130-142).
  * Whole optimization loops are jitted and ``lax.scan``-ned; all shapes are
    static, variable-size ray filters become weight masks.
  * The hot op — trilinear feature-grid interpolation fused with the tiny
    decoder MLPs — runs as batched XLA gathers + MXU matmuls; its gradient
    scatter uses a custom cell-block formulation (ops/interp.py, PERF.md).
  * Multi-chip scaling uses ``jax.sharding`` ray-batch data parallelism over
    an ICI mesh (reference has no multi-device story at all).
  * Host-side tooling (marching cubes, mesh component filtering) is native
    C++ (csrc/) because the reference's third-party deps (skimage, trimesh,
    open3d) are replaced, not wrapped.
"""

__version__ = "0.1.0"
