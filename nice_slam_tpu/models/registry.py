"""Model registry: config -> scene model.

The reference routes model construction through a method registry
(src/config.py:5-7,63-79 -> src/conv_onet/config.py:4-33); this framework
has a single scene-model family so the registry is a thin functional
dispatch kept for CLI/API parity.
"""

from __future__ import annotations

from typing import Any, Dict

from nice_slam_tpu.models.scene import build_scene


def get_model(cfg: Dict[str, Any], nice: bool = True, seed: int = 0):
    """Returns (SceneSpec, SceneState) for the configured model family.

    ``nice=True`` -> hierarchical-grid NICE stack; ``nice=False`` -> iMAP*
    single-MLP mode (reference src/conv_onet/config.py:23-32).
    """
    return build_scene(cfg, nice=nice, seed=seed)
