"""SLAM runtime (L5): tracker, mapper, schedulers, shared state."""
