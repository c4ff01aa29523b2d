"""Multi-chip scaling: device meshes, sharded mapping steps, collectives."""
