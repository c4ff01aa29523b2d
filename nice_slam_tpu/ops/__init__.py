"""Device-side compute ops: geometry, interpolation, volume rendering."""
