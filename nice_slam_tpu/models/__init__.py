"""Scene representation: hierarchical feature grids + MLP decoders."""
