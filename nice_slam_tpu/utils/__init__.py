"""Host-side subsystems: datasets, logging, meshing, visualization."""
