"""Offline CLI tools: evaluation, mesh culling, data prep, config gen."""
