"""Render layer: cameras, ray generation, z-sampling, volume integration."""
