"""Host-side utilities: GeoTIFF I/O, checkpointing, numerics guards,
visualization."""
