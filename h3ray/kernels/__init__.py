"""Pure NumPy-vectorized H3 math kernels (no Ray imports)."""
