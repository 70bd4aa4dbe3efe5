"""Core compute ops: norms, splines, fixed-size linalg, Pallas kernels."""
