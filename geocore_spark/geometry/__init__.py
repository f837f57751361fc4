"""Minimal vector-geometry kernels: WKB polygon codec, vectorized PIP."""
