"""Scalar kernels: tiling, S2, geodesy, text extraction, hashing."""
