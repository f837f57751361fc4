"""Deterministic synthetic sources + parquet/staged-table IO."""
