"""Structured-Streaming surface for the tiling engine.

The reference is batch-only (SURVEY.md §2.10 — its single temporal op is a
1-hour tumbling resample, which batch ``F.window`` covers), so batch +
checkpoint snapshots remain the engine's primary mode. This module exists
for the continuous-ingest deployment shape: a WARC/pages stream tiled and
aggregated incrementally with event-time watermarks. Every transform here
is the *same* Column expression used in batch — streaming is a property of
the source/sink, not of the operators.
"""

from geocore_spark.streaming.ingest import tile_stream, windowed_cell_counts  # noqa: F401
