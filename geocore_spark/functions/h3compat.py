"""Optional real-H3 backend behind the tiling index contract.

The engine's operators depend only on the index contract (encode,
centroid, parent/children, disk, cover — tiling.py docstring). When the
``h3`` package is importable (not in this sandbox), this module provides
the same surface over genuine H3 hexagons as Arrow-batched pandas UDFs,
matching the reference's Snowflake H3 functions
(H3_LATLNG_TO_CELL_STRING / H3_CELL_TO_POINT,
/root/reference/modeling/datasets/test_data.py:15,
/root/reference/modeling/datasets/build.py:185-187) cell-for-cell.

Import is gated: ``HAS_H3`` is False here and every function raises a
clear error, so callers can feature-detect (`if h3compat.HAS_H3: ...`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

try:
    import h3 as _h3  # noqa: F401

    HAS_H3 = True
except ImportError:
    _h3 = None
    HAS_H3 = False

DEFAULT_RES = 7  # north-rule H3 resolution (reference data uses res 8)


def _require():
    if not HAS_H3:
        raise ImportError(
            "the 'h3' package is not installed in this environment; use "
            "geocore_spark.functions.tiling (same contract, arithmetic grid)"
        )


def latlng_to_cell_udf(res: int = DEFAULT_RES):
    _require()

    @F.pandas_udf("string")
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            [_h3.latlng_to_cell(a, b, res) for a, b in zip(lat, lon)]
        )

    return _enc


def cell_to_latlng_udf():
    _require()

    @F.pandas_udf("struct<lat:double,lon:double>")
    def _ctr(cells: pd.Series) -> pd.DataFrame:
        pts = [_h3.cell_to_latlng(c) for c in cells]
        return pd.DataFrame({"lat": [p[0] for p in pts], "lon": [p[1] for p in pts]})

    return _ctr


def grid_disk_udf(k: int):
    _require()

    @F.pandas_udf("array<string>")
    def _disk(cells: pd.Series) -> pd.Series:
        return cells.map(lambda c: list(_h3.grid_disk(c, k)))

    return _disk


def cell_to_parent_udf(parent_res: int):
    _require()

    @F.pandas_udf("string")
    def _par(cells: pd.Series) -> pd.Series:
        return cells.map(lambda c: _h3.cell_to_parent(c, parent_res))

    return _par


def polygon_to_cells(ring_latlng: list[tuple[float, float]], res: int = DEFAULT_RES):
    """Driver-side polygon cover (h3.polygon_to_cells), for the PIP join's
    cover-table builder when hexagon covers are required."""
    _require()
    return list(_h3.polygon_to_cells(_h3.LatLngPoly(ring_latlng), res))
