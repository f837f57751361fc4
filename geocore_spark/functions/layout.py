"""Z-order (Morton) data layout — storage clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet keeps min/max statistics per row group and per file, and engines
(Spark's parquet filter pushdown included) skip units whose stats exclude
the predicate. Those stats only help if rows that are CLOSE in the query
space are close in the file — which a single-column sort gives for one
dimension only. Interleaving the bits of two dimension keys (the Z-order /
Morton curve, public technique — e.g. "Z-ordering" in Delta/Iceberg
OPTIMIZE, originally Morton 1966) makes one sortable BIGINT whose order is
local in BOTH dimensions, so a lat/lon box (or cell x time slab) predicate
prunes most files instead of one dimension's worth.

Everything here is a pure Column expression — the classic five-step
"part1by1" mask-shift spread, bitwiseOR/shiftleft over BIGINT, fully
inside whole-stage codegen; no UDF, no shuffle of its own. The write-side
helper pairs it with ``repartitionByRange`` (range partitioner on the
z-value = contiguous curve segments per file) + ``sortWithinPartitions``
(row-group locality inside each file).

The reference keys layers on H3 cells but stores them unordered in the
warehouse (woodgilber/GeoCore modeling/datasets/base.py:74-76 CTAS with no
CLUSTER BY); this operator is the layout step a 100 TB deployment of the
same data model needs.

Exact-replay contract: the spread is integer bit arithmetic, so the DuckDB
twin (:func:`zorder_sql`) is value-identical — no float appears after the
(already boundary-exact) cell quantizers from :mod:`functions.tiling`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl

# part1by1 spread: after masking to 32 bits, each step doubles the gap
# between occupied bit positions; masks are the standard Morton constants.
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)
_MAX_BITS = 31  # interleaved code must stay in the positive BIGINT range


def _part1by1(c: Column) -> Column:
    c = c.bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton2(x: Column, y: Column, bits: int = 20) -> Column:
    """Interleave the low ``bits`` bits of two non-negative BIGINT columns
    into one Morton code (x in even positions, y in odd). NULL if either
    input is NULL (bitwise ops propagate NULL). ``bits`` <= 31 keeps the
    code positive; out-of-range input bits are masked off, so callers
    quantize first (a clamp, not an error — layout keys may never abort a
    write job)."""
    if not 1 <= bits <= _MAX_BITS:
        raise ValueError(f"bits must be in [1, {_MAX_BITS}], got {bits}")
    mask_in = F.lit((1 << bits) - 1)
    px = _part1by1(x.cast("long").bitwiseAND(mask_in))
    py = _part1by1(y.cast("long").bitwiseAND(mask_in))
    return px.bitwiseOR(F.shiftleft(py, 1))


def zorder_value(lat: Column, lon: Column, res: int = tl.DEFAULT_RES) -> Column:
    """Morton code of the geocell (ix, iy) indices at resolution ``res`` —
    the boundary-exact quantizers from :mod:`functions.tiling` (NULL/NaN
    coordinates -> NULL code, same guard as ``latlng_to_cell``). ix has
    ``res + 1`` bits, iy has ``res``; both interleave at ``res + 1`` bits
    so the code fits 2*(res+1) <= 54 bits at the max supported res."""
    if res + 1 > _MAX_BITS:
        raise ValueError(f"res must be <= {_MAX_BITS - 1}, got {res}")
    return morton2(tl.cell_ix(lon, res), tl.cell_iy(lat, res), bits=res + 1)


def zorder_layout(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = tl.DEFAULT_RES,
    n_files: int = 200,
    z_col: str = "zval",
) -> DataFrame:
    """Cluster a frame along the Z-curve for writing: adds ``z_col``,
    range-partitions into ``n_files`` contiguous curve segments and sorts
    rows within each — every output file covers one compact curve window,
    so its parquet min/max stats exclude most box predicates in BOTH
    dimensions. Write with ``.write.parquet(...)``; keep ``z_col`` in the
    table (8 bytes/row) so later compactions re-cluster without
    recomputing, or drop it after the sort.

    NULL-coordinate rows carry a NULL code; range partitioning groups
    them into the first partition(s) rather than scattering them."""
    z = zorder_value(F.col(lat), F.col(lon), res)
    out = df.withColumn(z_col, z)
    return out.repartitionByRange(n_files, F.col(z_col)).sortWithinPartitions(z_col)


# ---------------------------------------------------------------------------
# DuckDB / ANSI-SQL twin (value-identical: pure integer bit arithmetic)
# ---------------------------------------------------------------------------


def part1by1_sql(x: str, out: str, steps: list[str]) -> None:
    """Append to ``steps`` the per-step column definitions spreading BIGINT
    expression ``x`` into ``out`` (linear chain — nesting the expression
    would blow up 2^5-fold)."""
    cur = f"(({x}) & 4294967295)"
    for i, (shift, mask) in enumerate(_SPREAD):
        name = f"{out}_{i}" if i < len(_SPREAD) - 1 else out
        steps.append(f"(({cur} | ({cur} << {shift})) & {mask}) AS {name}")
        cur = name


def zorder_sql(ix_sql: str, iy_sql: str, bits: int, from_clause: str,
               carry: list[str], z_name: str = "zval") -> str:
    """SELECT replaying :func:`morton2` over quantizer SQL expressions via
    a chain of nested subselects (one spread step per level, both axes).
    ``carry`` columns pass through untouched; NULL index -> NULL code."""
    mask_in = (1 << bits) - 1
    inner_cols = list(carry) + [
        f"(({ix_sql}) & {mask_in}) AS __zx",
        f"(({iy_sql}) & {mask_in}) AS __zy",
    ]
    sql = f"SELECT {', '.join(inner_cols)} FROM {from_clause}"
    xs: list[str] = []
    ys: list[str] = []
    part1by1_sql("__zx", "__px", xs)
    part1by1_sql("__zy", "__py", ys)
    for xstep, ystep in zip(xs, ys):
        sql = f"SELECT {', '.join(carry)}, {xstep}, {ystep} FROM ({sql})"
    return (
        f"SELECT {', '.join(carry)}, (__px | (__py << 1)) AS {z_name} "
        f"FROM ({sql})"
    )
