"""Physical-plan regression guards.

Locks the optimizer properties the engine's scale story depends on:
filter pushdown into parquet scans, column pruning, broadcast joins for
dim tables, and WindowGroupLimit (partial top-k before the shuffle) in
the kNN plan. A change that silently loses one of these would still pass
value tests but regress at scale — these tests fail it early.
"""

import contextlib
import io

import __spark_entry__ as em


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_filter_pushed_to_scan(spark, sf_dir):
    p = _formatted(em.q_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_pricing_column_pruning(spark, sf_dir):
    p = _formatted(em.q_pricing_summary(spark, sf_dir))
    schema_line = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert "l_orderkey" not in schema_line  # unused columns never read
    assert "l_quantity" in schema_line


def test_nway_join_broadcasts_dims(spark, sf_dir):
    p = _formatted(em.q_nway_left_join(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2  # nation + region at minimum
    assert "CartesianProduct" not in p


def test_tile_encode_prunes_to_id_column(spark, sf_dir):
    p = _formatted(em.q_tile_encode(spark, sf_dir))
    schema_line = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert "event_id" in schema_line
    assert "props" not in schema_line and "value" not in schema_line


def test_knn_uses_partial_topk_pushdown(spark, sf_dir):
    p = _formatted(em.q_knn(spark, sf_dir))
    assert "WindowGroupLimit" in p  # rank<=k applied before the final sort
    assert "CartesianProduct" not in p


def test_distance_join_no_cartesian(spark, sf_dir):
    p = _formatted(em.q_distance_join(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p


def test_spatial_assembly_broadcasts_test_flag(spark, sf_dir):
    p = _formatted(em.q_spatial_assembly(spark, sf_dir))
    assert "BroadcastHashJoin" in p
