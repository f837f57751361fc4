"""Dump formatted physical plans for the load-bearing queries -> PLANS.md.

Evidence artifact: the optimizer properties SCALE.md claims (pushdown,
pruning, broadcast selection, WindowGroupLimit, no cartesians) shown in
the actual `explain("formatted")` output, regenerated on demand.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as em
from geocore_spark.session import get_spark

SHOW = [
    ("pricing_summary", "filter pushdown + column pruning at the parquet scan"),
    ("nway_left_join", "broadcast-hash selection for every dim side"),
    ("knn", "WindowGroupLimit: per-partition top-k BEFORE the shuffle"),
    ("distance_join", "k-ring cover join — no cartesian product anywhere"),
    ("spatial_assembly", "flagship: agg + broadcast test-flag join"),
    ("skew_split_agg", "split/re-parent double aggregation"),
    (
        "dwithin_rewrite",
        "rewrite rule output: user's cartesian dwithin plan became a "
        "shuffled equi-join on cover cells (no CartesianProduct/BNLJ)",
    ),
    (
        "decontaminate",
        "benchmark grams broadcast (BroadcastHashJoin) — the corpus side "
        "never shuffles before the per-doc aggregation",
    ),
    (
        "decile_stats",
        "distributed exact ntile (operators/metrics.py): Exchange "
        "rangepartitioning + per-partition window — NO ntile() window "
        "function, no Exchange SinglePartition over the full input (the "
        "only global window left runs on the 10-row bucket table)",
    ),
]


def main():
    spark = get_spark("plans", master="local[4]", shuffle_partitions=4)
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — physical plans of the load-bearing queries",
        "",
        "Regenerate with `python tools/dump_plans.py`. What to look for is",
        "noted per query; assertions live in tests/test_plan_shapes.py.",
    ]
    for name, note in SHOW:
        df = em.queries()[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the tree + the scan details, drop the long column lists
        lines = [
            ln
            for ln in plan.splitlines()
            if ln.strip()
            and not ln.lstrip().startswith(("Output", "Input", "Arguments", "Functions", "Aggregate Attributes", "Keys", "Results"))
        ]
        out += ["", f"## {name}", "", f"*{note}*", "", "```", *lines[:60], "```"]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
