"""Crawl-frontier politeness scheduling + session-window rollup."""

import datetime as dt

from pyspark.sql import functions as F

from geocore_spark.streaming import frontier
from geocore_spark.streaming.ingest import session_cell_rollup

T0 = dt.datetime(2025, 3, 1, 12, 0, 0)


def _disc(spark, rows):
    return spark.createDataFrame(
        [(h, u, p, T0 + dt.timedelta(seconds=s)) for h, u, p, s in rows],
        "host string, url string, priority double, discovered_ts timestamp",
    )


def test_batch_frontier_spacing_and_priority(spark):
    rows = [
        ("a.com", "https://a.com/1", 1.0, 0),
        ("a.com", "https://a.com/2", 9.0, 0),
        ("a.com", "https://a.com/3", 5.0, 0),
        ("b.com", "https://b.com/1", 1.0, 0),
    ]
    out = frontier.crawl_frontier(_disc(spark, rows), delay_seconds=5.0)
    got = {r["url"]: r for r in out.collect()}
    # priority desc within host: /2 first, then /3, then /1, 5 s apart
    assert got["https://a.com/2"]["scheduled_ts"] == T0
    assert got["https://a.com/3"]["scheduled_ts"] == T0 + dt.timedelta(seconds=5)
    assert got["https://a.com/1"]["scheduled_ts"] == T0 + dt.timedelta(seconds=10)
    # other hosts are independent
    assert got["https://b.com/1"]["scheduled_ts"] == T0


def test_batch_frontier_late_discovery_restarts_chain(spark):
    rows = [
        ("a.com", "https://a.com/1", 2.0, 0),
        ("a.com", "https://a.com/2", 1.0, 100),  # discovered after backlog drains
    ]
    out = frontier.crawl_frontier(_disc(spark, rows), delay_seconds=5.0)
    got = {r["url"]: r["scheduled_ts"] for r in out.collect()}
    assert got["https://a.com/1"] == T0
    assert got["https://a.com/2"] == T0 + dt.timedelta(seconds=100)  # not T0+5


def test_host_of_expr(spark):
    df = spark.createDataFrame(
        [("https://host9.example/p/1",), ("http://x.org/",)], "url string"
    )
    got = [r["h"] for r in df.select(frontier.host_of(F.col("url")).alias("h")).collect()]
    assert got == ["host9.example", "x.org"]


def test_streaming_frontier_state_survives_restart(spark, tmp_path):
    landing, ckpt, out = (str(tmp_path / p) for p in ("in", "ckpt", "out"))
    _disc(
        spark,
        [("a.com", "https://a.com/1", 1.0, 0), ("a.com", "https://a.com/2", 0.5, 0)],
    ).write.parquet(landing + "/b1")

    def drain():
        stream = spark.readStream.schema(
            "host string, url string, priority double, discovered_ts timestamp"
        ).parquet(landing + "/b*")
        q = (
            frontier.crawl_frontier(stream, delay_seconds=5.0)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {r["url"]: r["scheduled_ts"] for r in spark.read.parquet(out).collect()}

    got1 = drain()
    assert got1["https://a.com/1"] == T0
    assert got1["https://a.com/2"] == T0 + dt.timedelta(seconds=5)

    # restart with a new batch for the same host: the politeness chain
    # must continue from the checkpointed state (next allowed = T0+10),
    # not restart at the new discovery time
    _disc(spark, [("a.com", "https://a.com/3", 1.0, 1)]).write.parquet(landing + "/b2")
    got2 = drain()
    assert got2["https://a.com/3"] == T0 + dt.timedelta(seconds=10)
    # earlier emissions are append-only: unchanged
    assert got2["https://a.com/1"] == T0


def test_session_rollup_stream_drain_matches_batch(spark, tmp_path):
    landing, ckpt, out = (str(tmp_path / p) for p in ("in", "ckpt", "out"))
    rows = []
    for cell, bursts in [("c1", [(0, 3), (7200, 2)]), ("c2", [(100, 4)])]:
        for start_s, n in bursts:
            rows += [
                (cell, T0 + dt.timedelta(seconds=start_s + 60 * i)) for i in range(n)
            ]
    df = spark.createDataFrame(rows, "cell string, warc_ts timestamp")
    df.write.parquet(landing + "/b1")

    batch = session_cell_rollup(df, gap="30 minutes").collect()

    def drain():
        stream = spark.readStream.schema("cell string, warc_ts timestamp").parquet(
            landing + "/b*"
        )
        q = (
            session_cell_rollup(stream, gap="30 minutes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    drain()
    # append mode emits a session only once the watermark passes its end;
    # a far-future sentinel row in a second drain advances the watermark
    # and flushes the real sessions (the standard drain-to-close pattern)
    spark.createDataFrame(
        [("zz", T0 + dt.timedelta(days=365))], "cell string, warc_ts timestamp"
    ).write.parquet(landing + "/b2")
    drain()
    streamed = [
        r for r in spark.read.parquet(out).collect() if r["cell"] != "zz"
    ]
    key = lambda r: (r["cell"], r["session_start"], r["session_end"], r["n_pages"])
    assert sorted(map(key, batch)) == sorted(map(key, streamed))
    # structure: c1 has two sessions (2 h apart > 30 min gap), c2 one
    per_cell = {}
    for r in batch:
        per_cell.setdefault(r["cell"], []).append(r["n_pages"])
    assert sorted(per_cell["c1"]) == [2, 3] and per_cell["c2"] == [4]


def test_batch_frontier_custom_host_col(spark):
    df = _disc(spark, [("a.com", "u1", 1.0, 0), ("a.com", "u2", 1.0, 0)]) \
        .withColumnRenamed("host", "domain")
    out = frontier.crawl_frontier(df, delay_seconds=5.0, host_col="domain")
    rows = out.orderBy("scheduled_ts").collect()
    assert [r["url"] for r in rows] == ["u1", "u2"]
    assert (rows[1]["scheduled_ts"] - rows[0]["scheduled_ts"]).total_seconds() == 5.0
    assert rows[0]["host"] == "a.com"  # OUT_SCHEMA names the key 'host'


class _FakeState:
    """Minimal GroupState stand-in for kernel-level unit tests."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def test_frontier_fn_accumulates_arrow_chunks():
    """A host group split across Arrow chunks must schedule as ONE
    ordered batch: a high-priority URL in chunk 2 goes first, not after
    everything in chunk 1 (chunk boundaries are an Arrow transport
    artifact, never semantics)."""
    import pandas as pd

    from geocore_spark.streaming.frontier import _frontier_fn

    def chunk(urls_prios):
        return pd.DataFrame(
            {
                "host": "h",
                "url": [u for u, _ in urls_prios],
                "priority": [p for _, p in urls_prios],
                "discovered_ts": pd.Timestamp("2025-03-01 12:00:00"),
            }
        )
    state = _FakeState()
    outs = list(
        _frontier_fn(5_000_000)(
            ("h",),
            iter([chunk([("u1", 1.0), ("u2", 1.0)]), chunk([("u9", 9.0)])]),
            state,
        )
    )
    assert len(outs) == 1  # one scheduled frame, not one per chunk
    order = outs[0].sort_values("scheduled_ts")["url"].tolist()
    assert order == ["u9", "u1", "u2"]
    assert state.exists  # politeness watermark advanced


def test_dedup_fn_vectorized_first_seen_semantics():
    """Kernel-level: in-chunk dupes keep the first, cross-batch dupes
    drop, state accumulates."""
    import pandas as pd

    from geocore_spark.streaming.stateful import _dedup_fn

    def chunk(urls):
        return pd.DataFrame(
            {"url": urls, "warc_ts": pd.Timestamp("2025-03-01 12:00:00")}
        )

    state = _FakeState()
    outs = list(_dedup_fn((3,), iter([chunk(["a", "b", "a"]), chunk(["b", "c"])]), state))
    assert [o["url"].tolist() for o in outs] == [["a", "b"], ["c"]]
    assert all((o["group_id"] == 3).all() for o in outs)
    # second invocation with carried state: everything seen already
    outs2 = list(_dedup_fn((3,), iter([chunk(["c", "a"])]), state))
    assert outs2 == []


def test_schedule_batch_matches_naive_reference():
    """The linearized running-max schedule must equal the obvious
    sequential loop on random inputs (property test, no Spark)."""
    import numpy as np
    import pandas as pd

    from geocore_spark.streaming.frontier import _schedule_batch

    rng = np.random.default_rng(11)
    for trial in range(50):
        n = int(rng.integers(1, 40))
        delay_us = int(rng.integers(1, 10_000_000))
        next0 = int(rng.integers(0, 5_000_000))
        disc = rng.integers(0, 50_000_000, size=n)
        pdf = pd.DataFrame(
            {
                "host": "h",
                "url": [f"u{i:03d}" for i in range(n)],
                "priority": rng.random(n).round(3),
                "discovered_ts": pd.to_datetime(disc, unit="us"),
            }
        )
        got, got_next = _schedule_batch(pdf.copy(), next0, delay_us)
        # naive reference
        ref = pdf.sort_values(
            ["priority", "url"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        nxt = next0
        sched = []
        for d in ref["discovered_ts"].astype("datetime64[us]").astype("int64"):
            s = max(nxt, int(d))
            sched.append(s)
            nxt = s + delay_us
        assert got_next == nxt, trial
        got_us = got["scheduled_ts"].astype("datetime64[us]").astype("int64").tolist()
        assert got_us == sched, trial
