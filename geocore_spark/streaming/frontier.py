"""Crawl-frontier scheduling: per-host politeness via custom state.

A crawl pipeline's frontier assigns each discovered URL a fetch time such
that requests to one host stay at least ``delay`` apart (politeness),
while hosts proceed independently. That is a per-key running maximum —
state that must outlive a micro-batch, so it is an
``applyInPandasWithState`` operator (same pattern as
streaming/stateful.py's url dedup; no reference equivalent — the
reference is batch-only, SURVEY §2.10).

State per host: the next allowed fetch timestamp (one int64 — epoch
microseconds). Batch work is vectorized numpy (sort + cumulative
offsets); no per-row Python beyond pandas column ops.

Semantics (deterministic given the batch contents):
- within a batch, a host's URLs are ordered by (priority DESC, url ASC);
- ``scheduled_ts = max(state.next_allowed, discovered_ts) + i*delay``
  walking that order, where the max is re-evaluated per URL (a URL
  discovered later than the backlog end starts a fresh politeness chain);
- state advances to last scheduled + delay.

The host key shards state evenly at scale; hot hosts are bounded by one
int per host, not by URL count.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "host string, url string, priority double, "
    "discovered_ts timestamp, scheduled_ts timestamp"
)
STATE_SCHEMA = "next_allowed long"

_US = 1_000_000


def _schedule_batch(
    pdf: pd.DataFrame, next_allowed_us: int, delay_us: int
) -> tuple[pd.DataFrame, int]:
    """Assign scheduled_ts for one host's batch; returns (rows, new state)."""
    # a NULL discovered_ts becomes NaT = INT64_MIN after the int64 view:
    # disc_us - steps then WRAPS to ~+9.2e18 for any later row, the
    # running max propagates the poison to the whole batch, and either
    # to_datetime overflows (task failure kills the stream) or
    # next_allowed persists as ~infinity, deferring the host forever.
    # Undated discoveries are schedulable immediately: treat as epoch 0.
    pdf = pdf.sort_values(
        ["priority", "url"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    # normalize to int64 microseconds whatever resolution pandas hands us
    disc = pd.to_datetime(pdf["discovered_ts"]).astype("datetime64[us]")
    disc_us = np.where(
        disc.isna().to_numpy(),
        np.int64(0),
        disc.astype("int64").to_numpy(),
    ).astype(np.int64)
    # The chain s_i = max(s_{i-1}+delay, d_i) linearizes: with
    # e_j = d_j - j*delay,  s_i = i*delay + max(next0, max_{j<=i} e_j)
    # — a running max, fully vectorized (no per-row Python).
    n = len(pdf)
    steps = delay_us * np.arange(n, dtype=np.int64)
    run = np.maximum.accumulate(disc_us - steps)
    run = np.maximum(run, next_allowed_us)
    sched = steps + run
    out = pdf.copy()
    out["scheduled_ts"] = pd.to_datetime(sched, unit="us")
    return out, int(sched[-1] + delay_us)


def _frontier_fn(delay_us: int):
    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        nxt = state.get[0] if state.exists else 0
        # accumulate ALL Arrow chunks before scheduling: a host group
        # larger than arrow.maxRecordsPerBatch arrives as several chunks,
        # and per-chunk scheduling would order chunk 1 wholly before
        # chunk 2 — breaking the documented (priority DESC, url ASC)
        # order and making output depend on chunk boundaries
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            out, nxt = _schedule_batch(pd.concat(chunks, ignore_index=True), nxt, delay_us)
            yield out[["host", "url", "priority", "discovered_ts", "scheduled_ts"]]
        state.update((nxt,))

    return fn


def host_of(url):
    """Host component of a URL — pure Column expr.

    Delegates to :func:`geocore_spark.functions.urls.url_host`: the previous
    local regex required a lowercase scheme AND a trailing slash, so
    ``https://a.com`` (no path) or ``HTTP://...`` silently collapsed into a
    shared '' politeness group (ADVICE r1).
    """
    from geocore_spark.functions.urls import url_host

    return url_host(url)


def crawl_frontier(
    discovered: DataFrame,
    delay_seconds: float = 5.0,
    host_col: str = "host",
) -> DataFrame:
    """Politeness-scheduled fetch plan for a stream of discovered URLs.

    ``discovered`` needs columns (host, url, priority, discovered_ts);
    derive host with :func:`host_of` if absent. Works on a streaming
    DataFrame (state persists across micro-batches and restarts via the
    checkpoint) — and on a batch DataFrame via ``applyInPandas`` with the
    same kernel (zero state carried in, for oracle-style checks).
    """
    delay_us = int(delay_seconds * _US)
    if host_col != "host":
        # kernels and OUT_SCHEMA name the key 'host'; a custom host_col
        # must be renamed here or every task KeyErrors on pdf["host"].
        # A pre-existing 'host' column would silently duplicate the name
        # (ambiguous groupBy / two-column pdf['host']) — refuse loudly.
        if "host" in discovered.columns:
            raise ValueError(
                "crawl_frontier: frame already has a 'host' column; drop or "
                f"rename it before passing host_col={host_col!r}"
            )
        discovered = discovered.withColumnRenamed(host_col, "host")
    if discovered.isStreaming:
        return discovered.groupBy("host").applyInPandasWithState(
            _frontier_fn(delay_us),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _schedule_batch(pdf, 0, delay_us)
        return out[["host", "url", "priority", "discovered_ts", "scheduled_ts"]]

    return discovered.groupBy("host").applyInPandas(batch_fn, schema=OUT_SCHEMA)
