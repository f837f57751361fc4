"""Custom stateful streaming: cross-batch first-seen dedup per key group.

A crawl stream re-delivers URLs across micro-batches; streaming dedup
needs per-group state that outlives a batch. Spark's built-in
``dropDuplicates`` on a stream keeps unbounded state keyed by the dedup
column; this operator instead manages state explicitly with
``applyInPandasWithState`` — the engine's pattern for custom stateful
operators (harness contract): state = the set of seen 64-bit url hashes
per hash-shard group, stored as a packed int64 list, with an optional
idle-shard TTL (ProcessingTimeTimeout eviction) bounding total state.

The state key is ``pmod(xxhash64(url), n_groups)`` — URL-hash sharding,
NOT host sharding: it distributes state evenly regardless of host skew,
at the (deliberate) cost that per-host state policies can't be built on
this key. The dedup is PROBABILISTIC, not exact: two distinct urls
colliding on the 64-bit pandas hash drop the later one (birthday bound
~1e-4 at ~78M urls per group); the seen-set is hashes (8 B/url), not
urls, which is the trade that makes the state executor-sized.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, warc_ts timestamp, group_id long"
STATE_SCHEMA = "seen array<long>"


def _dedup_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # vectorized first-seen mask — no per-row Python on the hot path:
    # within-chunk dupes via Series.duplicated (keeps first), cross-batch
    # dupes via sorted-membership isin against the state array
    seen = (
        np.asarray(state.get[0], dtype=np.int64)
        if state.exists
        else np.empty(0, dtype=np.int64)
    )
    for pdf in batches:
        h = pd.util.hash_array(pdf["url"].to_numpy(dtype=object)).astype(np.int64)
        fresh = ~pd.Series(h).duplicated().to_numpy() & ~np.isin(h, seen)
        out = pdf.loc[fresh, ["url", "warc_ts"]].copy()
        out["group_id"] = key[0]
        seen = np.concatenate([seen, h[fresh]])
        if len(out):
            yield out
    state.update((seen.tolist(),))


def streaming_url_dedup(
    pages: DataFrame, n_groups: int = 64, ttl_minutes: float | None = None
) -> DataFrame:
    """First-seen URL filter over a streaming pages DataFrame.

    Emits each url once across all micro-batches (probabilistic: a
    64-bit hash collision between distinct urls drops the later one —
    see the module docstring). Grouping key is a stable hash shard so
    state distributes evenly over executors.

    ``ttl_minutes`` bounds state: a shard idle that long is evicted via
    ProcessingTimeTimeout, at the cost of re-admitting urls first seen
    before the eviction. The default (None) keeps state for the life of
    the query — exact first-seen, but the seen-set only ever grows
    (~8 B/url), so long-running crawls SHOULD set a TTL sized to their
    re-delivery horizon. (Before this knob existed the NoTimeout was
    hardcoded and no watermark could shrink the state.)
    """
    if ttl_minutes is not None and ttl_minutes <= 0:
        raise ValueError("ttl_minutes must be positive (or None)")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(key, batches, state):
        if ttl_minutes is not None and state.hasTimedOut:
            state.remove()
            return
        yield from _dedup_fn(key, batches, state)
        # after _dedup_fn's state.update, so the state object exists
        if ttl_minutes is not None:
            state.setTimeoutDuration(int(ttl_minutes * 60_000))

    keyed = pages.withColumn("group_id", F.pmod(F.xxhash64("url"), F.lit(n_groups)))
    return keyed.groupBy("group_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
