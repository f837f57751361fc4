"""Custom stateful streaming: cross-batch first-seen dedup per key group.

A crawl stream re-delivers URLs across micro-batches; exact streaming
dedup needs per-group state that outlives a batch. Spark's built-in
``dropDuplicates`` on a stream keeps unbounded state keyed by the dedup
column; this operator instead manages state explicitly with
``applyInPandasWithState`` — the engine's pattern for custom stateful
operators (harness contract): state = the set of seen 64-bit url hashes
per host-group, stored as a packed int64 list, with group-level timeout
handling left to the caller's watermark policy.

At scale the state key is ``pmod(xxhash64(host), n_groups)`` so state
shards evenly; the seen-set is hashes (8 B/url), not urls.
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
    seen = set(state.get[0]) if state.exists else set()
    for pdf in batches:
        h = pd.util.hash_array(pdf["url"].to_numpy(dtype=object)).astype(np.int64)
        fresh_mask = []
        for v in h:
            v = int(v)
            if v in seen:
                fresh_mask.append(False)
            else:
                seen.add(v)
                fresh_mask.append(True)
        out = pdf.loc[fresh_mask, ["url", "warc_ts"]].copy()
        out["group_id"] = key[0]
        if len(out):
            yield out
    state.update((list(seen),))


def streaming_url_dedup(pages: DataFrame, n_groups: int = 64) -> DataFrame:
    """First-seen URL filter over a streaming pages DataFrame.

    Emits each url exactly once across all micro-batches. Grouping key is
    a stable hash shard so state distributes evenly over executors.
    """
    keyed = pages.withColumn("group_id", F.pmod(F.xxhash64("url"), F.lit(n_groups)))
    return keyed.groupBy("group_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
