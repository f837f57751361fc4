"""Sequence packing: assemble chunk-sized passages into fixed token-budget
training sequences (bins).

The last pre-tokenizer step of an LLM data pipeline: given chunks with
token counts, group them into packs whose total token count stays within
the context budget, wasting as little budget as possible. Exact bin
packing is NP-hard; the industry-standard compromise is greedy
first-fit-decreasing (FFD), which is within 11/9·OPT + 6/9 bins
(Dósa 2007) — more than good enough when the alternative is padding.

Distributed shape (the 100 TB design):
- Chunks are salted into ``n_groups`` independent packing groups by a
  deterministic hash of the id columns. ONE shuffle (groupBy the salt),
  then each group packs locally in an Arrow-batched ``applyInPandas``.
  Pack ids are made globally unique as ``group_id * 2^40 + local_pack``.
- Packing quality loss from sharding is negligible at scale: expected
  per-group waste is < one budget's worth of tokens, so total waste is
  bounded by ``n_groups × budget`` tokens — noise against 10^12 tokens.
  Pick ``n_groups`` ≈ cluster cores; more groups = more parallelism,
  bounded-worse packing.
- State per task = one group's chunks (ids + counts only, never text);
  re-join packs to text by chunk id afterwards. Deterministic: ties
  broken by chunk id, so the same input always packs identically.

No reference analogue (the reference feeds pandas frames to LightGBM,
/root/reference/modeling/datasets/build.py:288-305); this belongs to the
beyond-reference training-data surface, like operators/decontam.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GROUP_SHIFT = 1 << 40  # pack ids: group_id * 2^40 + local pack ordinal


def _ffd_pack(counts: list[int], budget: int) -> list[int]:
    """First-fit-decreasing over (count, position) pairs; returns the pack
    ordinal per input position. A chunk larger than the budget gets a pack
    of its own (callers decide whether to truncate upstream). Pure Python
    loop, but runs once per *group*, not per row, and only over ints.

    Leftmost-fit lookup uses a max segment tree over pack remaining
    capacities: the naive scan is O(n·packs) — quadratic in group size
    since packs grow with n — which is the difference between seconds and
    hours when one task packs a whole salt group. Tree descent (left child
    first) finds the same leftmost fitting pack, so assignments are
    identical to the naive loop."""
    n = len(counts)
    order = sorted(range(n), key=lambda i: (-counts[i], i))
    pack_of = [0] * n
    # segment tree sized for the worst case (every chunk its own pack)
    size = 1
    while size < max(n, 1):
        size *= 2
    # max remaining capacity per subtree; -1 marks unopened or overloaded
    # packs so that zero-count chunks (rem >= 0 fits them) never land on one
    tree = [-1] * (2 * size)
    n_packs = 0

    def _open_pack() -> int:
        nonlocal n_packs
        p = n_packs
        n_packs += 1
        return p

    def _update(p: int, rem: int) -> None:
        i = size + p
        tree[i] = rem
        i //= 2
        while i:
            tree[i] = tree[2 * i] if tree[2 * i] >= tree[2 * i + 1] else tree[2 * i + 1]
            i //= 2

    rems = [0] * max(n, 1)
    for i in order:
        c = counts[i]
        if n_packs and tree[1] >= c:
            # descend to the LEFTMOST pack with remaining >= c
            node = 1
            while node < size:
                node *= 2
                if tree[node] < c:
                    node += 1
            p = node - size
            rems[p] -= c
            _update(p, rems[p])
        else:
            p = _open_pack()
            rems[p] = budget - c  # negative for oversized chunks —
            _update(p, rems[p] if rems[p] >= 0 else -1)  # -1: closed to all
        pack_of[i] = p
    return pack_of


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    n_groups: int = 64,
    id_cols: tuple[str, str] = ("doc_id", "start"),
    token_col: str = "n_tokens",
) -> DataFrame:
    """Assign every chunk to a training pack: adds ``group_id`` (the salt
    shard), ``pack_id`` (globally unique), and passes the id/token columns
    through. Invariants (property-tested): every chunk appears exactly
    once; no pack exceeds ``budget`` unless it holds a single oversized
    chunk; the assignment is deterministic for a given input.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    key_a, key_b = id_cols
    # id columns keep their ORIGINAL types: casting them to long would
    # silently NULL every non-numeric string id (the train_shuffle bug
    # class), making packs unjoinable back to text. Only the token count
    # is normalized, so the applyInPandas schema stays caller-stable.
    salted = chunks.select(
        F.col(key_a),
        F.col(key_b),
        F.col(token_col).cast("long").alias(token_col),
        (F.pmod(F.xxhash64(key_a, key_b), F.lit(n_groups))).alias("group_id"),
    )

    out_schema = T.StructType(
        list(salted.schema.fields) + [T.StructField("pack_id", T.LongType())]
    )
    # NULL token counts (e.g. null text upstream) get a pack of their own —
    # the oversized-chunk policy — instead of leaking NaN into the packer.
    _own_pack = budget + 1

    def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([key_a, key_b]).reset_index(drop=True)
        counts = [
            _own_pack if pd.isna(c) else int(c) for c in pdf[token_col].tolist()
        ]
        pack_of = _ffd_pack(counts, budget)
        gid = int(pdf["group_id"].iloc[0])
        pdf["pack_id"] = [gid * _GROUP_SHIFT + p for p in pack_of]
        return pdf

    return salted.groupBy("group_id").applyInPandas(_pack_group, schema=out_schema)


def pack_stats(packed: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """Per-pack totals + overall utilization inputs: (pack_id, n_chunks,
    pack_tokens). Feed into ``agg(avg(pack_tokens)/budget)`` for the
    utilization headline."""
    return packed.groupBy("pack_id").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(token_col).cast("long").alias("pack_tokens"),
    )
