"""Minimal byte-pair-encoding tokenizer: deterministic merge learning +
greedy encoding, Arrow-batched for Spark.

functions/text.py's ``bpe_ish_token_count`` is a regex approximation; this
module implements the real algorithm (Sennrich et al. 2016, the GPT-2
scheme simplified to word-internal merges) so token budgets for packing /
cost estimation reflect an actual learned vocabulary. Everything is
deterministic: merge learning breaks frequency ties lexicographically, so
the same corpus always yields the same merge table, and the merge table —
not library state — is the serialized artifact (ship it as a list of
string pairs; broadcast-size).

Scale shape: learning runs driver-side on a SAMPLE (vocab learning is a
fixed-cost artifact build, exactly like the IVF codebook at
operators/similarity.py:build_ivf_index); encoding is an Arrow-batched
pandas UDF over the corpus — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

# pre-tokenizer: alpha runs / digits / single punctuation — the same
# public common-subset pattern text.py uses, so the two token counters
# segment words identically
_PRETOK = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")

_END = "</w>"  # end-of-word sentinel so merges can't cross word borders


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (_END,)


def learn_bpe(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a text sample. Deterministic: the
    most frequent adjacent pair wins, ties broken by the pair's lexical
    order. Returns the ordered merge list (the whole tokenizer state)."""
    vocab: Counter = Counter()
    for t in texts:
        for w in _PRETOK.findall((t or "").lower()):
            vocab[_word_symbols(w)] += 1
    return _merge_loop(vocab, n_merges)


def learn_bpe_from_word_freqs(
    freqs: list[tuple[str, int]], n_merges: int = 200
) -> list[tuple[str, str]]:
    """Merge loop over a ``(pre_token, frequency)`` summary instead of raw
    texts. The words MUST already be pre-tokens (``_PRETOK`` matches on
    lowercased text) — :func:`word_freq_table` produces exactly that, so
    the distributed path learns the identical merge list ``learn_bpe``
    would (pinned by tests/test_bpe.py). The summary is the scale move:
    the corpus scan stays in Spark and only the frequency table — bounded
    by distinct words, not corpus bytes — reaches the driver."""
    vocab: Counter = Counter()
    for w, f in freqs:
        vocab[_word_symbols(w)] += f
    return _merge_loop(vocab, n_merges)


def _merge_loop(vocab: Counter, n_merges: int) -> list[tuple[str, str]]:
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: Counter = Counter()
        a, b = best
        ab = a + b
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] += freq
        vocab = merged
    return merges


def word_freq_table(
    df, text_col: str = "text", top_k: int | None = None
) -> list[tuple[str, int]]:
    """Distributed pre-token frequency extraction — the input half of
    :func:`learn_bpe_from_word_freqs`. Segmentation runs through the SAME
    compiled ``_PRETOK`` as the driver learner and the encoder (an
    Arrow-batched UDF, not a JVM regex: Java ``\\s`` is ASCII-only vs
    Python's Unicode whitespace, the classify.py train/apply-skew trap —
    one regex object on both sides makes the skew impossible). One
    explode + one hash aggregate; ``top_k`` caps the collected table
    deterministically (freq desc, word asc — a distributed
    TakeOrderedAndProject, never a single-task sort)."""

    @F.pandas_udf("array<string>")
    def _pretok(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _PRETOK.findall((t or "").lower()))

    wf = (
        df.select(F.explode(_pretok(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if top_k is not None:
        wf = wf.orderBy(F.col("freq").desc(), "word").limit(top_k)
    rows = wf.collect()
    # canonical order so the returned artifact is reproducible
    # independent of partitioning (the merge loop itself is
    # order-insensitive, but artifacts should diff cleanly)
    return sorted(((r["word"], r["freq"]) for r in rows), key=lambda x: (-x[1], x[0]))


def learn_bpe_distributed(
    df, text_col: str = "text", n_merges: int = 200, top_k: int | None = None
) -> list[tuple[str, str]]:
    """100-TB-shaped BPE training: Spark scans the corpus once and ships
    only the word-frequency summary to the driver's merge loop. With
    ``top_k=None`` the result is identical to ``learn_bpe`` over the
    collected texts (pinned); set ``top_k`` on huge corpora to bound the
    driver table — head words carry virtually all the pair mass."""
    return learn_bpe_from_word_freqs(word_freq_table(df, text_col, top_k), n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_text(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    out: list[str] = []
    for w in _PRETOK.findall((text or "").lower()):
        out.extend(encode_word(w, ranks))
    return out


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Arrow-batched encoder: text -> array<string> of BPE tokens (the
    </w> sentinel kept, so joining tokens and stripping it reconstructs
    the pre-token stream). Same closure-shipped merge table and per-batch
    word memo as the counter below; use this when downstream needs the
    tokens themselves (packing inspection, vocab audits), the counter
    when only budgets matter — the counter's output is 8 bytes/doc, this
    one's is the tokenized corpus."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _encode(s: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            for w in _PRETOK.findall((t or "").lower()):
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return s.map(enc)

    return _encode


def bpe_token_count_udf(merges: list[tuple[str, str]]):
    """Arrow-batched token counter for a learned merge table. The merges
    list is closure-captured (serialized once per task, broadcast-size)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        # per-word memo: corpora repeat words heavily, so encode each
        # distinct word once per batch
        memo: dict[str, int] = {}

        def n_tokens(t):
            total = 0
            for w in _PRETOK.findall((t or "").lower()):
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        return s.map(n_tokens)

    return _count
