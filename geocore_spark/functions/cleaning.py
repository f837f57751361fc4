"""Corpus-cleaning kernels: PII scrubbing, passage chunking, word n-grams.

Training-data pipelines over crawl corpora need operations the rest of
the engine doesn't cover: redacting personally-identifiable substrings before
a corpus leaves the enclave, splitting documents into fixed-size overlapping
passages for context-window packing / retrieval indexing, generic word
n-grams (the 2-gram special case lives in :mod:`functions.text`), and
corpus-level duplicate-line removal (``dedup_lines``, the CCNet-style
boilerplate strip).

All are **pure Column expressions** — JVM-side, codegen'd, zero Python
in the hot path — and every pattern is written in the common subset of Java
regex (Spark) and RE2 (DuckDB) so the oracle replays them exactly: no
lookaround, no backreferences, explicit character classes only. Known
edge outside the subset: ``\\s`` includes vertical tab (\\x0B) in Java
but not RE2, so a \\x0B-separated "word pair" is one token to the oracle
and two to the engine — accepted (vanishingly rare in web text); and
Java's ``$`` matches before a FINAL line terminator while RE2's is
end-of-text only, which is why the rule filters normalize every
terminator Java recognizes (CR, NEL, LS, PS) before anchoring.

Reference role: the reference has no cleaning stage (its inputs are curated
warehouse tables, /root/reference/modeling/datasets/base.py:25-56); these
operators are part of the beyond-reference LLM-pipeline surface required by
the brief, same tier as functions/text.py quality signals.

Scale notes:
- ``scrub_pii`` is a chain of three ``regexp_replace`` over one string
  column: narrow projection, whole-stage codegen, embarrassingly parallel.
  No shuffle at any scale.
- ``chunk_spans`` emits an array of (start, chunk) structs; callers
  posexplode it. Explode factor = ceil(tokens/stride) — bounded and known
  up front. IMPORTANT: materialize the token array in a prior select before
  passing it here (the nested-lambda re-derivation trap documented at
  functions/text.py:word_bigrams).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns shared verbatim by the Spark expressions and the SQL oracles.
# Order matters and is part of the contract: emails first (so the phone rule
# can't eat a digit-heavy mailbox local part), then IPv4, then phone runs.
# A mailbox with a raw-IP host ("root@10.1.2.3") is NOT an email by this
# grammar (no alphabetic TLD) — it redacts as "root@<IP>", still masked.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_PATTERN = r"\+?[0-9][0-9()\- ]{7,}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(text: Column) -> Column:
    """Redact emails, IPv4 addresses, and phone-number runs (in that order).

    Spark ``regexp_replace`` replaces every occurrence; the DuckDB twin needs
    the explicit ``'g'`` flag — oracle SQL must use
    ``regexp_replace(t, pat, tok, 'g')``.
    """
    out = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_PATTERN, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_PATTERN, PHONE_TOKEN)


def pii_counts(text: Column) -> Column:
    """struct(emails, ips, phones): how many of each PII class the scrubber
    would redact. Counted on the same progressively-scrubbed text the
    replacement chain sees, so counts always equal redactions."""
    after_email = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_PATTERN, IPV4_TOKEN)
    return F.struct(
        F.regexp_count(text, F.lit(EMAIL_PATTERN)).cast("long").alias("emails"),
        F.regexp_count(after_email, F.lit(IPV4_PATTERN)).cast("long").alias("ips"),
        F.regexp_count(after_ip, F.lit(PHONE_PATTERN)).cast("long").alias("phones"),
    )


def chunk_spans(toks: Column, size: int, stride: int) -> Column:
    """Overlapping fixed-size passages over a token-array column.

    Returns ``array<struct<start:int, chunk:string>>`` where ``start`` is the
    1-based token offset (so chunk i covers tokens [start, start+size)) and
    chunks are taken every ``stride`` tokens — ``stride < size`` gives the
    standard overlapping-window packing. An empty/whitespace-only document
    yields one empty chunk at start=1 (callers filter on token count).

    SQL twin (DuckDB list comprehension, probed exact):
    ``[{'start': i, 'chunk': array_to_string(w[i:i+size-1], ' ')}
       for i in range(1, len(w)+1, stride)]``
    — note DuckDB slices are END-INCLUSIVE (``w[i:i+size-1]`` = ``size``
    tokens) while Spark ``slice(toks, i, size)`` takes a length.
    """
    if stride < 1 or size < 1:
        raise ValueError("size and stride must be >= 1")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    spans = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("int").alias("start"),
            F.concat_ws(" ", F.slice(toks, s, size)).alias("chunk"),
        ),
    )
    # null token array -> no chunks (size(null) is null, which would
    # otherwise fall through greatest() and emit one phantom '' chunk)
    return F.when(
        toks.isNull(), F.array().cast("array<struct<start:int,chunk:string>>")
    ).otherwise(spans)


def dedup_lines(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
):
    """Corpus-level duplicate-line removal (the CCNet/RefinedWeb boilerplate
    strip): delete every line whose exact text occurs in >= ``min_docs``
    distinct documents, re-join the survivors in original order.

    Returns ``(id_col, text_col, n_lines_kept, n_lines_removed)`` with one
    row per input document (a fully-boilerplate document survives with
    ``text_col = ''``). Blank lines are never counted or removed — they are
    document structure, not content.

    Scale shape (the part that matters at 100 TB):
    - one ``posexplode`` over the line split (explode factor = lines/doc,
      bounded, no skew beyond document length),
    - one hash aggregation keyed on the line string with a map-side partial
      ``count(distinct id)`` collapse — the only shuffle of the detection
      phase; hot boilerplate lines ("subscribe to our newsletter") are
      exactly the high-frequency keys partial aggregation absorbs,
    - one anti-join of lines against the banned set (AQE picks broadcast
      when the banned set is small — the common case — else a shuffled hash
      join on the same key the aggregation just used),
    - one ``groupBy(id)`` re-assembly, shuffling only surviving lines.
    No per-row Python anywhere; every expression is codegen'd Column logic.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would ban every line)")
    ident = F.col(id_col)
    lines = df.select(
        ident.alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    banned = (
        lines.filter(F.trim(F.col("__line")) != "")
        .groupBy("__line")
        .agg(F.count_distinct(F.col("__id")).alias("__ndocs"))
        .filter(F.col("__ndocs") >= min_docs)
        .select("__line")
    )
    kept = lines.join(banned, on="__line", how="left_anti")
    reassembled = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda x: x.getField("__line"),
            ),
            "\n",
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy("__id").agg(F.count(F.lit(1)).alias("__n_total"))
    return (
        totals.join(reassembled, on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).alias("n_lines_kept"),
            (F.col("__n_total") - F.coalesce(F.col("n_lines_kept"), F.lit(0))).alias(
                "n_lines_removed"
            ),
        )
    )


def nfc_normalize_udf():
    """Unicode NFC normalization (composed form) as an Arrow-batched UDF —
    the canonicalization step before hashing/dedup so 'cafe\\u0301' and
    'caf\\u00e9' fingerprint identically. Spark has no built-in Unicode
    normalizer; Python's unicodedata implements the same Unicode standard
    algorithm as DuckDB's nfc_normalize (probed identical incl. ligature
    non-composition), so the oracle replays it exactly. Null-safe."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return _nfc


def tokens(text: Column) -> Column:
    """THE canonical tokenizer of the engine's text operators: lowercase,
    whitespace split, empties dropped. Dedup, decontamination, chunking,
    and the curation job all call this one expression so they agree on
    what a "word" is — do not re-spell it inline."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != "")


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token-array column (empty if < n
    tokens). Generalizes functions/text.py:word_bigrams; same
    materialize-your-tokens-first caveat applies."""
    if n < 1:
        raise ValueError("n must be >= 1")
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(sz - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # sz < n covers real arrays; the isNull guard stops a null array from
    # falling through to one phantom '' gram
    return F.when(toks.isNull() | (sz < n), F.array().cast("array<string>")).otherwise(
        grams
    )



def _normalize_newlines(text: Column) -> Column:
    """Line-terminator normalization shared by the rule filters: strip CR
    (so CRLF == LF) and map the exotic Unicode terminators NEL/LS/PS
    (U+0085, U+2028, U+2029) to LF. Removes the Java-vs-RE2 ``$``
    divergence for EVERY terminator Java recognizes (Java's ``$`` matches
    before a final line terminator; RE2's is end-of-text only) and makes
    LS/PS-separated text behave as the line breaks they are. SQL twin:
    ``translate(replace(t, chr(13), ''), chr(133)||chr(8232)||chr(8233),
    chr(10)||chr(10)||chr(10))``.
    """
    stripped = F.replace(F.coalesce(text, F.lit("")), F.lit("\r"))
    return F.translate(stripped, "\u0085\u2028\u2029", "\n\n\n")


def c4_signals(
    text: Column, min_words: int = 3, min_kept_lines: int = 5
) -> Column:
    """C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2) as
    one pure-Column struct — the canonical rule-based web filter:

    - a line is KEPT iff it ends in terminal punctuation (. ! ? "),
      has >= ``min_words`` whitespace words, and does not contain the
      word "javascript" (C4 drops the LINE, not the page);
    - the page is dropped (keep=0) if it has fewer than
      ``min_kept_lines`` kept lines (the paper's "fewer than 5
      sentences" gate, at line grain), contains "lorem ipsum"
      (case-insensitive) or a curly brace.

    Returns ``struct(n_lines, n_kept, has_lorem, has_brace,
    has_javascript, keep)`` — all INT, so downstream aggregation and the
    SQL oracle are value-exact (``has_javascript`` is reported as a
    signal; it only removes lines). Line terminators are normalized up
    front (CR stripped, NEL/LS/PS mapped to LF) so every terminator Java
    recognizes behaves identically on both engines — see
    :func:`_normalize_newlines`. Null text yields (0, 0, 0, 0, 0, 0). Single projection;
    the line split runs once per derived count (HOF lambdas are
    interpreted — pre-stage the array per the repo staging rule if this
    ever sits in a hot loop).
    """
    t = _normalize_newlines(text)
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    is_js = lambda x: F.lower(x).rlike(r"\bjavascript\b")  # noqa: E731
    kept = F.filter(
        lines,
        lambda x: F.trim(x).rlike(r'[.!?"]$')
        & (
            F.size(F.filter(F.split(F.trim(x), r"\s+"), lambda w: w != ""))
            >= F.lit(min_words)
        )
        & ~is_js(x),
    )
    low = F.lower(t)
    has_lorem = low.contains("lorem ipsum").cast("int")
    has_brace = (low.contains("{") | low.contains("}")).cast("int")
    has_js = F.exists(lines, is_js).cast("int")
    n_kept = F.size(kept)
    keep = (
        (n_kept >= F.lit(min_kept_lines))
        & (has_lorem == 0)
        & (has_brace == 0)
    ).cast("int")
    return F.struct(
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_javascript"),
        keep.alias("keep"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_signals(
    text: Column, min_words: int = 50, max_words: int = 100_000
) -> Column:
    """Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 Table A1)
    as one pure-Column struct — the other canonical rule-based web
    filter next to :func:`c4_signals`. Every ratio threshold is encoded
    as an integer cross-multiplication, so the struct is value-exact
    with no float in sight; removal-rule boundaries follow the paper
    ("more than X%" removes, so exactly X% keeps):

    - r_words:    min_words <= word count <= max_words
    - r_meanlen:  mean word length in [3, 10]  (3W <= C <= 10W, where
                  C = non-whitespace chars — exactly the summed word
                  lengths under the canonical tokenizer)
    - r_symbols:  hash-to-word ratio <= 0.1 AND ellipsis-to-word ratio
                  <= 0.1 (each tested separately, per the paper)
    - r_bullets:  <= 90% of lines start with a bullet (10B <= 9L)
    - r_ellipsis: <= 30% of lines end with "..." (10E <= 3L)
    - r_alpha:    >= 80% of words contain a letter (5A >= 4W)
    - r_stops:    >= 2 distinct stop words present

    Returns ``struct(n_words, r_words, r_meanlen, r_symbols, r_bullets,
    r_ellipsis, r_alpha, r_stops, keep)``, all INT; null/empty text has
    0 words, fails r_words/r_meanlen/r_alpha and thus keep=0. Line
    terminators are normalized up front (:func:`_normalize_newlines`). Single projection;
    the token/line arrays are re-derived per count (interpreted HOF
    lambdas — pre-stage the arrays per the repo staging rule for hot
    paths).
    """
    t = F.lower(_normalize_newlines(text))
    toks = tokens(t)
    w = F.size(toks).cast("bigint")
    c = F.length(F.regexp_replace(t, r"\s+", "")).cast("bigint")
    n_hash = (F.length(t) - F.length(F.replace(t, F.lit("#")))).cast("bigint")
    n_ell = (
        (F.length(t) - F.length(F.replace(t, F.lit("...")))) / 3
    ).cast("bigint")
    lines = F.filter(F.split(t, r"\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"^[-•*]"))
    ).cast("bigint")
    n_ell_lines = F.size(
        F.filter(lines, lambda x: F.trim(x).rlike(r"\.\.\.$"))
    ).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda x: x.rlike(r"[a-z]"))
    ).cast("bigint")
    n_stops = F.size(
        F.array_intersect(
            toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    ).cast("bigint")
    r_words = ((w >= min_words) & (w <= max_words)).cast("int")
    r_meanlen = ((3 * w <= c) & (c <= 10 * w) & (w > 0)).cast("int")
    r_symbols = ((10 * n_hash <= w) & (10 * n_ell <= w)).cast("int")
    r_bullets = (10 * n_bullet <= 9 * n_lines).cast("int")
    r_ellipsis = (10 * n_ell_lines <= 3 * n_lines).cast("int")
    r_alpha = ((5 * n_alpha >= 4 * w) & (w > 0)).cast("int")
    r_stops = (n_stops >= 2).cast("int")
    keep = (
        (r_words == 1)
        & (r_meanlen == 1)
        & (r_symbols == 1)
        & (r_bullets == 1)
        & (r_ellipsis == 1)
        & (r_alpha == 1)
        & (r_stops == 1)
    ).cast("int")
    return F.struct(
        w.cast("int").alias("n_words"),
        r_words.alias("r_words"),
        r_meanlen.alias("r_meanlen"),
        r_symbols.alias("r_symbols"),
        r_bullets.alias("r_bullets"),
        r_ellipsis.alias("r_ellipsis"),
        r_alpha.alias("r_alpha"),
        r_stops.alias("r_stops"),
        keep.alias("keep"),
    )
