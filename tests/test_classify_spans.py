"""Tests for the linear classifier scorer (operators/classify.py) and the
ExactSubstr token-window duplicate-span profile (dedup.duplicate_spans)."""

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import classify as cls
from geocore_spark.operators import dedup as dd


def test_classifier_score_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "fast data fast query"),   # 2*1.2 + 0.8 + 0.5 = 3.7
            (2, "slow slow scan"),         # 2*-1.3 + -0.4 = -3.0
            (3, "unknown words only"),     # bias only
            (4, ""),                       # empty -> bias only, 0 tokens
            (5, None),                     # null -> bias only, 0 tokens
        ],
        ["doc_id", "text"],
    )
    w = [("fast", 1.2), ("data", 0.8), ("query", 0.5), ("slow", -1.3), ("scan", -0.4)]
    out = {
        r["doc_id"]: r
        for r in cls.classifier_score(docs, w, bias=-0.05).collect()
    }
    assert out[1]["logit_micro"] == 3_700_000 - 50_000
    assert out[1]["label"] == 1 and out[1]["n_tokens"] == 4
    assert out[2]["logit_micro"] == -3_000_000 - 50_000
    assert out[2]["label"] == 0
    for i in (3, 4, 5):
        assert out[i]["logit_micro"] == -50_000 and out[i]["label"] == 0
    assert out[4]["n_tokens"] == 0 and out[5]["n_tokens"] == 0
    assert out[1]["logit"] == pytest.approx(3.65)
    # duplicate vocab terms refused
    with pytest.raises(ValueError):
        cls.classifier_score(docs, [("a", 1.0), ("a", 2.0)])


def test_classifier_case_and_count_sensitivity(spark):
    # canonical tokenizer lowercases; term frequency multiplies the weight
    docs = spark.createDataFrame([(1, "Fast FAST fast")], ["doc_id", "text"])
    r = cls.classifier_score(docs, [("fast", 0.5)]).collect()[0]
    assert r["logit_micro"] == 1_500_000 and r["n_tokens"] == 3


def test_probability_is_sigmoid(spark):
    import math

    docs = spark.createDataFrame([(1, "fast")], ["doc_id", "text"])
    out = (
        cls.classifier_score(docs, [("fast", 2.0)])
        .withColumn("p", cls.probability("logit"))
        .collect()[0]
    )
    assert out["p"] == pytest.approx(1 / (1 + math.exp(-2.0)))


def _span_docs(spark):
    # docs 1 and 2 share the 5-token run "a b c d e" (=> 3 shared 3-gram
    # windows, consecutive); doc 3 shares nothing; doc 4 repeats ITS OWN
    # phrase (within-doc, must NOT count at min_docs=2)
    return spark.createDataFrame(
        [
            (1, "x a b c d e y z"),
            (2, "q a b c d e"),
            (3, "one two three four five"),
            (4, "p p p p p p"),
        ],
        ["doc_id", "text"],
    )


def test_duplicate_spans_profile(spark):
    out = {
        r["doc_id"]: r
        for r in dd.duplicate_spans(_span_docs(spark), w=3).collect()
    }
    # doc1: 8 tokens -> 6 windows; windows at pos 2,3,4 duplicated
    assert out[1]["n_windows"] == 6
    assert out[1]["dup_windows"] == 3 and out[1]["max_run"] == 3
    assert out[1]["dup_ratio_micro"] == 3 * 1_000_000 // 6
    # doc2: 6 tokens -> 4 windows; pos 2,3,4 duplicated
    assert out[2]["n_windows"] == 4
    assert out[2]["dup_windows"] == 3 and out[2]["max_run"] == 3
    # doc3 clean; doc4 self-repeats only -> not cross-doc duplicated
    assert out[3]["dup_windows"] == 0 and out[3]["max_run"] == 0
    assert out[4]["dup_windows"] == 0
    assert out[4]["n_windows"] == 4  # still profiled


def test_duplicate_spans_spans_mode_and_run_math(spark):
    spans = {
        (r["doc_id"], r["start_pos"]): r["run_len"]
        for r in dd.duplicate_spans(_span_docs(spark), w=3, spans=True).collect()
    }
    # doc1's run starts at window pos 2 ('a b c'), 3 windows long
    assert spans[(1, 2)] == 3
    assert spans[(2, 2)] == 3
    # run of r windows covers r + w - 1 = 5 tokens = the shared phrase
    assert 3 + 3 - 1 == 5


def test_duplicate_spans_hash_key_matches_string_key(spark):
    docs = _span_docs(spark)
    a = sorted(
        tuple(r) for r in dd.duplicate_spans(docs, w=3).collect()
    )
    b = sorted(
        tuple(r) for r in dd.duplicate_spans(docs, w=3, hash_key=True).collect()
    )
    assert a == b


def test_duplicate_spans_short_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r for r in dd.duplicate_spans(docs, w=3).collect()
    }
    for i in (1, 2, 3):
        assert out[i]["n_windows"] == 0 and out[i]["dup_ratio_micro"] == 0
    with pytest.raises(ValueError):
        dd.duplicate_spans(docs, w=0)


def test_fit_linear_end_to_end(spark):
    # separable corpus: positives talk about good/fast/clean, negatives
    # about spam/slow/junk, with shared filler words
    import random

    rng = random.Random(7)
    pos_w, neg_w = ["good", "fast", "clean"], ["spam", "slow", "junk"]
    filler = ["the", "a", "data", "row", "table"]
    rows = []
    for i in range(400):
        y = i % 2
        src = pos_w if y else neg_w
        words = [rng.choice(src) for _ in range(5)] + [
            rng.choice(filler) for _ in range(8)
        ]
        rng.shuffle(words)
        rows.append((i, " ".join(words), y))
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])

    weights, bias = cls.fit_linear(df, vocab_size=20, max_samples=400)
    terms = dict(weights)
    # signal words got signed weights in the right direction
    assert all(terms[t] > 0 for t in pos_w)
    assert all(terms[t] < 0 for t in neg_w)

    scored = cls.classifier_score(df, weights, bias=bias).withColumnRenamed(
        "label", "pred"
    )
    acc = (
        scored.join(df.select("doc_id", "label"), "doc_id")
        .selectExpr("avg(cast(pred = label as int)) as acc")
        .collect()[0]["acc"]
    )
    assert acc > 0.95

    # determinism: same input -> identical model
    weights2, bias2 = cls.fit_linear(df, vocab_size=20, max_samples=400)
    assert weights2 == weights and bias2 == bias


def test_duplicate_spans_agrees_with_bruteforce(spark):
    """Randomized agreement with an independent driver-side reference:
    windows, cross-doc duplicate flags, totals and max runs computed in
    plain Python over small random corpora (3 seeds)."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d"]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(25)
        ]
        w = 3
        wins = {
            i: [
                " ".join(t.split()[p : p + w])
                for p in range(len(t.split()) - w + 1)
            ]
            for i, t in docs
        }
        docs_of = {}
        for i, gs in wins.items():
            for g in set(gs):
                docs_of.setdefault(g, set()).add(i)
        expect = {}
        for i, gs in wins.items():
            flags = [len(docs_of[g]) >= 2 for g in gs]
            runs, cur = [], 0
            for fl in flags:
                cur = cur + 1 if fl else 0
                if cur:
                    runs.append(cur)
            expect[i] = (
                len(gs),
                sum(flags),
                (sum(flags) * 1_000_000) // len(gs) if gs else 0,
                max(runs) if runs else 0,
            )
        from geocore_spark.operators import dedup as dd2

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["doc_id"]: (
                r["n_windows"],
                r["dup_windows"],
                r["dup_ratio_micro"],
                r["max_run"],
            )
            for r in dd2.duplicate_spans(df, w=w).collect()
        }
        assert got == expect, f"seed={seed}"


def test_scrub_spans_removes_duplicated_ranges(spark):
    docs = _span_docs(spark)
    spans = dd.duplicate_spans(docs, w=3, spans=True)
    # keep policy: doc 1 is the canonical keeper — scrub only doc 2
    scrubbed = {
        r["doc_id"]: r["text"]
        for r in dd.scrub_spans(
            docs, spans.filter("doc_id != 1"), w=3
        ).collect()
    }
    # doc2's run covers window pos 2..4 -> tokens 2..6 ('a b c d e')
    assert scrubbed[2] == "q"
    # keeper and untouched docs pass through verbatim
    assert scrubbed[1] == "x a b c d e y z"
    assert scrubbed[3] == "one two three four five"
    assert scrubbed[4] == "p p p p p p"


def test_scrub_spans_null_and_multi_range(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, None)], ["doc_id", "text"]
    )
    spans = spark.createDataFrame(
        [(1, 1, 1), (1, 6, 1)], ["doc_id", "start_pos", "run_len"]
    )
    # w=2: ranges cover tokens 1-2 and 6-7 -> keep 'c d e' and 'h'
    out = {
        r["doc_id"]: r["text"]
        for r in dd.scrub_spans(docs, spans, w=2).collect()
    }
    assert out[1] == "c d e h"
    assert out[2] is None  # null text passes through
    import pytest as _pt

    with _pt.raises(ValueError):
        dd.scrub_spans(docs, spans, w=0)


def test_classifier_agrees_with_bruteforce(spark):
    """Randomized agreement with a plain-Python reference over random
    corpora and random micro-snapped weights (3 seeds)."""
    import random

    for seed in (11, 12, 13):
        rng = random.Random(seed)
        vocab_all = ["a", "b", "c", "d", "e", "oov1", "oov2"]
        docs = [
            (i, " ".join(rng.choice(vocab_all) for _ in range(rng.randint(0, 9))))
            for i in range(30)
        ]
        weights = [
            (t, round(rng.uniform(-2, 2), 3)) for t in ["a", "b", "c", "d", "e"]
        ]
        bias = round(rng.uniform(-1, 1), 3)
        wm = {t: round(w * 1_000_000) for t, w in weights}
        bm = round(bias * 1_000_000)
        expect = {}
        for i, t in docs:
            toks = t.split()
            lm = bm + sum(wm.get(x, 0) for x in toks)
            expect[i] = (len(toks), lm, 1 if lm > 0 else 0)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_tokens"], r["logit_micro"], r["label"])
            for r in cls.classifier_score(df, weights, bias=bias).collect()
        }
        assert got == expect, f"seed={seed}"


def test_c4_signals_rules(spark):
    from geocore_spark.functions import cleaning as cl

    good = "\n".join(f"this is sentence number {i}." for i in range(5))
    rows = [
        (1, good),                                    # keeps
        (2, good + "\nlorem ipsum dolor."),           # lorem -> drop
        (3, good + "\nvar x = {a: 1};"),              # brace -> drop
        (4, good + "\nenable JavaScript to view."),   # js line -> drop
        (5, "short one.\nno punct line here\n" + good),  # extra junk lines
        (6, "one good sentence here."),               # < 5 kept -> drop
        (7, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", cl.c4_signals(F.col("text")).alias("s")
        ).collect()
    }
    assert out[1]["keep"] == 1 and out[1]["n_kept"] == 5
    assert out[2]["keep"] == 0 and out[2]["has_lorem"] == 1
    assert out[3]["keep"] == 0 and out[3]["has_brace"] == 1
    # C4 drops the javascript LINE, not the page: the 5 good lines keep it
    assert out[4]["keep"] == 1 and out[4]["has_javascript"] == 1
    assert out[4]["n_kept"] == 5  # the js line is excluded from kept
    # doc5: 'short one.' has only 2 words, 'no punct...' lacks terminal
    # punctuation — both rejected from kept; the 5 good lines remain
    assert out[5]["n_lines"] == 7 and out[5]["n_kept"] == 5
    assert out[5]["keep"] == 1
    assert out[6]["keep"] == 0 and out[6]["n_kept"] == 1
    assert out[7] == (0, 0, 0, 0, 0, 0)
    # CRLF text behaves like LF (CR stripped before the $-anchored check)
    crlf = spark.createDataFrame(
        [(9, "\r\n".join(f"crlf sentence number {i}." for i in range(5)))],
        ["doc_id", "text"],
    )
    r9 = crlf.select(cl.c4_signals(F.col("text")).alias("s")).collect()[0]["s"]
    assert r9["n_kept"] == 5 and r9["keep"] == 1


def test_gopher_signals_rules(spark):
    from geocore_spark.functions import cleaning as cl

    # 60 normal words with stop words -> passes everything
    good = " ".join(["the", "and"] + ["word"] * 58)
    rows = [
        (1, good),
        (2, " ".join(["word"] * 60)),              # no stop words
        (3, good + " " + "#" * 1 + " ###### ## #"),  # symbol-heavy
        (4, " ".join(["xx"] * 60) + " the and"),   # mean word len < 3
        (5, "\n".join("- bullet item" for _ in range(10)) + "\n" + good),
        (6, good.replace("word", "12345", 55)),    # <80% alphabetic words
        (7, None),
        (8, "the and " + " ".join(["word"] * 10)),  # too few words
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", cl.gopher_signals(F.col("text")).alias("s")
        ).collect()
    }
    assert out[1]["keep"] == 1 and out[1]["n_words"] == 60
    assert out[2]["keep"] == 0 and out[2]["r_stops"] == 0
    assert out[3]["r_symbols"] == 0
    assert out[4]["r_meanlen"] == 0
    # doc5: 10 bullet lines + 1 normal line = 11 lines, 10/11 > 90% -> fail
    assert out[5]["r_bullets"] == 0
    assert out[6]["r_alpha"] == 0 and out[6]["keep"] == 0
    assert out[7]["n_words"] == 0 and out[7]["keep"] == 0
    assert out[8]["r_words"] == 0 and out[8]["keep"] == 0
    # boundary semantics: exactly 90% bullet lines KEEPS (paper removes
    # only when MORE than 90%)
    b = spark.createDataFrame(
        [(9, "\n".join(["- bullet item"] * 9 + [good]))], ["doc_id", "text"]
    )
    r9 = b.select(cl.gopher_signals(F.col("text")).alias("s")).collect()[0]["s"]
    assert r9["r_bullets"] == 1
    # per-symbol thresholds: 6 hashes + 6 ellipses in 72 words passes
    # (each ratio <= 0.1) where a summed rule would fail
    s = spark.createDataFrame(
        [(10, good + " " + "# " * 6 + "word... " * 6)], ["doc_id", "text"]
    )
    r10 = s.select(cl.gopher_signals(F.col("text")).alias("s")).collect()[0]["s"]
    assert r10["r_symbols"] == 1


def test_rule_filters_agree_with_bruteforce(spark):
    """Randomized agreement of c4_signals/gopher_signals with independent
    plain-Python implementations of the published rules (3 seeds)."""
    import random
    import re

    from geocore_spark.functions import cleaning as cl

    words = ["alpha", "beta", "the", "of", "x1", "##", "12", "..."]
    enders = [".", "", "!", "...", " {", " javascript", ".\t", "?"]
    for seed in (21, 22, 23):
        rng = random.Random(seed)
        docs = []
        for i in range(25):
            n_lines = rng.randint(0, 6)
            ls = []
            for _ in range(n_lines):
                body = " ".join(rng.choice(words) for _ in range(rng.randint(1, 60)))
                if rng.random() < 0.3:
                    body = "- " + body
                ls.append(body + rng.choice(enders))
            sep = rng.choice(["\n", "\r\n", "\u2028", "\n"])
            docs.append((i, sep.join(ls)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])

        # the reference mimics the ENGINE's semantics exactly: space-only
        # trim (Spark F.trim), ASCII-\s tokenization (Java regex), and the
        # same terminator normalization (CR stripped, NEL/LS/PS -> LF)
        JWS = " \t\n\x0b\f\r"

        def norm(text):
            t = (text or "").replace("\r", "")
            for ch in ("\u0085", "\u2028", "\u2029"):
                t = t.replace(ch, "\n")
            return t

        def jtokens(s):
            return [x for x in re.split(f"[{JWS}]+", s.strip(JWS)) if x]

        def py_c4(text):
            t = norm(text)
            lines = [x for x in t.split("\n") if x.strip(" ")]
            kept = [
                x for x in lines
                if re.search(r'[.!?"]$', x.strip(" "))
                and len(jtokens(x.strip(" "))) >= 3
                and not re.search(r"\bjavascript\b", x.lower())
            ]
            low = t.lower()
            lorem = int("lorem ipsum" in low)
            brace = int("{" in low or "}" in low)
            js = int(any(re.search(r"\bjavascript\b", x.lower()) for x in lines))
            keep = int(len(kept) >= 5 and not lorem and not brace)
            return (len(lines), len(kept), lorem, brace, js, keep)

        got = {
            r["doc_id"]: tuple(r["s"])
            for r in df.select("doc_id", cl.c4_signals(F.col("text")).alias("s")).collect()
        }
        for i, text in docs:
            assert got[i] == py_c4(text), f"c4 seed={seed} doc={i}"

        def py_gopher(text):
            t = norm(text).lower()
            toks = jtokens(t)
            w = len(toks)
            c = len(re.sub(f"[{JWS}]+", "", t))
            nh = t.count("#")
            ne = (len(t) - len(t.replace("...", ""))) // 3
            lines = [x for x in t.split("\n") if x.strip(" ")]
            nl = len(lines)
            nb = sum(1 for x in lines if re.match(r"^[-•*]", x.strip(" ")))
            nel = sum(1 for x in lines if re.search(r"\.\.\.$", x.strip(" ")))
            na = sum(1 for x in toks if re.search(r"[a-z]", x))
            ns = len({x for x in toks} & set(cl.GOPHER_STOPWORDS))
            r = (
                int(50 <= w <= 100_000),
                int(3 * w <= c <= 10 * w and w > 0),
                int(10 * nh <= w and 10 * ne <= w),
                int(10 * nb <= 9 * nl),
                int(10 * nel <= 3 * nl),
                int(5 * na >= 4 * w and w > 0),
                int(ns >= 2),
            )
            return (w,) + r + (int(all(r)),)

        got_g = {
            r["doc_id"]: tuple(r["s"])
            for r in df.select("doc_id", cl.gopher_signals(F.col("text")).alias("s")).collect()
        }
        for i, text in docs:
            assert got_g[i] == py_gopher(text), f"gopher seed={seed} doc={i}"
