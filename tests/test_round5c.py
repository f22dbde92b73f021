"""Round-5 session-6 additions: Gopher repetition signals, PII redaction,
triangle counting."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- repetition

def _py_repetition(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    """Independent per-document computation of every Gopher signal."""
    lines = [x for x in text.split("\n") if x]
    paras = [x for x in re.split(r"\n{2,}", text) if x]
    toks = [t for t in re.split(r"\s+", text.strip()) if t]
    dc = len(text)
    out = {}
    for kind, units in (("line", lines), ("para", paras)):
        cnt = Counter(units)
        dd = sum(cnt.values())
        cd = sum(c * len(u) for u, c in cnt.items())
        dn = sum(c - 1 for c in cnt.values())
        cn = sum((c - 1) * len(u) for u, c in cnt.items())
        out[f"dup_{kind}_frac"] = min(round(dn / dd, 6), 1.0) if dd else 0.0
        out[f"dup_{kind}_char_frac"] = (
            min(round(cn / cd, 6), 1.0) if cd else 0.0
        )
    for n in top_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        tops = [c * len(g) for g, c in grams.items() if c > 1]
        out[f"top_{n}gram_char_frac"] = (
            min(round(max(tops) / dc, 6), 1.0) if tops and dc else 0.0
        )
    for n in dup_ns:
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        s = sum(c * len(g) for g, c in grams.items() if c > 1)
        out[f"dup_{n}gram_char_frac"] = min(round(s / dc, 6), 1.0) if dc else 0.0
    return out


REP_TEXTS = [
    "same line\nsame line\nunique third line",
    "para body here\n\npara body here\n\nu1\nu2\nu3\nu4\nu5\nu6\nu7\nu8",
    ("ha ho " * 30).rstrip(),
    "alpha beta gamma delta eps alpha beta gamma delta eps zeta tail",
    "",  # empty doc must survive (explode_outer) with all-zero signals
    "   ",  # whitespace-only: no tokens, no lines with content
    "a perfectly normal short sentence with no repetition at all",
    "的 了 是 的 了 是 的 了 是 中文 重复 检测",  # CJK tokens
    "one\ntwo\nthree\n\n\nfour",  # 3+ newlines still one para break
    "x y " * 5 + "long unique tail with many distinct words here now",
]


def test_repetition_signals_differential(spark):
    from tcmkg.ops.repetition import repetition_signals

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REP_TEXTS)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(df).collect()
    }
    assert set(got) == set(range(len(REP_TEXTS)))  # empty docs kept
    for i, text in enumerate(REP_TEXTS):
        want = _py_repetition(text)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=2e-6), (i, k, got[i][k], v)


def test_repetition_filter_reasons_and_split(spark):
    from tcmkg.ops.repetition import (
        GOPHER_THRESHOLDS,
        repetition_filter,
        repetition_flags,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REP_TEXTS)], "doc_id long, text string"
    )
    flags = {r["doc_id"]: r for r in repetition_flags(df).collect()}
    # planted families land on their intended first-failing rule
    assert flags[0]["reason"] == "dup_line_frac"
    assert flags[1]["reason"] == "dup_para_frac"
    assert flags[2]["reason"] == "top_2gram_char_frac"
    # clean docs keep
    for i in (4, 5, 6):
        assert flags[i]["reason"] is None and flags[i]["keep"]
    # reason is always the FIRST threshold exceeded, in dict order
    for i, r in flags.items():
        sig = _py_repetition(REP_TEXTS[i])
        expect = next(
            (k for k, t in GOPHER_THRESHOLDS.items() if sig[k] > t), None
        )
        assert r["reason"] == expect, (i, r["reason"], expect)

    parts = repetition_filter(df)
    kept_ids = {r["doc_id"] for r in parts["kept"].collect()}
    removed = {r["doc_id"]: r["reason"] for r in parts["removed"].collect()}
    assert kept_ids.isdisjoint(removed)
    assert kept_ids | set(removed) == set(range(len(REP_TEXTS)))
    assert parts["kept"].columns == df.columns
    metrics = {r["reason"]: r["n"] for r in parts["metrics"].collect()}
    assert sum(metrics.values()) == len(removed)


# ------------------------------------------------------------------- PII

PII_TEXTS = [
    "mail me at alice.bob+spam@example.co.uk or bob@test.io thanks",
    "hosts 192.168.0.1 and 10.0.0.255, but 1234.5.6.7 has no boundary",
    "call +86 138-0013-8000 or 021 6427 8000 now",
    "ssn 123456789 card 4111111111111111 short 12345678 stays",
    "no pii here at all, just words and a few 123 digits",
    "v4-ish 999.999.999.999 still matches the syntactic class",
    "edge@x.io.",  # trailing dot stays outside the match
    "",
]


def _py_pii(text):
    from tcmkg.ops.pii import PII_PATTERNS, PII_PLACEHOLDERS

    counts = {
        f"n_{k}": len(re.findall(p, text)) for k, p in PII_PATTERNS.items()
    }
    red = text
    for k, p in PII_PATTERNS.items():
        red = re.sub(p, PII_PLACEHOLDERS[k], red)
    return counts, red


def test_pii_differential_vs_python_re(spark):
    """Java regex (Spark) vs Python re — a third engine beside the DuckDB
    RE2 oracle; all three must agree on the restricted pattern subset."""
    from tcmkg.ops.pii import pii_redact, pii_signals

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in pii_redact(pii_signals(df), "text", "red").collect()
    }
    for i, text in enumerate(PII_TEXTS):
        counts, red = _py_pii(text)
        for k, v in counts.items():
            assert rows[i][k] == v, (i, k, rows[i][k], v)
        assert rows[i]["red"] == red, (i, rows[i]["red"], red)
        assert rows[i]["n_pii"] == sum(counts.values())


def test_pii_scrub_metrics_and_idempotency(spark):
    from tcmkg.ops.pii import pii_scrub

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(PII_TEXTS)], "doc_id long, text string"
    )
    out = pii_scrub(df)
    m = out["metrics"].collect()[0]
    want = [_py_pii(t)[0] for t in PII_TEXTS]
    assert m["docs"] == len(PII_TEXTS)
    assert m["n_email"] == sum(w["n_email"] for w in want)
    assert m["n_pii"] == sum(sum(w.values()) for w in want)
    assert m["docs_with_pii"] == sum(1 for w in want if sum(w.values()))
    # scrubbing already-scrubbed text is a no-op (placeholders carry no
    # digits or '@', so no pattern can fire inside them)
    again = pii_scrub(out["scrubbed"].select("doc_id", "text"))
    assert again["metrics"].collect()[0]["n_pii"] == 0
