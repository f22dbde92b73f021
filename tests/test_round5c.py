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


# -------------------------------------------------------------- triangles

def _py_triangles(pairs):
    """Independent per-node triangle count over an undirected simple graph
    given as (possibly duplicated/reversed/self-looped) directed pairs."""
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = Counter()
    for u, v in und:
        for w in adj[u] & adj[v]:
            tri[u] += 1  # each triangle visits this loop via 3 edges; each
            tri[v] += 1  # edge credits its 2 endpoints once per closing w,
            tri[w] += 1  # so every corner is credited 3 times total
    deg = {n: len(s) for n, s in adj.items()}
    return {
        n: (deg[n], tri.get(n, 0) // 3) for n in adj
    }


def test_triangle_counts_differential(spark):
    from tcmkg.pipeline.triangles import triangle_counts

    # K4 on a-d (4 triangles), a 5-cycle with one chord (1 triangle), a
    # degree-6 hub star (0 triangles), parallel + reversed duplicates and
    # a self-loop that must all collapse/drop
    pairs = (
        [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1 :]]
        + [("p", "q"), ("q", "r"), ("r", "s"), ("s", "t"), ("t", "p"), ("p", "r")]
        + [("hub", f"leaf{i}") for i in range(6)]
        + [("b", "a"), ("a", "b"), ("p", "p")]
    )
    df = spark.createDataFrame(pairs, "subj string, obj string")
    got = {r["node"]: r for r in triangle_counts(df).collect()}
    want = _py_triangles(pairs)
    assert set(got) == set(want)
    total_spark = sum(r["triangles"] for r in got.values())
    assert total_spark == sum(t for _, t in want.values()) == (4 + 1) * 3
    for n, (d, t) in want.items():
        assert (got[n]["degree"], got[n]["triangles"]) == (d, t), (n, got[n])
        lcc = round(2 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert got[n]["lcc"] == pytest.approx(lcc, abs=1e-9), (n,)
    # spot anchors: K4 corners have lcc 1.0; the hub has 0.0
    assert got["a"]["lcc"] == 1.0 and got["hub"]["triangles"] == 0


def test_triangle_counts_partitioning_invariance(spark):
    from tcmkg.pipeline.triangles import triangle_counts

    import random

    rng = random.Random(7)
    pairs = [
        (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}") for _ in range(150)
    ]
    df = spark.createDataFrame(pairs, "subj string, obj string")
    a = sorted(map(tuple, triangle_counts(df).collect()))
    b = sorted(map(tuple, triangle_counts(df.repartition(13)).collect()))
    assert a == b
    want = _py_triangles(pairs)
    assert {(r[0], r[1], r[2]) for r in a} == {
        (n, d, t) for n, (d, t) in want.items()
    }


# ---------------------------------------------------------- prepare stages

def test_prepare_corpus_repetition_and_pii_stages(spark):
    """The opt-in stages: repetition removals happen AFTER quality (and
    are attributed to repetition, not dedup), PII redaction lands in the
    packed text, and the metrics gain the new rows. Defaults keep the
    legacy five-stage behavior (repetition_removed empty, text raw)."""
    from tcmkg.ops.prepare import prepare_corpus

    rows = [
        # quality kill (too short)
        (1, "tiny"),
        # repetition kill: passes quality (stopword, distinct tokens) but
        # duplicates a line
        (2, "the dup line alpha\nthe dup line alpha\nsome unique tail"),
        # near-dup pair: one must be removed by dedup
        (3, "the quick brown fox jumps over the lazy dog again and again ok"),
        (4, "the quick brown fox jumps over the lazy dog again and again yes"),
        # PII carrier, otherwise clean
        (5, "the server of note lives at 192.168.0.1 and answers to admin"),
        # plain keeper
        (6, "a wholly unremarkable document about the weather and the sea"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(
        df, "doc_id", "text", fractions={"train": 1.0}, budget=64,
        repetition=True, pii=True,
    )
    qr = {r["doc_id"]: r["reason"] for r in out["quality_removed"].collect()}
    rr = {r["doc_id"]: r["reason"] for r in out["repetition_removed"].collect()}
    assert set(qr) == {1} and qr[1] == "too_short"
    assert set(rr) == {2} and rr[2] == "dup_line_frac"
    corpus = {r["doc_id"]: r for r in out["corpus"].collect()}
    assert set(corpus) == {3, 5, 6}  # doc 4 lost to dedup, 1/2 to filters
    assert "<IP>" in corpus[5]["text"] and "192.168" not in corpus[5]["text"]
    m = {r["metric"]: r["value"] for r in out["metrics"].collect()}
    assert m["repetition_removed_dup_line_frac"] == 1
    assert m["pii_matches"] == 1 and m["pii_docs"] == 1
    # n_tokens counted on the SCRUBBED text (same token count here)
    assert corpus[5]["n_tokens"] == len(rows[4][1].split(" "))

    # defaults: stage off, empty removal frame, raw text, no new metrics
    legacy = prepare_corpus(df, "doc_id", "text",
                            fractions={"train": 1.0}, budget=64)
    assert legacy["repetition_removed"].count() == 0
    lm = {r["metric"] for r in legacy["metrics"].collect()}
    assert not any(x.startswith(("repetition_", "pii_")) for x in lm)
    lcorpus = {r["doc_id"]: r for r in legacy["corpus"].collect()}
    assert "192.168.0.1" in lcorpus[5]["text"]
    assert set(lcorpus) == {2, 3, 5, 6}  # doc 2 survives without the stage


# --------------------------------------------------------------------- PQ

def _py_pq(vecs, qvecs, m, k, n_iter, topk):
    """Pure-Python replay of the deterministic PQ spec (train/encode/ADC)."""
    ids = sorted(vecs)
    dim = len(vecs[ids[0]])
    dsub = dim // m

    def sub(v, s):
        return v[s * dsub : (s + 1) * dsub]

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    books = [[sub(vecs[i], s) for i in ids[:k]] for s in range(m)]
    for _ in range(n_iter):
        asg = {
            (s, i): min(
                range(k), key=lambda c: (sqd(sub(vecs[i], s), books[s][c]), c)
            )
            for s in range(m)
            for i in ids
        }
        nb = []
        for s in range(m):
            row = []
            for c in range(k):
                members = [sub(vecs[i], s) for i in ids if asg[(s, i)] == c]
                if members:
                    row.append(
                        [
                            _round_half_up(
                                sum(v[p] for v in members) / len(members), 6
                            )
                            for p in range(dsub)
                        ]
                    )
                else:
                    row.append(books[s][c])
            nb.append(row)
        books = nb
    codes = {
        i: [
            min(range(k), key=lambda c: (sqd(sub(vecs[i], s), books[s][c]), c))
            for s in range(m)
        ]
        for i in ids
    }
    out = {}
    for qid, qv in qvecs.items():
        dists = [
            (
                round(
                    sum(sqd(sub(qv, s), books[s][codes[i][s]]) for s in range(m)),
                    6,
                ),
                i,
            )
            for i in ids
        ]
        out[qid] = sorted(dists)[:topk]
    return books, codes, out


def _round_half_up(x, nd):
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal("1e-%d" % nd), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_pq_differential_and_exact_recovery(spark):
    import random

    from tcmkg.ops.pq import pq_encode, pq_search, train_pq

    rng = random.Random(11)
    dim, m, k = 8, 4, 4
    vecs = {
        i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        for i in range(20)
    }
    qvecs = {100 + j: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
             for j in range(3)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    qdf = spark.createDataFrame(
        [(q, v) for q, v in qvecs.items()], "qid long, qv array<double>"
    )
    books = train_pq(df, "vec_id", "embedding", m=m, k=k, n_iter=2)
    pb, pcodes, ptop = _py_pq(vecs, qvecs, m, k, 2, 3)
    for s in range(m):
        for c in range(k):
            assert books[s][c] == pytest.approx(pb[s][c], abs=1e-9), (s, c)
    codes = {r["id"]: list(r["codes"])
             for r in pq_encode(df, books, "vec_id", "embedding").collect()}
    assert codes == pcodes
    got = pq_search(qdf, pq_encode(df, books, "vec_id", "embedding"),
                    books, topk=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["adist"], r["id"]))
    for q, want in ptop.items():
        assert [
            (pytest.approx(d, abs=2e-6), i) for d, i in want
        ] == by_q[q], q

    # exact recovery: corpus of k distinct vectors (repeated) -> zero
    # quantization error, ADC == exact squared L2
    base = [vecs[i] for i in range(k)]
    rep = {i: base[i % k] for i in range(12)}
    rdf = spark.createDataFrame(
        [(i, v) for i, v in rep.items()], "vec_id long, embedding array<double>"
    )
    b2 = train_pq(rdf, "vec_id", "embedding", m=m, k=k, n_iter=2)
    top = pq_search(qdf, pq_encode(rdf, b2, "vec_id", "embedding"),
                    b2, topk=1).collect()
    for r in top:
        qv = qvecs[r["qid"]]
        exact = min(
            round(sum((a - b) ** 2 for a, b in zip(qv, rep[i])), 6)
            for i in rep
        )
        assert r["adist"] == pytest.approx(exact, abs=2e-6)


def test_ivfpq_partial_probe_subset_and_full_probe_equality(spark):
    import random

    from tcmkg.ops.ann import build_ivf
    from tcmkg.ops.pq import ivfpq_search, pq_encode, pq_search, train_pq

    rng = random.Random(23)
    dim, m, k = 8, 4, 4
    vecs = {i: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
            for i in range(40)}
    qvecs = {100 + j: [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
             for j in range(3)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    qdf = spark.createDataFrame(
        [(q, v) for q, v in qvecs.items()], "qid long, qv array<double>"
    )
    cent, assign = build_ivf(df, "vec_id", "embedding", n_centroids=3, n_iter=2)
    books = train_pq(df, "vec_id", "embedding", m=m, k=k, n_iter=2)
    codes = pq_encode(df, books, "vec_id", "embedding").join(assign, "id")

    full = sorted(map(tuple, ivfpq_search(
        qdf, cent, codes, books, nprobe=3, topk=3).collect()))
    pure = sorted(map(tuple, pq_search(
        qdf, pq_encode(df, books, "vec_id", "embedding"), books,
        topk=3).collect()))
    assert full == pure  # full probe == routing no-op

    part = ivfpq_search(qdf, cent, codes, books, nprobe=1, topk=3).collect()
    # partial probe returns only candidates from probed cells, ranked by
    # the same ADC distances the full search assigns them
    full_d = {(r[0], r[1]): r[2] for r in map(tuple, ivfpq_search(
        qdf, cent, codes, books, nprobe=3, topk=40).collect())}
    per_q = {}
    for r in part:
        assert full_d[(r["qid"], r["id"])] == r["adist"]
        per_q.setdefault(r["qid"], []).append(r["adist"])
    for q, ds in per_q.items():
        assert ds == sorted(ds) and len(ds) <= 3


def test_pq_persistence_roundtrip(spark, tmp_path):
    import random

    from tcmkg.ops.pq import load_pq, pq_encode, pq_search, save_pq, train_pq
    from tcmkg.pipeline.checkpoints import CheckpointStore

    rng = random.Random(31)
    df = spark.createDataFrame(
        [(i, [round(rng.uniform(-1, 1), 3) for _ in range(8)])
         for i in range(15)],
        "vec_id long, embedding array<double>",
    )
    qdf = spark.createDataFrame(
        [(9, [0.1] * 8)], "qid long, qv array<double>"
    )
    books = train_pq(df, "vec_id", "embedding", m=4, k=4, n_iter=1)
    codes = pq_encode(df, books, "vec_id", "embedding")
    store = CheckpointStore(str(tmp_path / "pq"))
    save_pq(store, books, codes)
    books2, codes2 = load_pq(spark, store)
    assert books2 == books
    a = sorted(map(tuple, pq_search(qdf, codes, books, topk=3).collect()))
    b = sorted(map(tuple, pq_search(qdf, codes2, books2, topk=3).collect()))
    assert a == b


# ------------------------------------------------------------- sequences

def test_materialize_sequences_order_and_partitioning(spark):
    from tcmkg.ops.sampling import materialize_sequences, pack_greedy

    rows = [(i, f"doc{i} body", 3) for i in range(17)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")
    packed = pack_greedy(df, "doc_id", F.col("n_tokens"), budget=7,
                         shard_col=(F.col("doc_id") % 2))
    seqs = {(r["shard"], r["bin"]): r
            for r in materialize_sequences(packed, "doc_id", "text").collect()}
    # replay: per shard, ids ascending, bins of floor(cum/7)
    import collections
    want = collections.defaultdict(list)
    cum = {0: 0, 1: 0}
    for i in range(17):
        s = i % 2
        want[(s, cum[s] // 7)].append(f"doc{i} body")
        cum[s] += 3
    for k, texts in want.items():
        assert seqs[k]["seq_text"] == "<|eos|>".join(texts), k
        assert seqs[k]["n_docs"] == len(texts)
        assert seqs[k]["n_tokens"] == 3 * len(texts)
    assert set(seqs) == set(want)
    # identical under different input partitioning (array_sort in-row)
    again = {(r["shard"], r["bin"]): r["seq_text"]
             for r in materialize_sequences(
                 packed.repartition(7), "doc_id", "text").collect()}
    assert again == {k: v["seq_text"] for k, v in seqs.items()}


def test_ivfpq_zero_norm_centroid_never_wins_probe(spark):
    """A zero-norm centroid yields NULL cosine everywhere; it must LOSE
    every probe slot (asc_nulls_last), not inherit Spark's ascending
    NULLS FIRST default and hijack nprobe=1 routing."""
    from tcmkg.ops.pq import ivfpq_search, pq_encode, train_pq

    z = [0.0] * 7
    vecs = {0: [0.0] * 8,  # zero vector -> its own degenerate cell 0
            1: [1.0] + z,
            2: [0.9, 0.1] + [0.0] * 6,
            3: z + [1.0]}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    cent = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0, 0.05] + [0.0] * 6),
         (2, [0.0] * 7 + [1.0])],
        "cid int, cvec array<double>",
    )
    assign = spark.createDataFrame(
        [(0, 0), (1, 1), (2, 1), (3, 2)], "id long, cid int"
    )
    books = train_pq(df, "vec_id", "embedding", m=4, k=4, n_iter=1)
    codes = pq_encode(df, books, "vec_id", "embedding").join(assign, "id")
    q = spark.createDataFrame(
        [(9, [1.0] + [0.0] * 7)], "qid long, qv array<double>"
    )
    got = ivfpq_search(q, cent, codes, books, nprobe=1, topk=2).collect()
    # with NULLS FIRST the degenerate cell 0 would be the only probed cell
    # and the answer would be the zero vector; the real nearest cell is 1
    assert {r["id"] for r in got} == {1, 2}


# -------------------------------------------------------- weighted pagerank

def test_weighted_pagerank_vs_pure_python(spark):
    from tcmkg.pipeline.pagerank import pagerank

    edges = [
        ("a", "b", 3.0), ("a", "c", 1.0),  # a spreads 75/25, not 50/50
        ("b", "c", 2.0), ("c", "a", 1.0),
        ("d", "a", 5.0),                   # dangling-free chain into a
        ("e", "a", 1.0), ("e", "e", 2.0),  # self-loop with weight
    ]
    df = spark.createDataFrame(edges, "subj string, obj string, w double")
    got = {r["node"]: r["pagerank"]
           for r in pagerank(df, weight_col="w", iters=6).collect()}

    nodes = {x for e in edges for x in e[:2]}
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    r = {n: 1.0 for n in nodes}
    for _ in range(6):
        nxt = {n: 0.15 for n in nodes}
        for s, t, w in edges:
            nxt[t] += 0.85 * r[s] * w / outw[s]
        r = nxt
    for n in nodes:
        assert got[n] == pytest.approx(round(r[n], 6), abs=2e-6), n
    # weighting actually changes the answer vs the unweighted operator
    unw = {x["node"]: x["pagerank"]
           for x in pagerank(df.select("subj", "obj"), iters=6).collect()}
    assert got["b"] != unw["b"]
