"""Semantic property tests for the corpus-stats / containment / PCA
operators — each pins the CLAIM the operator exists for, on a corpus
constructed to exhibit it (the oracle-parity suite already pins exact
values on the shared testdata)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nzgmdb_spark.queries import load_registry
from tests.conftest import SF_SMALL


def _toks_df(spark, docs: dict[int, list[str]]):
    rows = [(i, w) for i, w in docs.items()]
    return spark.createDataFrame(rows, "doc_id bigint, w array<string>")


def test_cdc_chunks_are_shift_robust(spark):
    """THE reason content-defined chunking exists: inserting a token at
    the head of a document must leave every chunk after the first
    boundary identical (so chunk-level dedup still matches), whereas
    fixed-stride segments all shift and match nothing."""
    from nzgmdb_spark.queries.corpus_stats import _SEG_LEN, _cdc_chunk_rows

    rng = random.Random(7)
    base = [f"w{rng.randrange(200)}" for _ in range(240)]
    docs = {0: base, 1: ["INSERTED"] + base}
    chunks = _cdc_chunk_rows(_toks_df(spark, docs)).collect()
    by_doc: dict[int, list] = {0: [], 1: []}
    for r in chunks:
        by_doc[r.doc_id].append((r.chunk_idx, r.s))
    a = {s for _, s in by_doc[0]}
    b = {s for _, s in by_doc[1]}
    assert len(a) > 4, "corpus too short to produce multiple CDC chunks"
    # all of doc 0's chunks except (at most) its head chunk reappear
    # verbatim in the shifted doc
    assert len(a & b) >= len(a) - 1, (a - b, b - a)

    # contrast: fixed 16-token segments share (at most) a tail fragment
    segs = {}
    for d, w in docs.items():
        segs[d] = {
            " ".join(w[i : i + _SEG_LEN]) for i in range(0, len(w), _SEG_LEN)
        }
    assert len(segs[0] & segs[1]) <= 1


def test_containment_detects_planted_subdocument(spark):
    """A short doc fully embedded in a long one: containment >= 0.8 fires
    on the (short -> long) direction while Jaccard at 0.5 stays silent —
    the signal this operator adds over dedup_ngram_jaccard."""
    from nzgmdb_spark.queries.dedup import (
        _containment_pairs,
        _jaccard_pairs,
        _pair_counts,
    )

    rng = random.Random(11)
    inner = [f"a{rng.randrange(50)}" for _ in range(30)]
    outer = inner + [f"b{rng.randrange(50, 99)}" for _ in range(90)]
    other = [f"c{rng.randrange(100, 150)}" for _ in range(60)]
    toks = _toks_df(spark, {0: inner, 1: outer, 2: other})

    got = _containment_pairs(_pair_counts(toks)).collect()
    directed = {(r.doc_src, r.doc_dst): r.containment for r in got}
    assert (0, 1) in directed and directed[(0, 1)] >= 0.99
    assert (1, 0) not in directed  # big doc is NOT contained in small
    jac = _jaccard_pairs(toks).collect()
    assert not any({r.doc_a, r.doc_b} == {0, 1} for r in jac), (
        "Jaccard at 0.5 should miss the planted inclusion (union is "
        "dominated by the long doc)"
    )


def test_segment_rewrite_keeps_exactly_distinct_segments(spark):
    """Global keep-first invariant: total kept segments == number of
    distinct segment texts in the corpus, and every doc's counts are
    internally consistent."""
    reg = load_registry()
    out = reg["dedup_segment_rewrite"].fn(spark, SF_SMALL).collect()
    total_kept = sum(r.n_kept for r in out)

    from nzgmdb_spark.queries.corpus_stats import _SEG_LEN
    from nzgmdb_spark.queries.dedup import _tokenized_docs

    seg = _tokenized_docs(spark, SF_SMALL).select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w), {_SEG_LEN}), "
                f"i -> array_join(slice(w, i, {_SEG_LEN}), ' '))"
            )
        ).alias("s")
    )
    n_distinct = seg.distinct().count()
    assert total_kept == n_distinct
    assert all(0 <= r.n_kept <= r.n_segs for r in out)


def test_temperature_sampling_quota_properties(spark):
    """alpha=0.5 temperature quotas: selected counts hit min(quota, n_l)
    exactly, the total is within rounding of the half-corpus budget, and
    quota order follows language frequency order (monotonicity)."""
    from nzgmdb_spark.tables import tbl

    reg = load_registry()
    out = reg["sample_temperature_mixture"].fn(spark, SF_SMALL).toPandas()
    docs = tbl(spark, SF_SMALL, "documents").groupBy("lang").count().toPandas()
    n_by_lang = dict(zip(docs["lang"], docs["count"]))
    budget = sum(n_by_lang.values()) // 2

    sel = out.groupby("lang")["doc_id"].count().to_dict()
    import math

    sw = sum(math.sqrt(n) for n in n_by_lang.values())
    for lang, n in n_by_lang.items():
        quota = int(math.floor(budget * (math.sqrt(n) / sw) + 0.5))
        assert sel.get(lang, 0) == min(quota, n), lang
    assert abs(sum(sel.values()) - budget) <= len(n_by_lang)
    # monotone: more documents -> no smaller selection
    langs = sorted(n_by_lang, key=n_by_lang.get)
    for lo, hi in zip(langs, langs[1:]):
        assert sel.get(lo, 0) <= sel.get(hi, 0) or n_by_lang[lo] == n_by_lang[hi]


def test_pca_power_iter_matches_numpy_and_is_unit_norm(spark):
    """Independent-implementation check: the registered two-matvec power
    step must agree with a numpy float64 replication (same md5 start
    vector) to ~1e-6, and the output component must be unit-norm."""
    import numpy as np
    import pyarrow.parquet as pq

    reg = load_registry()
    out = reg["embedding_pca_power_iter"].fn(spark, SF_SMALL).toPandas()
    got = out.sort_values("dim")["pc1"].to_numpy()
    assert abs(float(np.sum(got * got)) - 1.0) < 1e-4

    t = pq.read_table(f"{SF_SMALL}/embeddings.parquet")
    X = np.array([list(v) for v in t["embedding"].to_pylist()], dtype=np.float64)
    Xc = X - X.mean(axis=0, keepdims=True)
    import hashlib

    v0 = np.array(
        [
            "0123456789abcdef".index(
                hashlib.md5(f"pca_{i}".encode()).hexdigest()[0]
            )
            + 1
            - 8.5
            for i in range(64)
        ]
    )
    z = Xc.T @ (Xc @ v0)
    ref = z / np.linalg.norm(z)
    assert np.max(np.abs(ref - got)) < 1e-5, np.max(np.abs(ref - got))


def test_simhash_hamming_block_join_is_exact(spark):
    """Pigeonhole guarantee: the 4-block equi-join must surface EVERY
    pair within Hamming distance 3 — verified against a brute-force
    popcount over all signature pairs at sf0.001."""
    from itertools import combinations

    from nzgmdb_spark.queries.dedup import (
        _SH_RADIUS,
        dedup_simhash_hamming,
    )

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_simhash_hamming(spark, SF_SMALL).collect()
    }

    # independent brute force over the signatures themselves
    from nzgmdb_spark.queries import load_registry  # noqa: F401  (registry warm)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    from nzgmdb_spark.queries.dedup import SIMHASH_HAMMING_SQL

    sig_sql = SIMHASH_HAMMING_SQL.split("blocks AS")[0].rstrip().rstrip(",")
    sigs = dict(con.execute(sig_sql + " SELECT doc_id, sh FROM sigs").fetchall())
    expect = {}
    for a, b in combinations(sorted(sigs), 2):
        h = bin(sigs[a] ^ sigs[b]).count("1")
        if h <= _SH_RADIUS:
            expect[(a, b)] = h
    assert got == expect
    assert len(expect) > 0, "fixture produced no hamming<=3 pairs (vacuous)"


def test_duplicate_spans_hashed_equals_text(spark):
    """The registered text_duplicate_spans shuffles xxhash64 span keys
    (~10x fewer exchange bytes); grouping by hash must reproduce the
    text-key twin (the oracle's shape) EXACTLY on the test corpus —
    any 64-bit collision would merge two span groups and show here."""
    from tests.conftest import SF_MEDIUM

    from nzgmdb_spark.queries.corpus_stats import _duplicate_spans

    def frame(hashed):
        df = _duplicate_spans(spark, SF_MEDIUM, hashed=hashed).toPandas()
        return df.sort_values("doc_id").reset_index(drop=True)

    hashed, text = frame(True), frame(False)
    assert len(hashed) > 0, "vacuous: no duplicated spans in fixture"
    assert hashed.equals(text)


def test_ngram_pair_counts_hashed_equals_text(spark):
    """The registered Jaccard/containment family ships xxhash64 shingle
    keys through the posting-list exchange (8 bytes vs ~25 bytes of gram
    text — the repo's widest sf10 memory peak); grouping by hash must
    reproduce the text-keyed twin (the oracle's shape) EXACTLY on the
    test corpus — a 64-bit collision would merge posting lists (inflating
    n_common) or shrink a doc's distinct-gram count, and show here."""
    from tests.conftest import SF_MEDIUM

    from nzgmdb_spark.queries.dedup import _pair_counts, _tokenized_docs

    toks = _tokenized_docs(spark, SF_MEDIUM)

    def frame(hashed):
        df = _pair_counts(toks, hashed=hashed).toPandas()
        return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    hashed, text = frame(True), frame(False)
    assert len(hashed) > 0, "vacuous: no co-shingled pairs in fixture"
    assert hashed.equals(text)


def test_bigram_perplexity_hashed_equals_text(spark):
    """The registered text_bigram_perplexity ships (doc_id, xxhash64(w1,w2))
    through the corpus-sized score-lookup exchange; keying by hash must
    reproduce the string-keyed twin (the oracle's shape) EXACTLY on the
    test corpus — a 64-bit collision would misroute a bigram's score and
    show up in avg_nll here."""
    from tests.conftest import SF_MEDIUM

    from nzgmdb_spark.queries.corpus_stats import _bigram_nll

    def frame(hashed):
        df = _bigram_nll(spark, SF_MEDIUM, hashed=hashed).toPandas()
        return df.sort_values("doc_id").reset_index(drop=True)

    hashed, text = frame(True), frame(False)
    assert len(hashed) > 0, "vacuous: empty bigram scoring output"
    assert hashed.equals(text)


def _write_retrieval_corpus(spark, root):
    """Tiny planted corpus for the BM25/RRF property tests: documents +
    matching embeddings under one sf-dir layout."""
    filler = " ".join(f"tok{i}" for i in range(10))
    docs = [
        # doc 0 is the RRF seed vector's doc; neutral text (no query terms)
        (0, filler, "en", "seed", 0),
        # doc 1: tf('spark')=10 in a 100-token doc
        (1, " ".join(["spark"] * 10 + ["pad"] * 90), "en", "a", 0),
        # doc 2: tf=1 in a 100-token doc
        (2, " ".join(["spark"] * 1 + ["pad"] * 99), "en", "a", 0),
        # doc 3: tf=10 but 1000 tokens — length-normalized below doc 1
        (3, " ".join(["spark"] * 10 + ["pad"] * 990), "en", "a", 0),
        # doc 4: keyword-only hit (vector orthogonal to the seed)
        (4, " ".join(["spark"] * 5 + ["pad"] * 95), "en", "a", 0),
        # doc 5: both-lists doc — keyword hit AND near the seed vector
        (5, " ".join(["spark"] * 6 + ["pad"] * 94), "en", "a", 0),
        # doc 6: vector-only hit (no query terms)
        (6, filler, "en", "a", 0),
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s, _ in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/documents.parquet")
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],   # seed
        5: [0.9, 0.1, 0.0, 0.0],   # closest to seed
        6: [0.8, 0.2, 0.0, 0.0],   # second closest
        1: [-1.0, 0.0, 0.0, 0.0],  # anti-correlated: bottom of the vector list
        2: [0.0, 0.0, 1.0, 0.0],
        3: [0.0, 0.0, 0.0, 1.0],
        4: [0.0, -1.0, 0.0, 0.0],
    }
    spark.createDataFrame(
        [(i, v, 0) for i, v in sorted(vecs.items())],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{root}/embeddings.parquet")


def test_bm25_saturation_and_length_norm(spark, tmp_path):
    """The two properties BM25 adds over TF-IDF, planted: (a) term-
    frequency saturation — 10x the tf must yield far less than 10x the
    score; (b) length normalization — same tf in a 10x-longer doc must
    score lower."""
    from nzgmdb_spark.queries.curation import _bm25_per_doc

    root = str(tmp_path / "sf")
    _write_retrieval_corpus(spark, root)
    per_doc, total = _bm25_per_doc(spark, root)
    scores = {
        r["doc_id"]: r["s"]
        for r in per_doc.select("doc_id", total.alias("s")).collect()
    }
    assert scores[1] > scores[2], "more in-doc hits must score higher"
    assert scores[1] < 10 * scores[2] * 0.5, (
        f"tf saturation violated: tf=10 scored {scores[1]:.3f} vs "
        f"tf=1 {scores[2]:.3f} (ratio {scores[1]/scores[2]:.1f}, "
        "expected well under 10)"
    )
    assert scores[1] > scores[3], "same tf in a 10x-longer doc must score lower"


def test_rrf_both_lists_beats_single_list(spark, tmp_path):
    """A document that appears in BOTH ranklists (keyword hit + near the
    seed vector) must out-fuse documents that top only one list — the
    defining property of reciprocal-rank fusion."""
    from nzgmdb_spark.queries.curation import retrieval_hybrid_rrf

    root = str(tmp_path / "sf")
    _write_retrieval_corpus(spark, root)
    rows = retrieval_hybrid_rrf(spark, root).orderBy("rank").collect()
    assert rows, "vacuous: empty fusion output"
    top = rows[0]
    assert top["doc_id"] == 5, f"expected both-lists doc 5 first, got {top}"
    assert top["rank_kw"] is not None and top["rank_vec"] is not None
    # every fused row carries at least one source rank
    assert all(
        r["rank_kw"] is not None or r["rank_vec"] is not None for r in rows
    )
    # fused scores are non-increasing in rank
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
