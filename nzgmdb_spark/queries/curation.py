"""Training-data curation battery: the document-quality gates a 100 TB
pretraining pipeline runs between raw scrape and tokenizer, each as a
registered oracle-checked query over the documents table.

1. ``text_repetition_signals`` — Gopher-style within-document repetition
   metrics (modal-bigram fraction, duplicated-trigram fraction) with a
   keep/drop flag. Repetitious documents are the single biggest quality
   leak in scraped corpora; the metrics are one explode + two per-doc
   aggregations, map-side combinable, linear in corpus size.
2. ``text_pii_scrub`` — regex PII redaction (emails, phone numbers) with
   per-document match counts and the redacted text fingerprint. The query
   stages deterministic PII into the synthetic corpus first (doc_id
   arithmetic), so the redaction path is exercised non-vacuously and both
   engines rebuild the identical staged input.
3. ``text_domain_cap`` — per-domain document cap (keep the top-k docs per
   source by quality rank), the standard Common-Crawl-style guard against
   a single domain dominating the corpus. One shuffle on the domain key,
   one window, deterministic tie-break.
4. ``text_sequence_packing`` — per-shard contiguous packing of documents
   into fixed-capacity token windows (the curation → tokenizer handoff):
   no global sort, integer-exact, one shuffle on the shard key.
5. ``text_chunk_overlap`` — 64-token / stride-48 overlapping chunking
   (the RAG / embedding-window shape): zero-shuffle map-side generate +
   slice with md5 chunk fingerprints.
6. ``text_global_shuffle_rank`` — seeded deterministic epoch permutation
   WITHOUT a global window: per-bucket distributed ranks + a broadcast
   256-row prefix-sum reproduce the naive global row_number exactly.
7. ``text_weighted_sample`` — Efraimidis–Spirakis weighted sampling
   without replacement (top-k per language by ln(u)/w, u a counter-based
   md5 uniform, w the token count): single-pass, seeded, one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nzgmdb_spark.functions import pround
from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.queries.similarity import _NORMS_CTE
from nzgmdb_spark.tables import tbl

# ---------------------------------------------------------------------------
# Repetition signals. Fractions are ratios of BIGINT counts (exact on both
# engines); rounded via the portable floor(x·1e6 + 0.5)/1e6 formula.

REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS gs(i)
),
tri AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS gs(i)
),
bistat AS (
  SELECT doc_id, max(c) AS max_bi, sum(c) AS n_bi
  FROM (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g)
  GROUP BY doc_id
),
tristat AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri,
         sum(c) AS n_tri
  FROM (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT b.doc_id,
       floor(CAST(b.max_bi AS DOUBLE) / b.n_bi * 1000000.0 + 0.5) / 1000000.0
         AS top_bigram_frac,
       floor(CAST(t.dup_tri AS DOUBLE) / t.n_tri * 1000000.0 + 0.5) / 1000000.0
         AS dup_trigram_frac,
       (CAST(b.max_bi AS DOUBLE) / b.n_bi <= 0.05
        AND CAST(t.dup_tri AS DOUBLE) / t.n_tri <= 0.05) AS keep
FROM bistat b JOIN tristat t ON b.doc_id = t.doc_id
"""


def _run_stats(sorted_arr):
    """(max_run, n_in_runs_gt1) over a SORTED string array in ONE
    codegen'd higher-order fold: max_run equals the max per-value
    multiplicity, and n_in_runs_gt1 the total occurrences of values that
    appear more than once — the two repetition statistics — without any
    explode, per-gram shuffle, or per-doc groupBy. The `run > 0` guard
    keeps the empty-string init sentinel from merging with a first gram
    that happens to be empty."""
    same = lambda acc, x: (x == acc["prev"]) & (acc["run"] > 0)  # noqa: E731
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(same(acc, x), acc["run"] + 1).otherwise(1).alias("run"),
        F.greatest(
            acc["best"],
            F.when(same(acc, x), acc["run"] + 1).otherwise(1),
        ).alias("best"),
        # occurrences inside >1-runs: the 2nd element of a run adds 2
        # (itself + the retroactive first), later elements add 1
        (
            acc["dup"]
            + F.when(same(acc, x), F.when(acc["run"] == 1, 2).otherwise(1))
            .otherwise(0)
        ).alias("dup"),
    )
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup"),
    )
    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(
            acc["best"].alias("best"), acc["dup"].alias("dup")
        ),
    )


@register("text_repetition_signals", sql=REPETITION_SQL, survey=["A4", "F1"])
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality gate (Gopher §A.1.1 analog).

    Plan: MAP-ONLY. Both signals are per-doc statistics of the doc's own
    n-gram multiset, so no gram ever needs to leave its row: bigrams and
    trigrams are array transforms, sorted in place, and each reduced by
    the single-fold _run_stats (max multiplicity = longest equal-run of
    the sorted array; duplicated-occurrence count = elements in runs
    longer than 1). Zero shuffles at any corpus size — the previous shape
    exploded both gram streams through two (doc_id, gram) aggregations
    and a join, paying four corpus-token-proportional exchanges for what
    is row-local arithmetic. Oracle SQL unchanged (same fractions from
    DuckDB's explode/GROUP BY formulation), so the value-hash contract
    pins the fold's equivalence."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    ngram = lambda n: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.size("t") - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at("t", i + k) for k in range(n)]
        ),
    )
    bi_stats = _run_stats(F.array_sort(ngram(2)))
    tri_stats = _run_stats(F.array_sort(ngram(3)))
    base = d.select(
        "doc_id",
        (F.size("t") - 1).cast("bigint").alias("n_bi"),
        (F.size("t") - 2).cast("bigint").alias("n_tri"),
        bi_stats["best"].alias("max_bi"),
        tri_stats["dup"].alias("dup_tri"),
    )
    top_frac = F.col("max_bi").cast("double") / F.col("n_bi")
    dup_frac = F.col("dup_tri").cast("double") / F.col("n_tri")
    return base.select(
        "doc_id",
        pround(top_frac, 6).alias("top_bigram_frac"),
        pround(dup_frac, 6).alias("dup_trigram_frac"),
        ((top_frac <= 0.05) & (dup_frac <= 0.05)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing. Deterministic PII is staged into every even doc_id (one
# email + one phone appended), so redaction is exercised on exactly half
# the corpus and both engines agree on the staged input byte-for-byte.

_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "\\+[0-9]{2}-[0-9]{2}-[0-9]{6}"

PII_SQL = f"""
WITH staged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example or +64-21-'
                   || lpad(CAST(doc_id AS VARCHAR), 6, '0')
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
       md5(regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM staged
"""


@register("text_pii_scrub", sql=PII_SQL, survey=["F3", "P6"])
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction: match counts + redacted-text fingerprint.

    Pure map-side scalar pipeline — zero shuffles at any scale; the regex
    subset used (char classes, bounded repeats) behaves identically under
    Java regex (Spark) and RE2 (DuckDB).
    """
    d = tbl(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example or +64-21-"),
                F.lpad(F.col("doc_id").cast("string"), 6, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return staged.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PHONE_RE)).alias("n_phones"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Per-domain cap: keep the top-k documents per source by quality rank
# (longest first, doc_id tie-break — fully deterministic).

_DOMAIN_CAP = 10

DOMAIN_CAP_SQL = f"""
SELECT doc_id, source, rn AS domain_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
WHERE rn <= {_DOMAIN_CAP}
"""


@register("text_domain_cap", sql=DOMAIN_CAP_SQL, survey=["W4", "O3"])
def text_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap documents per domain: one shuffle on source, one window pass.

    At 100 TB the per-domain top-k should use the rank-pushdown the
    window's row_number() <= k filter gets from Spark's
    WindowGroupLimit optimization — the limit is applied inside the sort,
    before materializing each domain's full partition.
    """
    d = tbl(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id", "source", F.row_number().over(w).alias("domain_rank")
        )
        .filter(F.col("domain_rank") <= _DOMAIN_CAP)
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram: per-type value distribution in one aggregation pass.
# Bin edges are constants, so binning is map-side arithmetic and the
# whole histogram is a single partial-aggregated groupBy — the only
# shape that profiles a 100 TB measure column without a sort. floor on
# doubles is exact for these magnitudes; the overflow bin is clamped.

_HIST_LO = 0.0
_HIST_W = 25.0
_HIST_N = 20

HISTOGRAM_SQL = f"""
SELECT event_type,
       CAST(LEAST(floor((value - {_HIST_LO}) / {_HIST_W}), {_HIST_N - 1})
            AS BIGINT) AS bin,
       count(*) AS n,
       floor(min(value) * 1000000.0 + 0.5) / 1000000.0 AS bin_min,
       floor(max(value) * 1000000.0 + 0.5) / 1000000.0 AS bin_max
FROM events
GROUP BY 1, 2
"""


@register("a_histogram_buckets", sql=HISTOGRAM_SQL, survey=["A2", "A8"])
def a_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    bin_ = F.least(
        F.floor((F.col("value") - F.lit(_HIST_LO)) / F.lit(_HIST_W)),
        F.lit(_HIST_N - 1),
    ).cast("bigint")
    return e.groupBy("event_type", bin_.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.min("value"), 6).alias("bin_min"),
        pround(F.max("value"), 6).alias("bin_max"),
    )


# ---------------------------------------------------------------------------
# TF-IDF search ranking: a fixed term set scored against the corpus — the
# retrieval half of a mini search engine. The term filter lands BEFORE any
# aggregation (at scale: a posting-list read for 3 terms, never a corpus
# scan per query), document frequencies come from the same filtered
# explode, and the per-document score adds the (≤3) term weights in FIXED
# written order so both engines produce bit-identical doubles.

_SEARCH_TERMS = ("spark", "window", "vector")

_TERM_W_SQL = ", ".join(
    f"max(CASE WHEN tok = '{t}' THEN tfidf END) AS w{i}"
    for i, t in enumerate(_SEARCH_TERMS)
)

SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
hits AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM toks WHERE tok IN {str(tuple(_SEARCH_TERMS))}
  GROUP BY doc_id, tok
),
df AS (SELECT tok, count(*) AS df FROM hits GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT h.doc_id, h.tok,
         h.tf * ln((n.n_docs + 1.0) / (d.df + 1.0)) AS tfidf
  FROM hits h JOIN df d ON d.tok = h.tok CROSS JOIN n
),
per_doc AS (
  SELECT doc_id, {_TERM_W_SQL} FROM scored GROUP BY doc_id
)
SELECT doc_id,
       floor((COALESCE(w0, 0.0) + COALESCE(w1, 0.0) + COALESCE(w2, 0.0))
             * 1000000.0 + 0.5) / 1000000.0 AS score,
       row_number() OVER (
         ORDER BY COALESCE(w0, 0.0) + COALESCE(w1, 0.0) + COALESCE(w2, 0.0)
                  DESC, doc_id
       ) AS rank
FROM per_doc
QUALIFY rank <= 10
"""


@register("text_search_topk", sql=SEARCH_SQL, survey=["O3", "A2", "F1"])
def text_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hits = (
        toks.filter(F.col("tok").isin(*_SEARCH_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df over the already-filtered hits: each (doc, tok) row is distinct.
    dfreq = hits.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        hits.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("tfidf"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(F.col("tok") == t, F.col("tfidf"))
            ).alias(f"w{i}")
            for i, t in enumerate(_SEARCH_TERMS)
        ]
    )
    total = (
        F.coalesce(F.col("w0"), F.lit(0.0))
        + F.coalesce(F.col("w1"), F.lit(0.0))
        + F.coalesce(F.col("w2"), F.lit(0.0))
    )
    # ranked_topk: TakeOrderedAndProject + a <=k-row rank window, never a
    # hit-set-sized single-partition sort (hits of a common term are
    # corpus-correlated).
    from nzgmdb_spark.operators.topk import ranked_topk

    top = ranked_topk(
        per_doc.select("doc_id", total.alias("_score")), "_score", "doc_id", 10
    )
    return top.select(
        "doc_id", pround(F.col("_score"), 6).alias("score"), "rank"
    )


# ---------------------------------------------------------------------------
# Unigram log-probability scoring: the perplexity-filter shape (KenLM-style
# quality gating, reduced to its unigram core so both engines can rebuild
# it exactly). The "model" is the corpus's own unigram distribution — one
# aggregation; scoring is an equi-join of the token stream against the
# broadcast-size vocabulary and a per-doc mean of ln p(tok). Per-token
# logs are cast to DECIMAL(38,12) before summation so the per-doc mean is
# order-independent and hash-identical cross-engine.

UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
total AS (SELECT count(*) AS n FROM toks),
scored AS (
  SELECT t.doc_id,
         CAST(ln(CAST(v.c AS DOUBLE) / total.n) AS DECIMAL(38, 12)) AS lp
  FROM toks t JOIN vocab v ON v.tok = t.tok CROSS JOIN total
)
SELECT doc_id,
       floor(CAST(sum(lp) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0
         AS avg_logprob,
       count(*) AS n_tokens
FROM scored
GROUP BY doc_id
"""


@register("text_unigram_logprob", sql=UNIGRAM_LOGPROB_SQL, survey=["A2", "F9"])
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(F.col("c").cast("double") / F.col("n"))
            .cast("decimal(38,12)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        pround(
            F.sum("lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_logprob"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


# --- Sequence packing: assign documents to fixed-capacity token windows —
# the step between curation and tokenizer that turns a document corpus
# into training contexts. Packing is PER SHARD (doc_id % 32): each shard
# orders its docs deterministically and packs greedily by cumulative token
# count (a doc's window = its start offset // capacity, the standard
# contiguous-grouping semantic). That is the production shape at 100 TB —
# no global sort, one shuffle on the shard key, window state never leaves
# the shard — and it is integer-exact, so the DuckDB oracle hash-matches
# bit-for-bit. fill_ratio divides by 2^11, exact in doubles.

_PACK_CAP = 2048

PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id, doc_id % 32 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
pos AS (
  SELECT doc_id, shard, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
  FROM toks
)
SELECT shard, CAST(start_off // {_PACK_CAP} AS BIGINT) AS window_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS packed_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       CAST(SUM(n_tok) AS DOUBLE) / {_PACK_CAP}.0 AS fill_ratio
FROM pos GROUP BY shard, start_off // {_PACK_CAP}
"""


@register("text_sequence_packing", sql=PACKING_SQL, survey=["W1", "A4", "F9"])
def text_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % 32).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pos = toks.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        pos.groupBy(
            "shard", F.floor(F.col("start_off") / F.lit(_PACK_CAP)).alias("window_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("packed_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            (F.sum("n_tok").cast("double") / F.lit(float(_PACK_CAP))).alias(
                "fill_ratio"
            ),
        )
    )


# --- Overlapping chunking (RAG / embedding-window shape): split each doc
# into 64-token windows at stride 48, tail partials included. Pure
# map-side generate + slice — ZERO shuffle, linear in corpus, the chunker
# you run before embedding 100 TB. Chunk fingerprints are md5 of the
# joined tokens, identical strings on both engines.

_CHUNK_LEN, _CHUNK_STRIDE = 64, 48

CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
chunks AS (
  SELECT doc_id, n, g.i AS chunk_id,
         t[g.i * {_CHUNK_STRIDE} + 1 : g.i * {_CHUNK_STRIDE} + {_CHUNK_LEN}] AS c
  FROM toks, UNNEST(generate_series(0, (n - 1) // {_CHUNK_STRIDE})) AS g(i)
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(c) AS INT) AS chunk_tokens,
       c[1] AS first_tok, c[len(c)] AS last_tok,
       md5(array_to_string(c, ' ')) AS chunk_fp
FROM chunks
"""


@register("text_chunk_overlap", sql=CHUNK_SQL, survey=["F1", "F3", "F5"])
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    toks = d.select("doc_id", t.alias("t"), n.alias("n"))
    exploded = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.col("n") - 1) / _CHUNK_STRIDE).cast("int"))
        ).alias("chunk_id"),
    )
    c = F.slice(F.col("t"), F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_LEN)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("int"),
        F.size(c).cast("int").alias("chunk_tokens"),
        F.element_at(c, 1).alias("first_tok"),
        F.element_at(c, -1).alias("last_tok"),
        F.md5(F.concat_ws(" ", c).cast("binary")).alias("chunk_fp"),
    )


# --- Seeded global shuffle rank WITHOUT a global window: the training-data
# "deterministic epoch permutation". A naive row_number() OVER (ORDER BY
# hash) funnels the corpus through one partition; the scalable form ranks
# within 256 hash buckets (distributed windows) and adds a broadcast
# prefix-sum of bucket sizes — the same total order, no single-partition
# stage. The oracle is the naive global row_number, proving the
# decomposition exact.

_SHUFFLE_SEED = "epoch42"

SHUFFLE_SQL = f"""
WITH h AS (
  SELECT doc_id,
         md5(concat('{_SHUFFLE_SEED}_', CAST(doc_id AS VARCHAR))) AS hx
  FROM documents
)
SELECT doc_id, hx,
       CAST(row_number() OVER (ORDER BY hx, doc_id) AS BIGINT) AS shuffle_pos
FROM h
"""


@register("text_global_shuffle_rank", sql=SHUFFLE_SQL, survey=["O1", "A4", "F2"])
def text_global_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.md5(
            F.concat(F.lit(f"{_SHUFFLE_SEED}_"), F.col("doc_id").cast("string")).cast(
                "binary"
            )
        ).alias("hx"),
    )
    bucketed = h.withColumn("bucket", F.substring("hx", 1, 2))
    w = Window.partitionBy("bucket").orderBy("hx", "doc_id")
    ranked = bucketed.withColumn("in_bucket_rank", F.row_number().over(w))
    sizes = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    wpre = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    # 256-row dimension: the global prefix-sum window is over a BROADCAST-
    # scale frame, not the corpus
    prefix = sizes.select(
        "bucket", F.coalesce(F.sum("bn").over(wpre), F.lit(0)).alias("before")
    )
    return ranked.join(F.broadcast(prefix), "bucket").select(
        "doc_id",
        "hx",
        (F.col("before") + F.col("in_bucket_rank")).cast("bigint").alias("shuffle_pos"),
    )


# --- Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
# per-language top-k documents by key ln(u)/w where u is a counter-based
# md5 uniform and w = token count — the standard way to sample training
# data proportional to length/quality without a second pass or rejection.
# Deterministic (seeded by doc_id), one shuffle on the stratum key, rank
# pushdown via WindowGroupLimit; both engines compute identical doubles.

_WS_SEED = "ws7"
_WS_K = 5
_TWO52 = float(1 << 52)

WEIGHTED_SAMPLE_SQL = f"""
WITH w AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         (CAST(CAST(('0x' || substr(md5(concat('{_WS_SEED}_',
              CAST(doc_id AS VARCHAR))), 1, 13)) AS BIGINT) AS DOUBLE) + 0.5)
           / {_TWO52!r} AS u
  FROM documents
),
keyed AS (
  SELECT doc_id, lang, n_tok, ln(u) / n_tok AS es_key FROM w
)
SELECT lang, doc_id, n_tok,
       floor(es_key * 1000000.0 + 0.5) / 1000000.0 AS es_key
FROM keyed
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY es_key DESC, doc_id
) <= {_WS_K}
"""


@register("text_weighted_sample", sql=WEIGHTED_SAMPLE_SQL, survey=["A1", "O3", "F9"])
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{_WS_SEED}_"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_TWO52)
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    keyed = d.select(
        "doc_id", "lang", n_tok.alias("n_tok"), (F.log(u) / n_tok).alias("es_key")
    )
    w = Window.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WS_K)
        .select("lang", "doc_id", "n_tok", pround(F.col("es_key"), 6).alias("es_key"))
    )


# --- DSIR importance selection (Xie et al. 2023, arXiv:2302.03169): the
# published data-selection recipe — hashed n-gram bag features, importance
# weight p_target/p_raw per document from two smoothed bucket
# distributions, Gumbel-perturbed top-k resampling. Here the "target
# domain" is a deterministic corpus slice (doc_id % 20 = 0, the stand-in
# for a Wikipedia-quality target set) and the raw distribution is the
# whole corpus; both engines derive identical doubles (integer counts →
# one double division → ln), per-feature log-ratios are cast to
# DECIMAL(38,12) before the per-doc sum so reduction order is irrelevant,
# and the Gumbel noise is the counter-based md5 uniform already used by
# the CCLD kernel (kernels/ccld_sql.py template).
#
# Plan shape at 100 TB: feature hashing is map-side; the two bucket
# distributions are one aggregation each over the hashed feature stream
# (4096-row result); the log-ratio table broadcasts to score every doc in
# a single map-side join + groupBy — no corpus-wide shuffle beyond the
# per-doc aggregation. Top-k is TakeOrderedAndProject (heap, not a global
# sort).

_DSIR_BUCKETS = 4096
_DSIR_K = 200
_DSIR_TGT_MOD = 20

DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, UNNEST(t) AS f FROM toks
    UNION ALL
    SELECT doc_id, t[i] || '_' || t[i + 1] AS f
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
  )
),
tgt AS (
  SELECT b, count(*) AS c FROM feats WHERE doc_id % {_DSIR_TGT_MOD} = 0 GROUP BY b
),
raw AS (SELECT b, count(*) AS c FROM feats GROUP BY b),
tot AS (
  SELECT (SELECT count(*) FROM feats WHERE doc_id % {_DSIR_TGT_MOD} = 0) AS nt,
         (SELECT count(*) FROM feats) AS nr
),
lograt AS (
  SELECT r.b,
         CAST(ln(CAST(COALESCE(t.c, 0) + 1 AS DOUBLE)
                 / (tot.nt + {_DSIR_BUCKETS}))
              - ln(CAST(r.c + 1 AS DOUBLE) / (tot.nr + {_DSIR_BUCKETS}))
           AS DECIMAL(38, 12)) AS lr
  FROM raw r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tot
),
logw AS (
  SELECT f.doc_id, sum(l.lr) AS lw, count(*) AS nf
  FROM feats f JOIN lograt l ON l.b = f.b
  GROUP BY f.doc_id
),
keyed AS (
  SELECT doc_id, lw, nf,
         CAST(lw AS DOUBLE) / nf AS alr,
         lw + CAST(-ln(-ln(
             (CAST(('0x' || substr(md5('dsir_' || CAST(doc_id AS VARCHAR)), 1, 13))
                   AS BIGINT) + 0.5) / 4503599627370496.0))
           AS DECIMAL(38, 12)) AS gk
  FROM logw
)
SELECT doc_id,
       floor(CAST(lw AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS log_weight,
       floor(alr * 1000000.0 + 0.5) / 1000000.0 AS avg_log_ratio,
       floor(CAST(gk AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS gumbel_key
FROM keyed
QUALIFY row_number() OVER (ORDER BY alr DESC, doc_id) <= {_DSIR_K}
"""


@register("dsir_importance_select", sql=DSIR_SQL, survey=["A2", "F9", "J1", "O3"])
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    toks = d.select("doc_id", t.alias("t"))
    unis = toks.select("doc_id", F.explode("t").alias("f"))
    # size(t) == 1 would make sequence(1, 0) raise under ANSI mode; such docs
    # simply contribute no bigrams.
    bis = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> concat(element_at(t, i), '_', element_at(t, i + 1)))"
            )
        ).alias("f"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("f").cast("binary")), 1, 8), 16, 10)
        .cast("bigint") % _DSIR_BUCKETS
    )
    feats = unis.unionByName(bis).select("doc_id", bucket.alias("b"))
    tgt = (
        feats.filter(F.col("doc_id") % _DSIR_TGT_MOD == 0)
        .groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    )
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tot = feats.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum((F.col("doc_id") % _DSIR_TGT_MOD == 0).cast("bigint")).alias("nt"),
    )
    lograt = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                    / (F.col("nt") + F.lit(_DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("cr") + 1).cast("double")
                    / (F.col("nr") + F.lit(_DSIR_BUCKETS))
                )
            ).cast("decimal(38,12)").alias("lr"),
        )
    )
    logw = (
        feats.join(F.broadcast(lograt), "b")
        .groupBy("doc_id")
        .agg(F.sum("lr").alias("lw"), F.count(F.lit(1)).alias("nf"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("dsir_"), F.col("doc_id").cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_TWO52)
    keyed = logw.select(
        "doc_id",
        "lw",
        (F.col("lw").cast("double") / F.col("nf")).alias("alr"),
        (F.col("lw") + (-F.log(-F.log(u))).cast("decimal(38,12)")).alias("gk"),
    )
    # Selection ranks by the per-feature MEAN log-ratio, not the raw sum:
    # the paper scores fixed-length chunks, where the two are equivalent;
    # on variable-length documents the raw sum is length-dominated (a
    # short doc accumulates fewer negative terms than a target-like long
    # one), and the mean is the length-invariant form — measured on
    # sf0.01 it puts all 25 target-slice docs in the top 50 where the raw
    # sum ranked them by length. The raw weight and the paper's
    # Gumbel-perturbed resampling key still ride along as outputs.
    # Top-K via orderBy().limit(): TakeOrderedAndProject (per-partition
    # bounded heap + driver merge), not a corpus-wide single-partition
    # row_number window — same rows, (alr desc, doc_id) is a total order.
    return (
        keyed.orderBy(F.col("alr").desc(), "doc_id")
        .limit(_DSIR_K)
        .select(
            "doc_id",
            pround(F.col("lw").cast("double"), 6).alias("log_weight"),
            pround(F.col("alr"), 6).alias("avg_log_ratio"),
            pround(F.col("gk").cast("double"), 6).alias("gumbel_key"),
        )
    )


# ---------------------------------------------------------------------------
# Okapi BM25 (k1 = 1.2, b = 0.75) over the fixed search-term set — the
# probabilistic upgrade of text_search_topk's TF-IDF ranking: term-
# frequency saturation (a 100-hit doc is not 100× more relevant than a
# 10-hit doc) and document-length normalization (long docs stop winning
# on raw counts). Robertson-style non-negative idf,
# ln(1 + (N − df + ½)/(df + ½)). Plan shape matches TF-IDF: the term
# filter lands BEFORE any aggregation (at 100 TB: a posting-list read
# for 3 terms, never a per-query corpus scan), document length is
# computed map-side from the text column (zero extra shuffle), df and
# the corpus length stats are broadcast scalars, and the (≤3) per-term
# weights add in FIXED written order so both engines produce
# bit-identical doubles.

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10

# Per-term weight, written ONCE and substituted into both engines'
# expressions with identical operator order/associativity:
#   idf(t) * (tf * 2.2) / (tf + k1 * (0.25 + 0.75 * dl / avgdl))
_BM25_W_SQL = (
    "ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))"
    " * (h.tf * 2.2)"
    " / (h.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))"
)

_BM25_PIVOT_SQL = ", ".join(
    f"max(CASE WHEN tok = '{t}' THEN w END) AS w{i}"
    for i, t in enumerate(_SEARCH_TERMS)
)

_BM25_TOTAL_SQL = " + ".join(
    f"COALESCE(w{i}, 0.0)" for i in range(len(_SEARCH_TERMS))
)

_BM25_CORE_CTE = f"""
toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
hits AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM toks WHERE tok IN {str(tuple(_SEARCH_TERMS))}
  GROUP BY doc_id, tok
),
df AS (SELECT tok, count(*) AS df FROM hits GROUP BY tok),
scored AS (
  SELECT h.doc_id, h.tok, {_BM25_W_SQL} AS w
  FROM hits h
  JOIN df d ON d.tok = h.tok
  JOIN dl l ON l.doc_id = h.doc_id
  CROSS JOIN stats s
),
per_doc AS (SELECT doc_id, {_BM25_PIVOT_SQL} FROM scored GROUP BY doc_id)
"""

BM25_SQL = f"""
WITH {_BM25_CORE_CTE}
SELECT doc_id,
       floor(({_BM25_TOTAL_SQL}) * 1000000.0 + 0.5) / 1000000.0 AS score,
       row_number() OVER (
         ORDER BY {_BM25_TOTAL_SQL} DESC, doc_id
       ) AS rank
FROM per_doc
QUALIFY rank <= {_BM25_TOPK}
"""


def _bm25_per_doc(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, object]:
    """(per_doc frame with w0..wN pivot columns, total-score Column) —
    the shared core of the BM25 and hybrid-RRF rankers."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # Document length map-side from the text column — no aggregation.
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    hits = (
        toks.filter(F.col("tok").isin(*_SEARCH_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = hits.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # hits is df-bounded (docs containing ≥1 query term); the dl join is
    # an equi-join the optimizer can run broadcast from the hits side
    # when the posting lists are small, or shuffled when they aren't —
    # either way nothing here scans the corpus per query.
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    w = (
        idf
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (F.lit(0.25) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        hits.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", w.alias("w"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("tok") == t, F.col("w"))).alias(f"w{i}")
            for i, t in enumerate(_SEARCH_TERMS)
        ]
    )
    total = None
    for i in range(len(_SEARCH_TERMS)):
        term = F.coalesce(F.col(f"w{i}"), F.lit(0.0))
        total = term if total is None else total + term
    return per_doc, total


@register("text_search_bm25", sql=BM25_SQL, survey=["O3", "A2", "F9"])
def text_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.operators.topk import ranked_topk

    per_doc, total = _bm25_per_doc(spark, sf_dir)
    # Same TakeOrdered shape as text_search_topk: the hit set is posting-
    # list-bounded but corpus-correlated for common terms — never worth a
    # single-partition rank window.
    top = ranked_topk(
        per_doc.select("doc_id", total.alias("_score")),
        "_score",
        "doc_id",
        _BM25_TOPK,
    )
    return top.select(
        "doc_id", pround(F.col("_score"), 6).alias("score"), "rank"
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009):
# fuse the BM25 keyword top-20 with an embedding-cosine top-20 (seeded
# by doc 0's vector — the "more-like-this" shape) through
# score(d) = Σ_lists 1/(60 + rank_d). RRF is the standard production
# fusion for keyword+vector retrieval because it needs no score
# calibration between the two lists — only ranks. Plan shape: the two
# ranklists are tiny (≤ depth rows each) regardless of corpus size, so
# the fusion itself is a broadcast-size full-outer join; all the heavy
# lifting happens inside the two upstream retrievers, which keep their
# own documented 100 TB shapes (BM25: posting-list read; cosine:
# one corpus pass here, or the IVF/PQ index path when approximate
# recall is acceptable — the fusion is retriever-agnostic). The
# embeddings table covers a vec_id prefix of the doc_id space at scale
# (partial embedding coverage), which the full-outer fusion handles by
# construction.

_RRF_C = 60  # Cormack et al.'s k — dampens the head of each list
_RRF_DEPTH = 20
_RRF_TOPK = 10

_RRF_CONTRIB_SQL = (
    f"COALESCE(1.0 / ({_RRF_C} + k.rank_kw), 0.0)"
    f" + COALESCE(1.0 / ({_RRF_C} + v.rank_vec), 0.0)"
)

RRF_SQL = f"""
WITH {_BM25_CORE_CTE},
{_NORMS_CTE.strip()},
qdims AS (SELECT dim, v AS qv FROM dims WHERE vec_id = 0),
dots AS (
  SELECT d.vec_id AS c_id,
         CAST(sum(CAST(q.qv * d.v AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM qdims q JOIN dims d ON q.dim = d.dim
  WHERE d.vec_id <> 0
  GROUP BY d.vec_id
),
vrank AS (
  SELECT c_id AS id,
         row_number() OVER (
           ORDER BY dot / (nq.nrm * nv.nrm) DESC, c_id
         ) AS rank_vec
  FROM dots
  JOIN norms nq ON nq.vec_id = 0
  JOIN norms nv ON nv.vec_id = c_id
  QUALIFY rank_vec <= {_RRF_DEPTH}
),
krank AS (
  SELECT doc_id AS id,
         row_number() OVER (
           ORDER BY {_BM25_TOTAL_SQL} DESC, doc_id
         ) AS rank_kw
  FROM per_doc
  QUALIFY rank_kw <= {_RRF_DEPTH}
)
SELECT COALESCE(k.id, v.id) AS doc_id,
       k.rank_kw,
       v.rank_vec,
       floor(({_RRF_CONTRIB_SQL}) * 100000000.0 + 0.5) / 100000000.0
         AS rrf_score,
       row_number() OVER (
         ORDER BY {_RRF_CONTRIB_SQL} DESC, COALESCE(k.id, v.id)
       ) AS rank
FROM krank k FULL OUTER JOIN vrank v ON v.id = k.id
QUALIFY rank <= {_RRF_TOPK}
"""


@register("retrieval_hybrid_rrf", sql=RRF_SQL, survey=["O3", "J9", "A2"])
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.queries.similarity import _wide, _wide_dot

    from nzgmdb_spark.operators.topk import ranked_topk

    per_doc, total = _bm25_per_doc(spark, sf_dir)
    krank = ranked_topk(
        per_doc.select(F.col("doc_id").alias("kid"), total.alias("_ks")),
        "_ks",
        "kid",
        _RRF_DEPTH,
        rank_name="rank_kw",
    ).select("kid", "rank_kw")

    e = _wide(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    dots = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("id"),
            (_wide_dot("qv", "v") / (F.col("qn") * F.col("nrm"))).alias("cosine"),
        )
    )
    # vrank was the corpus-sized window (every embedding's cosine through
    # one row_number task); ranked_topk bounds the rank window at DEPTH
    # rows behind a TakeOrderedAndProject.
    vrank = ranked_topk(dots, "cosine", "id", _RRF_DEPTH, rank_name="rank_vec").select(
        "id", "rank_vec"
    )

    fused = krank.join(vrank, krank.kid == vrank.id, "full_outer")
    contrib = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_C) + F.col("rank_kw")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_C) + F.col("rank_vec")), F.lit(0.0))
    # fused is <= 2*DEPTH rows by construction; route the fusion rank
    # through the same TakeOrdered shape anyway so no global window
    # survives in the plan.
    scored = fused.select(
        F.coalesce("kid", "id").alias("doc_id"),
        "rank_kw",
        "rank_vec",
        pround(contrib, 8).alias("rrf_score"),
        contrib.alias("_rrf"),
    )
    return ranked_topk(scored, "_rrf", "doc_id", _RRF_TOPK).select(
        "doc_id", "rank_kw", "rank_vec", "rrf_score", "rank"
    )
