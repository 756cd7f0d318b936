"""Text-analysis operators over the documents table (BASELINE.json north
star: language-ID, quality scoring, token counting, fingerprinting).

All are pure Spark SQL expressions — no Python UDFs — so they stay inside
whole-stage codegen and scale linearly with document count. Tokenization is
single-space split (the corpus is space-delimited); a regex variant shows
the BPE-ish path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nzgmdb_spark.queries.registry import register
from nzgmdb_spark.tables import tbl

# --- Token counting + quality scoring: length, token stats, punctuation &
# stopword ratios. Ratios are exact double divisions of integers → bit-stable.

QUALITY_SQL = """
WITH toks AS (
  SELECT doc_id, n_chars, lang,
         string_split(text, ' ') AS t,
         length(text) AS len_chars
  FROM documents
)
SELECT doc_id, lang, len_chars,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_tokens,
       CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
       (CAST(len_chars AS DOUBLE) - (len(t) - 1)) / len(t) AS avg_token_len,
       CASE WHEN len(t) >= 20 AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) > 0.3
            THEN 1 ELSE 0 END AS quality_pass
FROM toks
"""


@register("text_quality_score", sql=QUALITY_SQL, survey=["F1", "F5", "P7"], headline=True)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n_tok = F.size(t).cast("bigint")
    n_uniq = F.size(F.array_distinct(t)).cast("bigint")
    ttr = n_uniq.cast("double") / n_tok
    len_chars = F.length("text")
    avg_tok = (len_chars.cast("double") - (n_tok - 1)) / n_tok
    return d.select(
        "doc_id",
        "lang",
        len_chars.alias("len_chars"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        ttr.alias("ttr"),
        avg_tok.alias("avg_token_len"),
        F.when((n_tok >= 20) & (ttr > 0.3), 1).otherwise(0).alias("quality_pass"),
    )


# --- Language ID: marker-token presence votes with a fixed tiebreak order.
# (n-gram heuristic classifier; the `lang` column serves as ground truth to
# report per-language accuracy.)

_MARKERS = {
    "en": ["the", "and", "fast", "slow", "table"],
    "de": ["der", "und", "schnell", "tabelle", "wert"],
    "fr": ["le", "et", "rapide", "table", "valeur"],
    "es": ["el", "y", "rapido", "tabla", "valor"],
}


def _presence_sql(lang: str) -> str:
    return " + ".join(
        f"CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END"
        for w in _MARKERS[lang]
    )


LANGID_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
),
scored AS (
  SELECT doc_id, lang,
         {_presence_sql("en")} AS s_en,
         {_presence_sql("de")} AS s_de,
         {_presence_sql("fr")} AS s_fr,
         {_presence_sql("es")} AS s_es
  FROM toks
),
pred AS (
  SELECT doc_id, lang,
         CASE
           WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
           WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
           WHEN s_fr >= s_es THEN 'fr'
           ELSE 'es'
         END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, count(*) AS n_docs
FROM pred
GROUP BY lang, pred_lang
"""


@register("text_lang_id", sql=LANGID_SQL, survey=["P7", "A2"])
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    scores = {
        lang: sum(
            F.when(F.array_contains(t, w), 1).otherwise(0) for w in words
        )
        for lang, words in _MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"]),
            "en",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]), "de")
        .when(scores["fr"] >= scores["es"], "fr")
        .otherwise("es")
    )
    return (
        d.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- Document fingerprinting: md5 of the normalized text plus a coarse
# 8-hex-char prefix bucket (the rolling-hash fingerprint analog; md5 is
# bit-identical across engines).

FINGERPRINT_SQL = """
SELECT doc_id,
       md5(lower(text)) AS fingerprint,
       substr(md5(lower(text)), 1, 8) AS bucket
FROM documents
"""


@register("text_fingerprint", sql=FINGERPRINT_SQL, survey=["F2", "F3"])
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.col("text")).cast("binary"))
    return d.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("bucket")
    )


# --- Regex token counting (BPE-ish pre-tokenizer: alphanumeric runs).

REGEX_TOKENS_SQL = """
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS BIGINT) AS n_word_tokens,
       CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT)
         AS n_punct_chars
FROM documents
"""


@register("text_regex_tokens", sql=REGEX_TOKENS_SQL, survey=["F5", "P6"])
def text_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), "[^a-z0-9]+")
    n_words = F.size(F.filter(toks, lambda x: x != "")).cast("bigint")
    n_punct = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", "")).cast(
        "bigint"
    )
    return d.select(
        "doc_id", n_words.alias("n_word_tokens"), n_punct.alias("n_punct_chars")
    )


# --- Deterministic train/val/test split: bucket = first 4 hex chars of
# md5(doc_id) mod 100 → 90/5/5. Hash-based assignment is the curation
# primitive that survives reshuffles, re-ingestion, and incremental appends
# (a row's split never depends on what else is in the corpus) — unlike
# randomSplit, which is seed- and partitioning-dependent. Pure map-side;
# no shuffle at any scale.

HASH_SPLIT_SQL = """
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
           % 100 AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


@register("text_hash_split", sql=HASH_SPLIT_SQL, survey=["P8", "F9"])
def text_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("bigint")
        % 100
    )
    return d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


# --- Deterministic stratified rebalancing sample: downsample every source
# to (approximately) HALF the size of the smallest source (a cap below every
# stratum count, so the predicate is exercised even on a balanced corpus),
# keeping a row iff its
# md5 bucket falls under the stratum's integer threshold. Same
# hash-assignment rationale as text_hash_split — membership is a pure
# function of (doc_id, corpus stratum counts), reproducible across runs and
# engines, unlike rand()-based sampling. Plan shape at 100 TB: one
# map-side-combined count aggregation (rows = #sources), a broadcast of
# that tiny threshold dim back onto the scan, and a map-side filter — the
# corpus itself is never shuffled.

STRATIFIED_SAMPLE_SQL = """
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT min(n) AS target_n FROM counts),
b AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000000 AS bucket
  FROM documents
)
SELECT b.doc_id, b.source, b.bucket
FROM b
JOIN counts ON counts.source = b.source
CROSS JOIN t
WHERE b.bucket < floor(500000.0 * t.target_n / counts.n)
"""


@register("text_stratified_sample", sql=STRATIFIED_SAMPLE_SQL, survey=["P7", "J1", "F9"])
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    target = counts.agg(F.min("n").alias("target_n"))
    thresholds = (
        counts.crossJoin(F.broadcast(target))
        .select(
            "source",
            F.floor(500000.0 * F.col("target_n") / F.col("n")).alias("thr"),
        )
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    return (
        d.select("doc_id", "source", bucket.alias("bucket"))
        .join(F.broadcast(thresholds), "source")
        .filter(F.col("bucket") < F.col("thr"))
        .select("doc_id", "source", "bucket")
    )


# --- TF-IDF top terms per document. Ranking is INTEGER-only (tf desc, df
# asc, token asc) so the top-k selection is bit-identical across engines;
# the float tf·idf score is display-only and rounded to 6 dp (ln() can
# differ in the last ulp between libm and the JVM). Plan shape at 100 TB:
# one explode + one (doc, tok) aggregation, a token-keyed df aggregation
# (both map-side partial), a broadcast of the tiny doc-count scalar, and a
# per-doc window — no corpus-sized join.

_TFIDF_TOP_K = 3

TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         floor(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) * 1000000.0 + 0.5)
           / 1000000.0 AS tfidf
  FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN n
)
SELECT doc_id, tok, tf, df, tfidf
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY doc_id ORDER BY tf DESC, df ASC, tok ASC
) <= {_TFIDF_TOP_K}
"""


@register("text_tfidf_top_terms", sql=TFIDF_SQL, survey=["A2", "W3", "O3"])
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from nzgmdb_spark.functions import pround

    d = tbl(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # df derived from tf — each tf row is a distinct (doc, tok), so a count
    # over a tok-partitioned window equals the document frequency. Keeping
    # it a window (not a self-join against a second aggregation) gives one
    # corpus explode and a single linear pipeline: explode → (doc,tok) agg
    # → tok window → doc window. The naive two-branch form explodes the
    # corpus twice — Spark's exchange reuse does not collapse the duplicate
    # subtrees here.
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            pround(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOP_K)
        .select("doc_id", "tok", "tf", "df", "tfidf")
    )


# --- Global vocabulary top-k: most frequent tokens corpus-wide with a
# total-order tie-break (count desc, token asc) so the cut is engine-exact.
# Scale shape: explode → map-side-combined count (intermediate is vocab-
# sized, not corpus-sized) → TakeOrdered top-k (per-partition partial
# top-k, no global sort materialization — Spark plans orderBy+limit as
# TakeOrderedAndProject).

TOP_TOKENS_SQL = """
SELECT tok, count(*) AS n
FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
"""


@register("text_top_tokens", sql=TOP_TOKENS_SQL, survey=["O2", "O3", "A2"])
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
    )


# --- Train/eval decontamination: flag training documents sharing any word
# 3-gram with a val/test document (the deterministic md5 split above).
# A core LLM-data-pipeline gate: benchmark leakage into the training split
# shows up exactly as shingle collisions across the split boundary. Plan:
# one shingle explode over the corpus, split assignment map-side (pure
# function of doc_id), distinct eval-side shingles (the small side at a
# 90/10 split, broadcastable at any scale once distinct), one equi-join on
# the shingle, one count aggregation — no cross-join anywhere.

DECONTAM_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
),
split AS (
  SELECT doc_id,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                   AS BIGINT) % 100 < 90
              THEN 'train' ELSE 'eval' END AS split
  FROM documents
),
marked AS (SELECT sh.doc_id, sh.s, sp.split FROM sh JOIN split sp USING (doc_id)),
eval_sh AS (SELECT DISTINCT s FROM marked WHERE split = 'eval')
SELECT m.doc_id, count(*) AS n_shared_shingles
FROM marked m JOIN eval_sh e ON e.s = m.s
WHERE m.split = 'train'
GROUP BY m.doc_id
"""


@register("text_decontaminate", sql=DECONTAM_SQL, survey=["P4", "A2", "J13"])
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nzgmdb_spark.queries.dedup import _grams_hashed, _tokenized_docs

    toks = _tokenized_docs(spark, sf_dir)
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    marked = toks.select(
        "doc_id",
        F.when(bucket < 90, "train").otherwise("eval").alias("split"),
        # 8-byte hashed shingle keys through the train↔eval overlap join
        # (output is per-doc counts — never the shingle itself); the
        # text-twin equivalence is pinned for the shared helper in
        # tests/test_corpus_stats.py.
        F.explode(_grams_hashed()).alias("s"),
    )
    eval_sh = marked.filter(F.col("split") == "eval").select("s").distinct()
    return (
        marked.filter(F.col("split") == "train")
        .join(eval_sh, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )
