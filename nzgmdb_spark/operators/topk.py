"""Batch-scalable exact per-key top-k (VERDICT r7 ask #7).

The ANN operators rank every scored (query, vector) pair and keep the k
best per query. The obvious plan — ``row_number() OVER (PARTITION BY
q_id ORDER BY score DESC, id)`` — buffers and sorts an ENTIRE query's
scored rows inside one task: fine at 5 fixture queries, but the per-task
working set is corpus-sized per query no matter how large the batch, and
a small batch leaves all but |queries| shuffle partitions idle.

``grouped_topk`` replaces the window with two hash aggregations:

1. per (key, input-partition) — collect the partition's rows for the
   key, sort with the (score desc, id asc) comparator, slice k. The
   buffered group is bounded by the INPUT PARTITION size (a tunable),
   not by corpus-rows-per-query, and every core participates whatever
   the batch size.
2. per key — flatten the ≤ partitions × k survivors, re-sort, slice k.
   The second exchange carries only |keys| × partitions × k rows.

Exchange volume of stage 1 equals the window's single exchange (every
scored row moves once either way — the rows themselves are the ranking
input); what changes is the peak per-task buffer and the parallelism.
The comparator is a total order (ids are unique), so the result is
bit-identical to the window form — property-tested, and every consumer's
oracle hash pins it again at sf0.01.

Double comparisons in the comparator treat -0.0 == 0.0 (IEEE order via
``<``/``>``), matching SQL ORDER BY on the same doubles; NaN scores are
the caller's responsibility (cosines here are never NaN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame,
    score_col: str,
    id_col: str,
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Global top-k by (score desc, id asc) with 1..k rank numbers.

    The obvious plan — ``row_number() OVER (ORDER BY score DESC)`` then
    ``rank <= k`` — funnels EVERY scored row through one task. This shape
    instead lets ``orderBy().limit(k)`` compile to TakeOrderedAndProject
    (per-partition bounded heap + driver merge of the k-heads), so no task
    ever buffers more than its own partition; the row_number window that
    assigns rank values then runs over <= k rows, which is a constant, not
    the corpus. (score desc, id asc) is a total order when ids are unique,
    so the result is bit-identical to the window form.
    """
    order = [F.col(score_col).desc(), F.col(id_col)]
    top = df.orderBy(*order).limit(k)
    return top.withColumn(rank_name, F.row_number().over(Window.orderBy(*order)))


def grouped_topk(
    df: DataFrame,
    key_col: str,
    score_col: str,
    id_col: str,
    k: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Top-k rows per ``key_col`` ordered by (score desc, id asc).

    Returns columns ``(key_col, score_col, id_col, *carry_cols)`` with
    original names; row order within a key is the ranking order.
    """
    fields = [score_col, id_col, *carry_cols]
    s = "named_struct(" + ", ".join(f"'{c}', {c}" for c in fields) + ")"
    cmp = (
        f"(l, r) -> CASE WHEN l.{score_col} > r.{score_col} THEN -1 "
        f"WHEN l.{score_col} < r.{score_col} THEN 1 "
        f"WHEN l.{id_col} < r.{id_col} THEN -1 "
        f"WHEN l.{id_col} > r.{id_col} THEN 1 ELSE 0 END"
    )
    part = df.groupBy(key_col, F.spark_partition_id().alias("_pid")).agg(
        F.expr(f"slice(array_sort(collect_list({s}), {cmp}), 1, {k})").alias(
            "_t"
        )
    )
    best = part.groupBy(key_col).agg(
        F.expr(
            f"slice(array_sort(flatten(collect_list(_t)), {cmp}), 1, {k})"
        ).alias("_t")
    )
    return best.select(key_col, F.explode("_t").alias("_s")).select(
        key_col, *[F.col(f"_s.{c}").alias(c) for c in fields]
    )
