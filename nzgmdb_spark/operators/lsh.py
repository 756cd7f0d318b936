"""Skew-hardened LSH band-bucket candidate generation (VERDICT r4 ask #5).

The band-bucket self-join is the scale-safe core of every LSH dedup path
— an equi-join on (band, bucket), never all-pairs — but its output is
quadratic IN THE BUCKET: a hot bucket (a 10k-duplicate flood, a constant
shingle, adversarial collisions) with B members emits B·(B−1)/2
candidate pairs, so one degenerate key turns the candidate stage into
~50M rows and the verify join into the bottleneck. `capped_band_candidates`
bounds this per-bucket blow-up:

- Buckets with ≤ cap members emit the full clique (id_a < id_b) —
  bit-identical to the uncapped join, so the cap is INVISIBLE on
  non-degenerate data (property-tested).
- Oversized buckets emit a STAR around the bucket's minimum id:
  B − 1 pairs instead of B·(B−1)/2. Candidate volume becomes linear in
  the flood size.

Recall-impact bound (documented contract): in an oversized bucket every
member still receives an edge to the bucket representative, so NO
document escapes duplicate marking and connected-component clustering
still unions the whole flood (rep is a shared endpoint). What is lost is
the direct enumeration of non-rep pairs within an oversized bucket: such
a pair (a, b) is emitted only if some OTHER band places them together in
a small-enough bucket or makes one of them a rep. For true near-dups at
the operators' thresholds this is the OR-construction's usual guarantee
across the remaining bands; for the drop-duplicates / clustering
consumers (the dedup pipeline's actual use) there is NO recall loss at
all — star connectivity is sufficient.

Cost model (round-6 rework): the per-bucket count/min were window
functions over the full band relation, which forced an exchange + SORT
of every band row even when NO bucket was hot, and the clique was a
self-join that re-evaluated the (expensive) band/signature lineage —
the cap cost ~25% on clean corpora (BENCH_r05 0.99 s → 1.24 s). Now the
whole operator is ONE hash aggregation: ``collect_list`` packs each
bucket's ids into a sorted array (map-side partial combine, no sort
exec, band lineage evaluated exactly once), singleton buckets — the
overwhelming majority — are filtered before any pair is generated, and
the clique/star pairs are produced map-side with higher-order array
functions (``transform`` over index + ``slice``). No self-join, no
window buffering. Memory bound per task is the largest bucket's id
array — the same bound the window version already had (window count
over a partition key buffers the whole key group), so the rework
strictly removes work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_CAP = 256


def capped_band_candidates(
    bands: DataFrame,
    id_col: str,
    key_cols: list[str],
    cap: int = DEFAULT_BUCKET_CAP,
    a_name: str = "id_a",
    b_name: str = "id_b",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs from a (id, band-key...) relation, hot-bucket capped.

    Returns distinct (a_name, b_name) with a < b. See module docstring
    for the exact clique/star semantics and the recall bound.

    ``payload_cols`` rides per-id columns (must be functionally dependent
    on the id, e.g. the id's signature) through the aggregation so the
    verify stage downstream needs NO re-join against the corpus: each
    payload ``c`` comes back as ``{c}_a`` / ``{c}_b``. The ids stay the
    struct's FIRST field, so ``sort_array`` still orders buckets by id
    and a < b still holds by construction.
    """
    pc = list(payload_cols or [])
    entry = (
        F.struct(F.col(id_col).alias("i"), *[F.col(c) for c in pc])
        if pc
        else F.col(id_col)
    )
    grouped = (
        bands.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(entry)).alias("_ids"))
        .filter(F.size("_ids") >= 2)
    )
    # Clique: for the i-th id, pair with every later id (array is sorted,
    # so a < b by construction). Star: pair the bucket minimum with every
    # other member — B − 1 pairs, linear in the flood size. Built as ONE
    # SQL expression string: the equivalent Column-object/lambda tree
    # costs dozens of py4j round-trips per plan build (~0.1 s of driver
    # wall on every bench iteration); expr() parses it JVM-side in one.
    clique = (
        "flatten(transform(_ids, (x, i) -> "
        "transform(slice(_ids, i + 2, size(_ids) - i - 1), "
        "y -> named_struct('a', x, 'b', y))))"
    )
    star = (
        "transform(slice(_ids, 2, size(_ids) - 1), "
        "y -> named_struct('a', _ids[0], 'b', y))"
    )
    pairs = grouped.select(
        F.explode(
            F.expr(f"CASE WHEN size(_ids) <= {cap} THEN {clique} ELSE {star} END")
        ).alias("_p")
    )
    if pc:
        sel = [F.col("_p.a.i").alias(a_name), F.col("_p.b.i").alias(b_name)]
        sel += [F.col(f"_p.a.{c}").alias(f"{c}_a") for c in pc]
        sel += [F.col(f"_p.b.{c}").alias(f"{c}_b") for c in pc]
    else:
        sel = [F.col("_p.a").alias(a_name), F.col("_p.b").alias(b_name)]
    return (
        pairs.select(*sel)
        # Duplicate ids landing in one bucket would otherwise self-pair.
        # Payloads are id-dependent, so the distinct still dedups pairs.
        .filter(F.col(a_name) < F.col(b_name))
        .distinct()
    )
