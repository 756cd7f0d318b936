"""Query registry: every entry pairs a Spark DataFrame program with an
ANSI-SQL oracle (DuckDB-runnable) over the same tables.

This is the engine's correctness surface: one entry per operator family in
SURVEY.md §2 (names carry the survey IDs), plus the large-scale
data-pipeline operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

import importlib

from nzgmdb_spark.queries.registry import REGISTRY, QuerySpec, register  # noqa: F401

_MODULES = (
    "nzgmdb_spark.queries.tpch",
    "nzgmdb_spark.queries.tpch_sub",
    "nzgmdb_spark.queries.relational",
    "nzgmdb_spark.queries.relational_ext",
    "nzgmdb_spark.queries.geo",
    "nzgmdb_spark.queries.sources_io",
    "nzgmdb_spark.queries.kernels_catalog",
    "nzgmdb_spark.queries.remote_sources",
    "nzgmdb_spark.queries.multimodal",
    "nzgmdb_spark.queries.windows",
    "nzgmdb_spark.queries.timeseries",
    "nzgmdb_spark.queries.text",
    "nzgmdb_spark.queries.dedup",
    "nzgmdb_spark.queries.similarity",
    "nzgmdb_spark.queries.sketches",
    "nzgmdb_spark.queries.scale_ops",
    "nzgmdb_spark.queries.curation",
    "nzgmdb_spark.queries.corpus_stats",
    "nzgmdb_spark.queries.training_prep",
)


def load_registry() -> dict[str, QuerySpec]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return REGISTRY
