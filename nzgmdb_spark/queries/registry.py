from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → rows-only check
    survey: tuple[str, ...] = ()  # SURVEY.md §2 operator IDs this query covers
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    sql: str | None = None,
    survey: tuple[str, ...] | list[str] = (),
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, sql=sql, survey=tuple(survey), headline=headline
        )
        return fn

    return deco
