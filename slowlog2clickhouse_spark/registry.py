"""Operator registry — the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator from SURVEY.md §2 registers itself here with its op id,
a ``(spark, sf_dir) -> DataFrame`` builder, and (when SQL-expressible)
the equivalent DuckDB oracle SQL. The driver's correctness gate and our
pytest parity suite both iterate this registry, so an op exists exactly
once.

Conventions (SURVEY.md §7 G — keep the DuckDB value-hash exact):
  * lowercase column aliases on BOTH sides, identical names;
  * round order-dependent float aggregates (sum/avg/percentile) to 4
    decimals on both sides; scalar float math is IEEE-deterministic and
    needs no rounding;
  * explicit NULLS FIRST/LAST on every ORDER BY that feeds a LIMIT;
  * unique tiebreak column on every top-k;
  * md5/sha2 are cross-engine stable, xxhash64/hash are not (rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, Op] = {}


def op(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder under a SURVEY.md §2 op id."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate op id: {name}")
        _REGISTRY[name] = Op(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_ops() -> dict[str, Op]:
    _load_all()
    return dict(_REGISTRY)


_LOADED = False


def _load_all() -> None:
    """Import every op module so registration side-effects run."""
    global _LOADED
    if _LOADED:
        return
    from slowlog2clickhouse_spark import operators  # noqa: F401

    _LOADED = True
