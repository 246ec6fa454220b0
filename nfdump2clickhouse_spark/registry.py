"""Query-key registry backing ``__spark_entry__.py``.

Every operator from SURVEY §2 registers itself here as a (spark_fn,
oracle_sql) pair under its stable query key. ``__spark_entry__.queries()``
and ``oracle_sql()`` are thin views over this registry; the driver compares
each pair via DuckDB at sf0.01 (row-count + schema + value-hash).

Conventions enforced by review (SURVEY §5.3):
- every float output rounded (``round(x, 4)``)
- every computed column aliased identically in Spark and oracle SQL
- no raw ``events.ts`` in hash-checked output (ns vs µs)
- window ORDER BYs carry a unique tiebreaker
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``; ``oracle`` is the DuckDB-equivalent SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        _REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    _load_operators()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {k: s.fn for k, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {k: s.oracle for k, s in all_specs().items() if s.oracle is not None}


_loaded = False


def _load_operators() -> None:
    """Import every operator module exactly once (triggers registration)."""
    global _loaded
    if _loaded:
        return
    from . import operators  # noqa: F401  (imports all submodules)

    _loaded = True
