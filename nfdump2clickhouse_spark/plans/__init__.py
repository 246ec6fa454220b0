"""Physical-plan inspection (SURVEY §4.2 — 'verify, don't build').

Catalyst gives predicate pushdown, column pruning, broadcast selection,
TakeOrderedAndProject, and partial aggregation for free *if* the query is
expressed declaratively; these helpers let tests assert that the free
optimizations actually fired, so a regression in query formulation (e.g.
a UDF blocking pushdown) fails CI instead of silently costing 100× at
scale."""

from .inspect import (  # noqa: F401
    get_plan,
    has_broadcast_join,
    has_partial_aggregate,
    has_take_ordered,
    has_window_group_limit,
    pushed_filters,
    read_schema_columns,
    unpartitioned_window_specs,
)
