"""Pin the DuckDB float-division semantics every oracle relies on.

The whole try_divide/NULL-parity strategy (EDGE_SWEEP_r7.md) assumes
DuckDB returns NULL for x / 0.  DuckDB >= 1.1 exposes
``ieee_floating_point_ops`` whose default has changed across releases
and, when true, makes ``x / 0.0`` return inf/NaN instead — silently
flipping dozens of oracle parities.  Every oracle connection must call
:func:`pin_float_semantics` right after ``duckdb.connect()`` so the
contract is enforced, not inherited from the installed default
(ADVICE r7 #2).
"""

from __future__ import annotations


def pin_float_semantics(con) -> None:
    """SET ieee_floating_point_ops = false when the installed DuckDB has
    it (>= 1.1; the pinned 1.0.0 predates the setting and already yields
    NULL), then assert the NULL-on-zero-divisor contract so any future
    version bump fails loudly instead of silently re-certifying."""
    import duckdb

    try:
        con.execute("SET ieee_floating_point_ops = false")
    except duckdb.CatalogException:
        # parameter unknown on DuckDB 1.0.x (verified: SET of an unknown
        # parameter raises CatalogException there) — contract checked
        # below. Narrow catch per ADVICE r8 #4: a closed connection
        # (ConnectionException) or transaction error raises its real
        # cause here instead of surfacing later as a confusing
        # contract-violation message.
        pass
    row = con.execute("SELECT 1.0/0.0, 0.0/0.0, 1/0").fetchone()
    if row != (None, None, None):
        import duckdb

        raise RuntimeError(
            "DuckDB oracle contract violated: x/0 must be NULL, got "
            f"{row!r} on duckdb {duckdb.__version__}; the try_divide/NULL "
            "parity strategy (EDGE_SWEEP_r7.md) is unsound on this build"
        )
