"""Local replica of the driver's t2 check: row-count + column-name schema +
order-insensitive value comparison between a Spark result and a DuckDB
oracle result (both as pandas frames)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        # strict: exact double repr — queries must round on both sides
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "∅"
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str) -> None:
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    assert s_cols == o_cols, f"[{key}] schema mismatch: spark={s_cols} oracle={o_cols}"
    assert len(spark_pdf) == len(oracle_pdf), (
        f"[{key}] row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s_rows, o_rows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
        ][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark : {a}\n    oracle: {b}" for i, a, b in diffs
        )
        raise AssertionError(
            f"[{key}] value mismatch ({len(diffs)}+ differing rows of {len(s_rows)}):\n{msg}\n"
            f"  columns: {s_cols}"
        )
