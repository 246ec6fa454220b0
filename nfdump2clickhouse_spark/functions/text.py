"""Text-analysis column functions (SURVEY §2.11 + training-data pipeline
extensions): tokenization, shingling, quality stats, fingerprints.

All pure Column expressions (split/transform/filter/aggregate HOFs) —
JVM-side, no UDFs; deterministic and therefore oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# tiny stopword list shared with the oracle SQL (fixture vocab is a word
# soup; 'a'/'the' are its only English stopwords)
STOPWORDS = ("a", "the", "of", "to", "and")


def words(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def shingles(ws: Column, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings; [] when len < n."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(-1)))
    return F.when(F.size(ws) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, (i + k + 1).cast("int")) for k in range(n)]
            ),
        )
    )


def stopword_count(ws: Column) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))


def avg_word_len(ws: Column) -> Column:
    total = F.aggregate(
        F.transform(ws, lambda w: F.length(w).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.size(ws)


def positional_fingerprint(ws: Column) -> Column:
    """Deterministic rolling document fingerprint: sum over positions of
    (pos+1) * (ascii(first char) * 31 + word length). Pure int arithmetic
    so the oracle can reproduce it exactly; the stronger (but
    engine-specific) xxhash64 variant is text_fingerprint_xx (rows-only).
    """
    idx = F.sequence(F.lit(0), F.size(ws) - 1)
    return F.aggregate(
        F.transform(
            idx,
            lambda i: (i + 1).cast("bigint")
            * (
                F.ascii(F.element_at(ws, (i + 1).cast("int"))).cast("bigint") * 31
                + F.length(F.element_at(ws, (i + 1).cast("int"))).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
