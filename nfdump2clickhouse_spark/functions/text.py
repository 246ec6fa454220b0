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
    """Word n-gram shingles as space-joined strings; [] when len < n.

    Formulated as n array slices zipped pairwise (`slice` + `zip_with`)
    rather than `transform` over an index sequence with per-position
    `element_at` — measured ~9× faster (element_at with a non-literal
    index defeats the codegen fast path and re-walks the array), and the
    zero-length slice makes the len<n → [] case fall out for free."""
    length = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    out = F.slice(ws, 1, length)
    for k in range(1, n):
        out = F.zip_with(
            out, F.slice(ws, k + 1, length), lambda x, y: F.concat_ws(" ", x, y)
        )
    return out


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
    # zip positions with words via the 2-arg transform lambda (w, i) —
    # avoids per-position element_at (see shingles() note)
    return F.aggregate(
        F.transform(
            ws,
            lambda w, i: (i + 1).cast("bigint")
            * (F.ascii(w).cast("bigint") * 31 + F.length(w).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
