"""UDF / UDAF / UDTF surface (SURVEY §2.10).

The reference's per-file pandas transform [P] generalizes here to Spark's
Python-execution tiers, worst to best for the 100 TB path:
row-at-a-time Python UDF (pickled per row — demonstrated once, never used
in engine hot paths) → Arrow-vectorized pandas UDFs (Series batches) →
grouped applyInPandas / partition-wise mapInPandas → SQL UDTFs.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf, udf, udtf

from ..catalog import table
from ..registry import register


@register(
    "udf_python_scalar",
    oracle="""
    SELECT doc_id, regexp_replace(lower(trim(text)), ' +', ' ', 'g') AS norm
    FROM documents
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow tier — shown for surface parity;
    prefer the pandas variants below)."""

    @udf("string")
    def normalize(s: str) -> str:
        return re.sub(" +", " ", s.strip().lower()) if s is not None else None

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", normalize("text").alias("norm"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS net_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Series→Series pandas UDF over Arrow batches — the
    correct tier when Python is unavoidable (~10-100× the row UDF)."""

    @pandas_udf("double")
    def net_price(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # explicit half-up: pandas .round is half-even, SQL ROUND is not
        import numpy as np

        return np.floor(ext * (1 - disc) * (1 + tax) * 10000 + 0.5) / 10000

    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


@register(
    "udaf_pandas_grouped",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean price."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return round(float((price * qty).sum() / qty.sum()), 4)

    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        wavg("l_extendedprice", "l_quantity").alias("wavg_price")
    )


@register(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           ROUND((value - AVG(value) OVER w) / stddev_samp(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: z-score normalize per user (1 group → n
    rows). pandas std(ddof=1) ≡ stddev_samp."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        # sign-aware half-away rounding: pandas .round is half-even, SQL
        # ROUND is half away from zero — z-scores are signed, so the
        # half-up floor trick needs the sign factored out
        z = np.sign(z) * np.floor(np.abs(z) * 10000 + 0.5) / 10000
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z}
        )

    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, z double"
    )


@register("udtf_map_in_pandas")  # rows-only: partition-wise, order-dependent
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise mapInPandas (n→m rows): batch-filter + derive — the
    shape used for multimodal decode (operators/multimodal.py)."""

    def expensive_rows(batches):
        for pdf in batches:
            out = pdf[pdf["value"] > 100.0].copy()
            out["value_sq"] = out["value"] ** 2
            yield out[["event_id", "user_id", "value_sq"]]

    e = table(spark, sf_dir, "events")
    return e.mapInPandas(expensive_rows, "event_id long, user_id long, value_sq double")


@register(
    "udtf_sql",
    oracle="""
    SELECT doc_id, word, CAST(length(word) AS INTEGER) AS wlen
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 100)
    WHERE word <> ''
    """,
)
def udtf_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥3.5) in a LATERAL join: text → (word, len)."""

    @udtf(returnType="word string, wlen int")
    class SplitWords:
        def eval(self, text: str):
            if text:
                for w in text.split(" "):
                    if w:
                        yield w, len(w)

    spark.udtf.register("split_words", SplitWords)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.wlen
        FROM documents d, LATERAL split_words(d.text) t
        WHERE d.doc_id < 100
        """
    )


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) - 1000.0, 4) AS adj_price
    FROM lineitem
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (Iterator[Series] → Iterator[Series]):
    the per-worker expensive-init amortization pattern — the 'model' (here
    a constant bias standing in for a loaded tokenizer/ONNX session) is
    built ONCE per Python worker, then applied across every Arrow batch
    that worker sees, instead of once per batch as a plain SCALAR pandas
    UDF would."""
    @pandas_udf("double")
    def adj(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bias = 1000.0  # stand-in for expensive one-time init per worker
        for s in batches:
            yield s - bias

    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(adj(net), 4).alias("adj_price"),
    )
