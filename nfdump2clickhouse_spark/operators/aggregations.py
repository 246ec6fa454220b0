"""Aggregation operators (SURVEY §2.4).

The reference's analytical surface is ClickHouse SQL over the flows table
(SURVEY §0 [P]); these keys re-express that surface on the driver fixtures.
Catalyst splits every groupBy into partial (map-side) + final hash
aggregation automatically — at 100 TB the shuffle carries only the
per-group partial states, not rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table
from ..registry import register


@register(
    "agg_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
      ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
      ROUND(AVG(l_discount), 4)                                        AS avg_disc,
      COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 shape = the flows 'traffic per class' query.

    In the reference world this is `SELECT ... sum(ibyt), sum(ipkt) ...
    GROUP BY flowsrc, pr` over nfsen.flows [P]; here on lineitem.
    """
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
