"""IPv4/CIDR column functions (SURVEY §4.3.2).

ClickHouse ships IPv4StringToNum / isIPAddressInRange [P]; Spark has no
builtin, so we derive a numeric `ip_num` and compile CIDR prefixes to
[lo, hi] ranges. Stored as a LongType column at ingest, the range
predicate pushes down to parquet row-group stats — data skipping for
address filters at 100 TB, which a string-typed address can never give.

Pure Column arithmetic — no UDF, stays inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def ipv4_to_num(col: Column) -> Column:
    """Dotted-quad string → uint32-as-long (ClickHouse IPv4StringToNum)."""
    parts = F.split(col, r"\.")
    return (
        parts.getItem(0).cast("bigint") * 16777216
        + parts.getItem(1).cast("bigint") * 65536
        + parts.getItem(2).cast("bigint") * 256
        + parts.getItem(3).cast("bigint")
    )


def num_to_ipv4(col: Column) -> Column:
    """uint32-as-long → dotted-quad string (ClickHouse IPv4NumToString)."""
    return F.concat_ws(
        ".",
        (col / 16777216).cast("bigint") % 256,
        (col / 65536).cast("bigint") % 256,
        (col / 256).cast("bigint") % 256,
        col % 256,
    )


def cidr_range(cidr: str) -> tuple[int, int]:
    """'10.0.0.0/20' → (lo, hi) inclusive numeric bounds."""
    addr, _, bits = cidr.partition("/")
    bits = int(bits) if bits else 32
    o = [int(x) for x in addr.split(".")]
    base = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
    lo = base & mask
    hi = lo | ((1 << (32 - bits)) - 1)
    return lo, hi


def ip_in_cidr(ip_num: Column, cidr: str) -> Column:
    """CIDR membership as a pushdown-friendly range predicate on ip_num
    (ClickHouse isIPAddressInRange)."""
    lo, hi = cidr_range(cidr)
    return (ip_num >= F.lit(lo)) & (ip_num <= F.lit(hi))
