"""IPv6 column-function tests: the (hi, lo) signed-long encoding and CIDR
range predicates must agree exactly with Python's ipaddress module."""

from __future__ import annotations

import ipaddress

import pyspark.sql.functions as F
import pytest

from nfdump2clickhouse_spark.functions.ip import (
    cidr6_range,
    ip6_in_cidr,
    ipv6_to_nums,
)

ADDRS = [
    "::1",
    "2001:db8::8a2e:370:7334",
    "2001:db8:0:0:0:8a2e:370:7334",
    "fe80::",
    "::",
    "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
    "1:2:3:4:5:6:7:8",
    "2001:db8::1",
    "a::b",
    "8000::",
]

CIDRS = ["2001:db8::/32", "fe80::/10", "::/0", "2001:db8::8a2e:370:7334/128", "8000::/1"]


def _expected(addr: str) -> tuple[int, int]:
    v = int(ipaddress.IPv6Address(addr))
    return ((v >> 64) - (1 << 63), (v & ((1 << 64) - 1)) - (1 << 63))


def test_ipv6_encoding_matches_ipaddress(spark):
    df = spark.createDataFrame([(a,) for a in ADDRS], ["addr"])
    hi, lo = ipv6_to_nums(F.col("addr"))
    rows = df.select("addr", hi.alias("hi"), lo.alias("lo")).collect()
    for r in rows:
        assert (r.hi, r.lo) == _expected(r.addr), r.addr


def test_ipv6_encoding_preserves_order(spark):
    df = spark.createDataFrame([(a,) for a in ADDRS], ["addr"])
    hi, lo = ipv6_to_nums(F.col("addr"))
    rows = df.select("addr", hi.alias("hi"), lo.alias("lo")).collect()
    by_int = sorted(ADDRS, key=lambda a: int(ipaddress.IPv6Address(a)))
    by_enc = [r.addr for r in sorted(rows, key=lambda r: (r.hi, r.lo))]
    assert by_enc == by_int


@pytest.mark.parametrize("cidr", CIDRS)
def test_ipv6_cidr_membership_matches_ipaddress(spark, cidr):
    net = ipaddress.IPv6Network(cidr)
    df = spark.createDataFrame([(a,) for a in ADDRS], ["addr"])
    hi, lo = ipv6_to_nums(F.col("addr"))
    got = {
        r.addr: r.hit
        for r in df.select(
            "addr", ip6_in_cidr(hi, lo, cidr).alias("hit")
        ).collect()
    }
    for a in ADDRS:
        assert got[a] == (ipaddress.IPv6Address(a) in net), (a, cidr)


def test_cidr6_range_bounds():
    (lo_hi, lo_lo), (hi_hi, hi_lo) = cidr6_range("2001:db8::/32")
    net = ipaddress.IPv6Network("2001:db8::/32")
    assert (lo_hi + (1 << 63)) << 64 | (lo_lo + (1 << 63)) == int(net.network_address)
    assert (hi_hi + (1 << 63)) << 64 | (hi_lo + (1 << 63)) == int(net.broadcast_address)
