"""Wave-14 operators (round 2): binary embedding retrieval and the
cross-method dedup overlap report.

Same SURVEY §5.3 conventions as waves 4-13.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type hints
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..functions.similarity import as_double
from ..registry import register


@register("emb_binarize_hamming")  # rows-only: binary retrieval quality is
# probabilistic; the recall-vs-cosine contract is pinned in tests
def emb_binarize_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary embedding retrieval: sign-bit quantization packs each
    64-dim vector into ONE bigint (32× smaller than float32), and
    nearest neighbors come from Hamming distance = bit_count(a XOR b) —
    single-instruction similarity. The sign-random-projection result is
    what makes this principled: E[hamming]/bits ≈ angle/π, so Hamming
    ranking approximates cosine ranking (`dedup_simhash` applies the
    same idea to text; this is the embedding-retrieval form, the
    standard first-stage filter before float rescoring).

    Shapes: packing is a row-local HOF fold (zero shuffle); the demo
    ranks 8 query vectors against the corpus via a broadcast nested-loop
    on the PACKED column — 8 bytes/row streamed through bit_count, the
    affordable brute force; at billions of rows the same packed column
    feeds multi-index Hamming buckets (split the 64 bits into 4×16-bit
    band keys — identical banding math to `dedup_simhash`)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    def pack(arr):  # fold acc*2 + signbit — 32 bits fit a bigint ANSI-safe
        return F.aggregate(
            arr,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc * 2 + F.when(x > 0, 1).otherwise(0),
        )

    packed = e.select(
        "vec_id",
        pack(F.slice("emb", 1, 32)).alias("code_hi"),
        pack(F.slice("emb", 33, 32)).alias("code_lo"),
    )
    packed = packed.localCheckpoint()  # reused by both join sides
    queries = packed.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("code_hi").alias("q_hi"),
        F.col("code_lo").alias("q_lo"),
    )
    cand = queries.join(
        F.broadcast(packed).withColumnRenamed("vec_id", "neighbor_id"),
        F.col("query_id") != F.col("neighbor_id"),
    ).select(
        "query_id",
        "neighbor_id",
        (
            F.bit_count(F.col("q_hi").bitwiseXOR(F.col("code_hi")))
            + F.bit_count(F.col("q_lo").bitwiseXOR(F.col("code_lo")))
        ).alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "hamming")
    )


@register("dedup_method_overlap")  # rows-only: summarizes 3 pipelines, two
# of which are banding-based (not SQL-expressible); invariants in tests
def dedup_method_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup bake-off report: run the exact n-gram Jaccard, pure
    MinHash-LSH, and SimHash pipelines over the same corpus and tabulate
    pairwise agreement — (method_a, method_b, n_a, n_b, n_both). This is
    the table that answers 'which near-dup method do we ship?' with
    recall-vs-cost evidence instead of folklore (and at 100 TB it runs
    on a sampled shard first, same code).

    Each method's pair set is tiny (near-dup pairs, not the corpus), so
    the overlap matrix is cheap unions/joins of the already-reduced
    outputs; the expensive parts are the three pipelines themselves,
    shapes audited under their own keys."""
    from .dedup_extra import dedup_ngram_jaccard, dedup_simhash
    from .wave5 import dedup_minhash_pure

    methods = {
        "jaccard08": dedup_ngram_jaccard(spark, sf_dir).filter(
            F.col("jaccard") >= 0.8
        ),
        "minhash": dedup_minhash_pure(spark, sf_dir),
        "simhash": dedup_simhash(spark, sf_dir),
    }
    sets = {
        name: df.select("id1", "id2").distinct().localCheckpoint()
        for name, df in methods.items()
    }
    rows = []
    names = sorted(sets)
    counts = {n: sets[n].count() for n in names}
    for i, a in enumerate(names):
        for b in names[i:]:
            both = (
                sets[a].join(sets[b], ["id1", "id2"]).count()
                if a != b
                else counts[a]
            )
            rows.append((a, b, counts[a], counts[b], both))
    return spark.createDataFrame(
        rows, "method_a string, method_b string, n_a long, n_b long, n_both long"
    )


@register(
    "text_unicode_nfc",
    oracle="""
    WITH s AS (
      SELECT event_id, event_type,
             substr(event_type, 1, 1)
               || CASE event_id % 3 WHEN 0 THEN chr(769)   -- combining acute
                                   WHEN 1 THEN chr(776)   -- combining diaeresis
                                   ELSE '' END
               || substr(event_type, 2) AS decorated
      FROM events
    ),
    n AS (
      SELECT event_type, event_id % 3 AS accent,
             length(decorated) AS len_before,
             length(nfc_normalize(decorated)) AS len_after
      FROM s
    )
    SELECT event_type, accent, COUNT(*) AS n,
           CAST(SUM(len_before) AS BIGINT) AS chars_before,
           CAST(SUM(len_after) AS BIGINT) AS chars_after,
           CAST(count_if(len_after < len_before) AS BIGINT) AS n_composed
    FROM n GROUP BY event_type, accent
    """,
)
def text_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the preprocessing step every text
    dedup/fingerprint pipeline needs BEFORE hashing: 'é' as one
    codepoint and 'e'+combining-acute are byte-different but canonically
    equal, so un-normalized corpora leak duplicates past every
    hash-based method in the family. The fixture is ASCII, so canonical-
    equivalence pairs are synthesized by injecting combining marks
    (accent ∈ {acute, diaeresis, none} by event_id); normalization
    composes them and the per-(type, accent) audit counts the composed
    rows — DuckDB's native nfc_normalize is the cross-engine referee.

    Spark has no built-in NFC, so this is a justified Python case
    (unicodedata in an Arrow-batched pandas UDF — the §2.10 slow-path
    policy); at 100 TB normalization is one row-local pass fused into
    ingest, never a separate job."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x) if x else x)

    e = table(spark, sf_dir, "events")
    accent = F.col("event_id") % 3
    mark = (
        F.when(accent == 0, F.lit("́"))
        .when(accent == 1, F.lit("̈"))
        .otherwise(F.lit(""))
    )
    decorated = F.concat(
        F.substring("event_type", 1, 1), mark, F.expr("substring(event_type, 2)")
    )
    s = e.select(
        "event_type",
        accent.alias("accent"),
        F.length(decorated).alias("len_before"),
        F.length(nfc(decorated)).alias("len_after"),
    )
    return s.groupBy("event_type", "accent").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("len_before").alias("chars_before"),
        F.sum("len_after").alias("chars_after"),
        F.count_if(F.col("len_after") < F.col("len_before")).alias(
            "n_composed"
        ),
    )
