"""Approximate-nearest-neighbor search over the embedding column
(driver-mandated extension): brute-force cosine top-k as the correctness
baseline, IVF cell-probing as the scale path.

At 100 TB: the query set broadcasts against a partitioned vector table;
IVF assignment is one broadcast join against the centroid table (k×dim,
tiny), and probing touches only the probed cells' partitions — write the
vector table partitioned by cell id to get partition pruning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import table
from ..functions.similarity import as_double, cosine, dot
from ..registry import register


@register(
    "ann_cosine_topk",
    oracle="""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
    QUALIFY ROW_NUMBER() OVER
      (PARTITION BY q.vec_id ORDER BY cos_sim DESC, c.vec_id) <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 neighbors for a 10-query batch — the exactness
    baseline every ANN variant is measured against. Ranking uses the
    rounded similarity + id tiebreak (SURVEY §5.3).

    r11 (guide §1.2 per-task work): ‖q‖ and ‖c‖ are hoisted out of the
    per-pair expression — each row's norm is computed ONCE on its own
    side of the join instead of re-folding the 64-dim aggregate for
    every (query, candidate) pair, cutting the pair-stage HOF work to
    the dot product alone (~⅓ of the folds; measured −20% at sf0.1).
    Same float-op order per value, so cos_sim is bit-identical — a
    norm is a deterministic function of the row, wherever evaluated."""
    from ..functions.similarity import l2_norm

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    e = e.withColumn("nrm", l2_norm(F.col("emb")))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("cemb"),
        F.col("nrm").alias("cn"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qemb"), F.col("cemb")) / (F.col("qn") * F.col("cn")), 4
            ).alias("cos_sim"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def _nearest_cells(emb_col, cb, n):
    """The n nearest codebook cells of `emb_col` as a sorted
    literal-codebook argmin — pure Column expression, zero Exchange.
    ‖emb‖² is the same for every cell, so ranking only needs
    ‖c‖² − 2·emb·c; the per-cell ‖c‖² is folded to a Python float at
    plan-build time. Struct comparison is lexicographic ⇒ (score asc,
    cell asc) — a deterministic tiebreak.

    The codebook rides as ONE nested-array literal + a HOF over it (not
    k×dim expanded per-value literals): the maths and float-op order are
    identical, but the expression tree shrinks ~1000× — which matters
    because Lloyd training recompiles this expression every iteration
    (the expanded form spent ~2s/iteration in janino at k=8, dim=64)."""
    CB = F.lit([[float(v) for v in c] for c in cb])  # k x dim, one literal
    N2 = F.lit([float(sum(v * v for v in c)) for c in cb])  # per-cell ‖c‖²
    scored = F.zip_with(
        CB,
        F.sequence(F.lit(0), F.lit(len(cb) - 1)),
        lambda c, j: F.struct(
            (F.element_at(N2, j + 1) - 2 * dot(emb_col, c)).alias("score"),
            j.cast("int").alias("cell"),
        ),
    )
    return F.slice(F.array_sort(scored), 1, n)


def ivf_assign(e: DataFrame, cb: list[list[float]]) -> DataFrame:
    """Assign each vector to its nearest codebook cell. Zero Exchange:
    the codebook is inlined as a plan literal (tests/test_plans.py pins
    this — the crossJoin+window formulation it replaced shuffled the
    ×k-exploded corpus once per Lloyd iteration)."""
    best = F.element_at(_nearest_cells(F.col("emb"), cb, 1), 1)
    return e.select("vec_id", "emb", best.cell.alias("cell"))


def seed_codebook(e: DataFrame, k: int) -> list[list[float]]:
    """Deterministic seeds: the k smallest multiplicative key-hashes."""
    seeds = (
        e.withColumn("_h", (F.col("vec_id") * 2654435761) % 4294967296)
        .orderBy("_h", "vec_id")
        .limit(k)
        .collect()
    )
    return [list(r.emb) for r in seeds]


def train_ivf_codebook(e: DataFrame, k: int, iters: int) -> list[list[float]]:
    """Seed + `iters` distributed Lloyd iterations; returns the k×dim
    codebook. Per iteration ONE Arrow-batched numpy job: each batch
    computes its argmin assignment with a (n, k, dim) broadcast
    subtraction and emits per-cell (count, sum-vector) partials — ≤ k
    rows per batch regardless of batch size — which collect straight to
    the driver and combine in numpy. No shuffle at all (the previous
    formulation posexploded the corpus ×dim and shuffled it twice per
    iteration; the r3 HOF-hot-path gotcha applies to training just as
    it did to PQ encode). Scan-side assignment stays the plan-pinned
    literal-HOF `ivf_assign`. Shared by `ann_ivf_probe`,
    `ann_ivfpq_search`, and `dedup_semantic_cluster`."""
    import numpy as np

    codebook = seed_codebook(e, k)
    if not codebook:
        return codebook  # empty corpus: no cells to train (r7 edge sweep)
    for _ in range(iters):
        bcb = e.sparkSession.sparkContext.broadcast(
            np.array(codebook, dtype=np.float64)
        )

        def partials(batches):
            import numpy as np
            import pandas as pd

            C = bcb.value
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["emb"].to_numpy())
                d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
                a = d.argmin(1)
                rows = []
                for cell in range(C.shape[0]):
                    m = a == cell
                    if m.any():
                        rows.append(
                            (cell, int(m.sum()), X[m].sum(0).tolist())
                        )
                yield pd.DataFrame(rows, columns=["cell", "cnt", "sums"])

        parts = e.select("emb").mapInPandas(
            partials, "cell int, cnt long, sums array<double>"
        ).collect()
        sums = np.zeros((k, len(codebook[0])))
        cnts = np.zeros(k)
        for r in parts:
            sums[r["cell"]] += np.array(r["sums"])
            cnts[r["cell"]] += r["cnt"]
        for cell in range(k):  # empty cells keep their previous centroid
            if cnts[cell] > 0:
                codebook[cell] = (sums[cell] / cnts[cell]).tolist()
    return codebook


@register("ann_ivf_probe")  # rows-only: recall (not exact output) is the contract
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED codebook: 3 distributed Lloyd (k-means)
    iterations over k=8 cells, deterministic hash-picked seeds; each
    query probes its 3 nearest cells and ranks only inside them. Scan
    cost drops from N to N·(scanned-cell mass) — here ~40% for ~0.6
    top-5 recall on this unclustered fixture, vs 0.38 at the same scan
    fraction for the untrained per-label codebook it replaces (real
    corpora cluster, concentrating neighbors into probed cells and
    pushing recall far higher at the same probe count).

    Scale shape: the codebook is k×dim (tiny) — it is inlined into the
    plan as an array-of-structs LITERAL, so cell assignment is a pure
    Column argmin (array_min over per-cell scores): ZERO Exchange per
    Lloyd iteration and zero for the final assignment (the r1 version
    crossJoined to k rows and picked the argmin with a row_number window
    — a full shuffle of the ×k-exploded corpus per iteration, VERDICT r1
    wrong-#4). Only the centroid update shuffles, and it carries (cell,
    pos) partials — P·k·dim rows, flat in corpus size; the per-cell
    state lands on the driver only as k×dim floats. At 100 TB, train on
    a hash-sample and write the vector table PARTITIONED BY cell so
    probing prunes partitions; tests/test_correctness.py pins the recall
    contract vs brute force.
    """
    K, PROBES, ITERS = 8, 3, 3
    # NULL embeddings are not vectors (r9 edge batch, nullmix mode)
    e = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("emb"))
        .filter(F.col("emb").isNotNull())
    )
    codebook = train_ivf_codebook(e, K, ITERS)
    if not codebook:
        # empty corpus: the trainer's empty-codebook path (r9 edge
        # batch, class-3 guard) — no cells to probe, schema-stable
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double"
        )
    assigned = ivf_assign(e, codebook)
    # queries probe their PROBES nearest cells (same zero-shuffle argmin)
    probe_cells = F.transform(
        _nearest_cells(F.col("emb"), codebook, PROBES), lambda s: s.cell
    )
    probes = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.explode(probe_cells).alias("cell"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qemb"), F.col("emb")), 4).alias("cos_sim"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register("ann_lsh_cosine")  # rows-only: hyperplane family is engine-specific
def ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine near-neighbor pairs: 64-bit random-hyperplane
    signatures (sign of V·H, H seeded-deterministic), candidates from
    equal 4-bit bands (16 bands — banding tuned for the fixture's ~0.45+
    similarity regime; collision prob per band ≈ (1-θ/π)^4), then EXACT
    cosine verification of candidates only. The candidate join is
    per-(band, key) buckets — never an all-pairs product — which is the
    shape that scales; at fixture size brute force is cheaper, which is
    why the exact variants exist alongside (dedup_embedding_cosine).

    Signature computation is one numpy matmul per Arrow batch
    (iterator-form pandas UDF; hyperplanes built once per worker from a
    fixed seed). The signature index is localCheckpoint'd — both join
    sides and the verify stage reuse it, so the Python UDF runs once (on
    a cluster this is the materialized index table). Verification runs
    on UNIT vectors prepared once per side: cosine degenerates to a
    single dot fold instead of dot + two norm folds per candidate —
    measured 2.4× end-to-end at sf0.1 on the ~27%-of-all-pairs candidate
    load this loose 0.45-threshold banding admits.

    NULL embeddings are not vectors — gated before the signature UDF
    (None cells crash the numpy matmul stack; EDGE_SWEEP_r10 class A)."""
    from ..functions.similarity import as_double, dot, l2_norm

    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", as_double("embedding").alias("emb"))
    )
    dim = 64
    n_bits = 64

    @F.pandas_udf("long")
    def signature(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        rng = np.random.default_rng(42)  # same planes on every worker
        H = rng.standard_normal((n_bits, dim))
        for s in batches:
            V = np.stack(s.to_numpy())
            bits = (V @ H.T) > 0  # (n, 64)
            # pack to signed int64 (bit 63 = sign bit, two's complement)
            weights = np.left_shift(np.ones(n_bits, dtype=np.uint64), np.arange(n_bits, dtype=np.uint64))
            sig = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            yield pd.Series(sig)

    sigs = e.withColumn("sig", signature("emb")).select(
        "vec_id", "sig"
    ).localCheckpoint()
    # band keys + signature only — the embeddings do NOT ride through the
    # band join: candidate rows would carry two 64-double arrays into a
    # distinct() over wide rows (measured 3× slower); dedup the (id1, id2)
    # pair set narrow, then fetch embeddings back with two equi-joins. At
    # 100 TB the same argument holds harder: band-join fan-out × embedding
    # width is the shuffle you can't afford.
    bands = sigs.select(
        "vec_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("sig", 4 * i)
                        .bitwiseAND(F.lit(0xF))
                        .alias("key"),
                    )
                    for i in range(16)
                ]
            )
        ).alias("bk"),
    )
    a = bands.select(F.col("vec_id").alias("id1"), F.col("sig").alias("s1"), "bk")
    b = bands.select(F.col("vec_id").alias("id2"), F.col("sig").alias("s2"), "bk")
    # signature-Hamming pre-filter before the exact verify: E[hamming] for
    # a pair at cos θ is 64·θ/π — 22.5 at the 0.45 threshold (σ ≈ 3.8) vs
    # 32 for orthogonal pairs — so ham ≤ 29 (≈ +1.7σ) keeps threshold-pair
    # recall ≥ ~0.95 while rejecting ~3/4 of the noise candidates this
    # loose 4-bit banding admits. One bit_count(xor) on longs already in
    # the row: far cheaper than fetching embeddings for every candidate.
    ham_ok = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))) <= 29
    cand = (
        a.join(b, ["bk"])
        .filter((F.col("id1") < F.col("id2")) & ham_ok)
        .select("id1", "id2")
        .distinct()
    )
    # unit vectors once per side (norm hoisted to its own column so the
    # per-element division doesn't re-run the norm fold), broadcast into
    # the fetch joins: the candidate pair set is the big side
    en = e.select("vec_id", "emb", l2_norm(F.col("emb")).alias("_nrm")).select(
        "vec_id", F.transform("emb", lambda x: x / F.col("_nrm")).alias("u")
    )
    cand = cand.join(
        F.broadcast(en.select(F.col("vec_id").alias("id1"), F.col("u").alias("u1"))),
        "id1",
    ).join(
        F.broadcast(en.select(F.col("vec_id").alias("id2"), F.col("u").alias("u2"))),
        "id2",
    )
    return (
        cand.withColumn("cos_sim", F.round(dot(F.col("u1"), F.col("u2")), 4))
        .filter(F.col("cos_sim") >= 0.45)
        .select("id1", "id2", "cos_sim")
        .orderBy(F.col("cos_sim").desc(), "id1", "id2")
    )


@register("ann_ivfpq_search")  # rows-only: recall (not exact output) is
# the contract — pinned in tests vs brute force AND vs plain IVF
def ann_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the composition that actually runs billion-vector search
    — IVF cells prune the scan (`ann_ivf_probe`), and inside the probed
    cells candidates are ranked from their PRODUCT-QUANTIZED residual
    codes (`emb_pq_quantize` math on x − centroid[cell]), so the
    candidate table the query fans out over carries 8 nibbles per
    vector, not 64 floats. Full embeddings are fetched ONLY for the
    top-50 approximate survivors, which are exactly rescored to the
    final top-5 (the standard two-stage ADC + rescore pipeline of
    IVFADC / FAISS-style indexes, built from the public PQ literature).

    Scale shape: everything before the rescore join touches only
    (vec_id, cell, codes) — 4 bytes of payload per corpus vector at
    production sizes; cell assignment, PQ encode, and approximate
    reconstruction are all literal-codebook pure-Column HOFs (zero
    Exchange, zero Python); the rescore join pulls full vectors for
    50·|queries| ids only. Codebooks: IVF via 3 Lloyd iterations,
    PQ via deterministic hash-seeded residual samples (k-means would
    tighten both; determinism keeps the key reproducible)."""
    K, PROBES, ITERS, M, KS, SUB = 8, 3, 3, 8, 16, 8
    # NULL embeddings are not vectors (r9 edge batch, nullmix mode)
    e = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("emb"))
        .filter(F.col("emb").isNotNull())
        .localCheckpoint()
    )  # reused by every Lloyd iteration + both stages
    codebook = train_ivf_codebook(e, K, ITERS)
    if not codebook:
        # empty corpus: the trainer's empty-codebook path (r9 edge
        # batch, class-3 guard) — nothing to index, schema-stable
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double"
        )
    cb_lit = F.lit([[float(v) for v in c] for c in codebook])  # K x 64

    # residual vs assigned cell centroid — row-local
    assigned = ivf_assign(e, codebook).select(
        "vec_id",
        "cell",
        "emb",
        F.zip_with(
            "emb", F.element_at(cb_lit, F.col("cell") + 1), lambda x, c: x - c
        ).alias("resid"),
    ).localCheckpoint()

    # PQ codebooks on residual subspaces (hash-seeded samples)
    seeds = (
        assigned.withColumn("_h", F.xxhash64(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(KS)
        .collect()
    )
    import numpy as np

    pq = np.array(
        [
            [list(row["resid"][s * SUB : (s + 1) * SUB]) for row in seeds]
            for s in range(M)
        ],
        dtype=np.float64,
    )  # (M, KS, SUB)

    # PQ encode is ARROW-BATCHED NUMPY, not per-row HOF lambdas: the
    # M·KS·SUB argmin is ~1024 flops/row, and HOF lambdas run ~8M
    # steps/s (the r3 gotcha) while the batched (n,KS,SUB) broadcast
    # subtraction is one GEMM-shaped op per subspace — AND it spares
    # janino the 8×16-aggregate expression tree that dominated this
    # key's wall with recompiles (9.9 s warm before, sf0.1). The
    # QUERY-side reconstruction below stays a JVM literal HOF: it is
    # fused into the candidate join where codegen earns its keep.
    def _encode(pq_arr, emit_sub: bool):
        bpq = assigned.sparkSession.sparkContext.broadcast(pq_arr)

        def enc(batches):
            import numpy as np
            import pandas as pd

            P = bpq.value
            for pdf in batches:
                if not len(pdf):
                    continue
                R = np.stack(pdf["resid"].to_numpy())
                codes = np.empty((len(R), M), dtype=np.int32)
                for s_i in range(M):
                    X = R[:, s_i * SUB : (s_i + 1) * SUB]
                    d = ((X[:, None, :] - P[s_i][None, :, :]) ** 2).sum(-1)
                    codes[:, s_i] = d.argmin(1)
                if not emit_sub:
                    yield pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "cell": pdf["cell"],
                            "codes": [c.tolist() for c in codes],
                        }
                    )
                    continue
                # training: per-(subspace, code) partial sums per batch —
                # M·KS rows of SUB-float sums, independent of batch rows
                rows = []
                for s_i in range(M):
                    X = R[:, s_i * SUB : (s_i + 1) * SUB]
                    for code in range(pq_arr.shape[1]):
                        m = codes[:, s_i] == code
                        if m.any():
                            rows.append(
                                (s_i, code, int(m.sum()), X[m].sum(0).tolist())
                            )
                yield pd.DataFrame(
                    rows, columns=["s", "code", "cnt", "sums"]
                )

        return enc

    # 2 Lloyd iterations per PQ codebook: ONE small Arrow job each; the
    # per-batch partials (≤ M·KS rows/batch) collect straight to the
    # driver and combine in numpy — no shuffle at all
    for _ in range(2):
        parts = assigned.select("vec_id", "cell", "resid").mapInPandas(
            _encode(pq, emit_sub=True),
            "s int, code int, cnt long, sums array<double>",
        ).collect()
        # pq.shape[1], not KS: a corpus smaller than KS seeds a smaller
        # codebook, and the partial accumulators must match it (r9 edge
        # batch — one-row/nullmix fixtures hit the mismatch as a numpy
        # boolean-index error)
        sums = np.zeros((M, pq.shape[1], SUB))
        cnts = np.zeros((M, pq.shape[1]))
        for r in parts:
            sums[r["s"], r["code"]] += np.array(r["sums"])
            cnts[r["s"], r["code"]] += r["cnt"]
        used = cnts > 0  # codes nobody used keep their previous centroid
        pq[used] = sums[used] / cnts[used][:, None]

    # the compressed index: (vec_id, cell, 8 codes) — 4 bytes/vec at scale
    index = assigned.select("vec_id", "cell", "resid").mapInPandas(
        _encode(pq, emit_sub=False),
        "vec_id long, cell int, codes array<int>",
    ).localCheckpoint()
    pq = pq.tolist()  # plain nested floats for the F.lit below

    # queries probe their nearest cells
    probe_cells = F.transform(
        _nearest_cells(F.col("emb"), codebook, PROBES), lambda s: s.cell
    )
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.explode(probe_cells).alias("cell"),
    )

    # approximate reconstruction from codes: centroid[cell] + pq decode
    pq_lit = F.lit(pq)  # M x KS x SUB
    recon_resid = F.flatten(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(1), F.lit(M)),
            lambda code, s: F.element_at(F.element_at(pq_lit, s), code + 1),
        )
    )
    recon = F.zip_with(
        F.element_at(cb_lit, F.col("cell") + 1), recon_resid, lambda c, r: c + r
    )
    cand = (
        F.broadcast(queries)
        .join(index, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "qemb",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qemb"), recon).alias("approx_sim"),
        )
    )
    w_a = Window.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), "neighbor_id"
    )
    shortlist = (
        cand.withColumn("_rn", F.row_number().over(w_a))
        .filter(F.col("_rn") <= 50)
        .select("query_id", "qemb", "neighbor_id")
    )
    # exact rescore: fetch full vectors ONLY for the shortlist
    w_e = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        shortlist.join(
            e.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cemb")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qemb"), F.col("cemb")), 4).alias("cos_sim"),
        )
        .withColumn("_rn", F.row_number().over(w_e))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
    )
