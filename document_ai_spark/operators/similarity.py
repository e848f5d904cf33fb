"""Similarity search over embedding columns (SURVEY.md T1 + ANN scale path).

Capability analog of the reference's ChromaDB cosine top-k retrieval
(k=7, hnsw:space=cosine; reference services/ai_service/query_llm.py:33-35,
services/ai_service/main.py:56-61). Two strategies:

  * brute_force_topk — exact cosine scored JVM-side (zip_with/aggregate in
    double precision), TakeOrderedAndProject top-k (no full sort). The
    correctness baseline and the right plan when the corpus fits a scan.
  * lsh_bucketed_topk — random-hyperplane LSH: sign-bit sketch of each
    vector against H fixed hyperplanes; candidates = vectors sharing a
    sketch prefix with the query under any of R rotations; exact rescoring
    on candidates only. Hyperplanes are blake2b-seeded => deterministic
    across runs/cluster sizes. At 100 TB the bucket table is
    pre-materialized and bucket-pruned at read time.

batch_topk — top-k per query for a batch of queries (window row_number),
the many-queries-at-once shape the reference's single-query loop cannot do.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_ai_spark.functions.embed import cosine_sim


def brute_force_topk(
    emb: DataFrame, query_vec: list, k: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col).cast("array<double>"), q), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def batch_topk(
    emb: DataFrame, queries: DataFrame, k: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "query_id", qvec_col: str = "query_vec",
) -> DataFrame:
    """Top-k corpus vectors per query row: broadcast the query batch,
    score all pairs, window row_number <= k. One shuffle (by query_id)."""
    pairs = emb.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        F.col(qid_col),
        F.col(id_col),
        F.round(cosine_sim(F.col(vec_col), F.col(qvec_col)), 4).alias("score"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane) bucketing


def _hyperplanes(dim: int, n_planes: int, seed: bytes = b"document_ai_spark/lsh") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: rows are unit vectors whose
    components derive from blake2b(seed, plane, block) — no RNG state."""
    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        vals = []
        block = 0
        while len(vals) < dim:
            d = hashlib.blake2b(seed + b"|%d|%d" % (p, block), digest_size=64).digest()
            vals.extend(int.from_bytes(d[i : i + 2], "big") - 32768 for i in range(0, 64, 2))
            block += 1
        v = np.array(vals[:dim], dtype=np.float64)
        out[p] = v / np.linalg.norm(v)
    return out


def sketch_udf(dim: int, n_planes: int = 16):
    """pandas UDF: embedding -> integer sign-sketch (bit p set iff v·h_p>0)."""
    planes = _hyperplanes(dim, n_planes)

    @F.pandas_udf(T.LongType())
    def _udf(vecs: pd.Series) -> pd.Series:
        def sk(v):
            if v is None:
                return 0
            a = np.asarray(v, dtype=np.float64)
            if a.shape[0] != dim:
                b = np.zeros(dim)
                b[: min(dim, a.shape[0])] = a[:dim]
                a = b
            bits = (planes @ a) > 0
            out = 0
            for i, bit in enumerate(bits):
                if bit:
                    out |= 1 << i
            return out

        return vecs.map(sk)

    return _udf


def lsh_bucketed_topk(
    emb: DataFrame, query_vec: list, k: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 16, prefix_bits: int = 8, multi_probe: int = 1,
) -> DataFrame:
    """ANN top-k: restrict exact scoring to vectors whose sketch prefix is
    within hamming distance ``multi_probe`` of the query's (multi-probe
    LSH), then exact cosine on the candidates only.

    Cost dial: fraction of corpus scanned ≈
    sum_{h<=p} C(prefix_bits, h) / 2^prefix_bits  (p=1, 8 bits => 9/256).
    prefix_bits up + multi_probe up => same recall, finer buckets — at
    10^12 rows the sketch is a partition column and bucket pruning happens
    at the file-scan level."""
    dim = len(query_vec)
    udf = sketch_udf(dim, n_planes)
    qa = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(dim, n_planes)
    qbits = (planes @ qa) > 0
    qsketch = 0
    for i, bit in enumerate(qbits):
        if bit:
            qsketch |= 1 << i
    mask = (1 << prefix_bits) - 1
    sketched = emb.withColumn("sketch", udf(F.col(vec_col)))
    xor = F.col("sketch").bitwiseAND(F.lit(mask)).bitwiseXOR(F.lit(qsketch & mask))
    cand = sketched.filter(F.bit_count(xor) <= F.lit(multi_probe))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN with deterministic centroid training


def _centroid_lits(centroids: list) -> list:
    return [F.array(*[F.lit(float(x)) for x in c]) for c in centroids]


def assign_cluster(
    df: DataFrame, centroids: list, vec_col: str = "embedding", out_col: str = "ivf_cluster"
) -> DataFrame:
    """Nearest-centroid id per row (max cosine; ties -> lowest id) as a
    pure JVM expression: array_max over (score, -idx) structs — no UDF,
    no shuffle, and a pure function of the row so the assignment is
    independent of physical partitioning."""
    vec = F.col(vec_col).cast("array<double>")
    scored = [
        F.struct(cosine_sim(vec, cl).alias("s"), F.lit(-i).alias("negidx"))
        for i, cl in enumerate(_centroid_lits(centroids))
    ]
    best = F.array_max(F.array(*scored))
    return df.withColumn(out_col, (-best["negidx"]).cast("int"))


def train_ivf_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_limit: int = 4096,
) -> list:
    """DETERMINISTIC k-means for IVF coarse quantization — closes SURVEY
    §9's objection (reference analog: ChromaDB's HNSW index build,
    main.py:60, which is approximate and unordered; here determinism is a
    hard requirement so byte-identity survives re-partitioning):

      * train set + init = the ``sample_limit`` / ``k`` LOWEST-ID vectors
        (stable under any partitioning — no RDD sampling),
      * Lloyd updates compute per-dimension means with EXACT DECIMAL(30,12)
        sums — decimal addition is associative, so shuffle/combine order
        cannot change a centroid by even an ulp (float sums, the usual
        nondeterminism objection to distributed k-means, never occur),
      * an empty cluster keeps its previous centroid.

    Returns k x dim Python lists (small; ship via broadcast/literals).
    """
    base = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(id_col)
        .limit(sample_limit)
        .cache()
    )
    centroids = [list(r["_v"]) for r in base.orderBy(id_col).limit(k).collect()]
    dim = len(centroids[0]) if centroids else 0
    for _ in range(iters):
        assigned = assign_cluster(base, centroids, vec_col="_v", out_col="_c")
        sums = (
            assigned.select("_c", F.posexplode("_v").alias("_d", "_x"))
            .groupBy("_c", "_d")
            .agg(
                F.sum(F.col("_x").cast("decimal(30,12)")).alias("_s"),
                F.count("*").alias("_n"),
            )
            .collect()  # k x dim rows — tiny
        )
        percluster: dict = {}
        for r in sums:
            percluster.setdefault(r["_c"], {})[r["_d"]] = (r["_s"], r["_n"])
        centroids = [
            [float(dims[d][0]) / dims[d][1] for d in range(dim)]
            if (dims := percluster.get(c)) is not None
            else centroids[c]
            for c in range(len(centroids))
        ]
    base.unpersist()
    return centroids


def ivf_topk(
    emb: DataFrame, query_vec: list, centroids: list, k: int = 7, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` centroids nearest the query and
    exact-score only their members; nprobe == len(centroids) is exact
    (the recall dial q47 pins, same contract as the LSH path's q41). At
    10^12 rows ``ivf_cluster`` is a partition/bucket column written at
    index-build time, so probing prunes at the file-scan level and the
    per-query cost is ~nprobe/k of the corpus."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    ranked = []
    for i, c in enumerate(centroids):
        ca = np.asarray(c, dtype=np.float64)
        cn = np.linalg.norm(ca)
        s = float(ca @ q / (cn * qn)) if cn > 0 and qn > 0 else 0.0
        ranked.append((-s, i))
    probe = [i for _, i in sorted(ranked)[:nprobe]]
    cand = assign_cluster(emb, centroids, vec_col=vec_col).filter(
        F.col("ivf_cluster").isin(probe)
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def batch_topk_grouped(
    emb: DataFrame, queries: DataFrame, k: int = 7,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "query_id", qvec_col: str = "query_vec",
) -> DataFrame:
    """batch_topk via grouped applyInPandas: per query group, one numpy
    matrix-vector product + argpartition instead of per-pair higher-order
    folds. Same (query_id, vec_id, score) contract as batch_topk; ~10-50x
    less CPU per pair at 1024 dims, at the cost of shuffling the candidate
    set by query_id (use when queries are few and candidates are many,
    which is the retrieval norm)."""
    pairs = emb.select(id_col, vec_col).crossJoin(F.broadcast(queries.select(qid_col, qvec_col)))

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        q = np.asarray(pdf[qvec_col].iloc[0], dtype=np.float64)
        qn = np.linalg.norm(q)
        norms = np.linalg.norm(mat, axis=1)
        denom = norms * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            scores = np.where(denom > 0, mat @ q / denom, 0.0)
        scores = np.round(scores, 4)
        ids = pdf[id_col].to_numpy()
        # top-k with deterministic (score desc, id asc) tie-break
        order = np.lexsort((ids, -scores))[:k]
        return pd.DataFrame(
            {
                qid_col: pdf[qid_col].iloc[0],
                id_col: ids[order],
                "score": scores[order],
                "rank": np.arange(1, len(order) + 1),
            }
        )

    out_schema = f"{qid_col} long, {id_col} long, score double, rank integer"
    return pairs.groupBy(qid_col).applyInPandas(topk, schema=out_schema)
