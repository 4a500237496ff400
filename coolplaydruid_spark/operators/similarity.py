"""Similarity search over an embedding column (array<float>).

 - brute_force_topk : exact cosine top-k — the correctness baseline.
 - sign_lsh_bucket  : deterministic sign-bit LSH bucket (blocking key).
 - lsh_topk         : approximate top-k probing only the query's bucket
                      (the scale path: per-bucket joins instead of a full
                      cross product).

Scale design: queries are broadcast (they are the small side by
definition); the corpus side streams partition-local, so brute-force is
one map-side pass + a per-query top-k (window). No corpus shuffle at all
for brute force; LSH adds a bucket-keyed shuffle that cuts the scanned
fraction to ~1/2^bits. The dot product stays JVM-side via
zip_with/aggregate — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _cosine(vec_a, vec_b, norm_a, norm_b):
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return dot / (norm_a * norm_b)


def _dvec(col):
    # float32 → float64 before any arithmetic: keeps the math bit-identical
    # to engines (and oracles) that compute in double.
    return col.cast("array<double>")


def _norm(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows.
    Returns (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor id for determinism."""
    q = queries.select(
        F.col(query_id_col), _dvec(F.col(vec_col)).alias("__qvec"), _norm(_dvec(F.col(vec_col))).alias("__qn")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _dvec(F.col(vec_col)).alias("__cvec"),
        _norm(_dvec(F.col(vec_col))).alias("__cn"),
    )
    scored = c.join(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        F.round(_cosine(F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")), 6)
        .alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def sign_lsh_bucket(vec_col: str = "embedding", bits: int = 8):
    """Deterministic sign-bit LSH bucket: the concatenated signs of the
    first `bits` vector components. A degenerate-but-deterministic
    random-hyperplane LSH (axis-aligned hyperplanes) — engine-independent
    and SQL-mirrorable, which a seeded random-projection matrix is not."""
    chars = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*chars)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    max_iter: int = 10,
    train_sample: int = 100_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means partitions the
    corpus into n_clusters cells; each query probes its n_probe nearest
    cells and scores only those rows.

    Scale: training samples the corpus (KMeans over a bounded sample),
    assignment is one map pass, and the probe join is keyed on cell id —
    per-query candidate volume is ~n_probe/n_clusters of the corpus.
    Centroids (n_clusters × dim floats) broadcast trivially. Non-SQL
    oracle (k-means is iterative) — tests check probe containment and
    recall against brute force instead.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = array_to_vector(_dvec(F.col(vec_col))).alias("__features")
    # Centroid quality needs a bounded, UNBIASED sample, not the corpus:
    # take the train_sample rows with the smallest md5(id) — hash order
    # is uniform w.r.t. content, so a corpus written sorted/clustered
    # (by time, source, language) cannot bias the centroids the way a
    # prefix limit() would. orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition top-K + merge, no full sort);
    # collapsing to few partitions keeps each k-means iteration a
    # handful of tasks — at 100 TB training on everything would dominate
    # the whole query.
    train = (
        corpus.select(feat, F.md5(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(train_sample)
        .select("__features")
        .coalesce(4)
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=max_iter,
                   featuresCol="__features").fit(train)

    assigned = model.transform(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _dvec(F.col(vec_col)).alias("__cvec"),
            _norm(_dvec(F.col(vec_col))).alias("__cn"),
            feat,
        )
    ).select("neighbor_id", "__cvec", "__cn",
             F.col(model.getPredictionCol()).alias("__cell"))

    # Query → n_probe nearest cells, via a broadcast centroid table
    # (euclidean, matching the k-means training metric).
    # pandas conversion → Arrow LocalTableScan, keeping the centroid
    # table JVM-side at execution (a list-of-tuples createDataFrame would
    # plan a Python-RDD scan).
    import pandas as pd

    cent_pdf = pd.DataFrame(
        {
            "__cell": range(len(model.clusterCenters())),
            "__centroid": [[float(x) for x in c] for c in model.clusterCenters()],
        }
    )
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(cent_pdf, "__cell int, __centroid array<double>")
    qbase = queries.select(
        F.col(query_id_col),
        _dvec(F.col(vec_col)).alias("__qvec"),
        _norm(_dvec(F.col(vec_col))).alias("__qn"),
    )
    dist = F.aggregate(
        F.zip_with(F.col("__qvec"), F.col("__centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__dist").asc(), F.col("__cell").asc())
    probes = (
        qbase.join(F.broadcast(cent_df))
        .withColumn("__dist", dist)
        .withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= n_probe)
        .select(query_id_col, "__qvec", "__qn", "__cell")
    )

    scored = assigned.join(F.broadcast(probes), on="__cell").select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        F.round(_cosine(F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")), 6)
        .alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: probe only corpus rows in the query's LSH
    bucket. Recall depends on bucket granularity (bits); the candidate
    set shrinks ~2^bits-fold. Same output shape as brute_force_topk."""
    bucket = sign_lsh_bucket(vec_col, bits)
    q = queries.select(
        F.col(query_id_col),
        _dvec(F.col(vec_col)).alias("__qvec"),
        _norm(_dvec(F.col(vec_col))).alias("__qn"),
        bucket.alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _dvec(F.col(vec_col)).alias("__cvec"),
        _norm(_dvec(F.col(vec_col))).alias("__cn"),
        bucket.alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), on="__bucket").select(
        F.col(query_id_col),
        F.col("neighbor_id"),
        F.round(_cosine(F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")), 6)
        .alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
