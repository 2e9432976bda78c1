"""Similarity search over embedding columns (array<float>).

Two tiers:

- ``brute_force_knn`` — exact cosine top-k.  One scan-side projection
  computing the cosine against a literal (plan-embedded) query vector,
  then ``TakeOrderedAndProject``.  At 100 TB this is a full scan but NO
  shuffle — the per-partition top-k fold is all Spark does before the
  driver merge of k rows per partition.
- ``lsh_knn`` — random-hyperplane LSH bucketing: probe only rows whose
  sign-signature matches the query's in ≥1 band.  Hyperplanes are
  deterministic (seeded md5-derived pseudo-randoms) so plans are
  reproducible across runs/engines.

Also ``ivf_assign``/``ivf_knn`` — a light IVF variant: centroids learned
once (driver-side k-means on a sample), then assignment is a scan-side
argmin; queries probe the nearest ``n_probe`` centroids' partitions only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from occupation_wage_etl_spark.functions import similarity as S


def _as_double_array(values: Sequence[float]) -> F.Column:
    return F.array(*[F.lit(float(v)).cast("double") for v in values])


def brute_force_knn(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    Returns (id, cosine) ordered desc, ties broken by id asc (deterministic).
    """
    q = _as_double_array(query_vec)
    return (
        df.select(
            F.col(id_col),
            F.round(S.cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _pseudo_random_hyperplanes(dim: int, n_planes: int, seed: str = "owes") -> list[list[float]]:
    """Deterministic hyperplanes in [-1,1]^dim from md5(seed:plane:coord).

    Not cryptographic randomness — just a reproducible, dependency-free
    source of well-spread directions (md5 bytes are uniform).
    """
    planes = []
    for p in range(n_planes):
        coords = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            coords.append(int(h[:8], 16) / float(0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(coords)
    return planes


def lsh_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    seed: str = "owes",
) -> DataFrame:
    """Append a random-hyperplane sign signature column ``lsh_sig`` (long).

    bit p = 1 iff dot(vec, plane_p) ≥ 0.  A scan-side projection — no
    shuffle.  Dense (n × dim) @ (dim × n_planes) is the one place
    built-in expressions lose badly: per-plane higher-order folds are
    interpreted per element AND embed dim-sized literal arrays per plane
    into the plan (n_planes × dim literal nodes — analysis cost alone is
    visible).  A vectorized Arrow-batched pandas UDF does the whole batch
    as one float64 matmul.
    """
    planes_t = np.asarray(
        _pseudo_random_hyperplanes(dim, n_planes, seed), dtype=np.float64
    ).T  # (dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        if vecs.isna().any():  # null vector → zero vector (sign bits all 1)
            zero = np.zeros(planes_t.shape[0], dtype=np.float64)
            vecs = vecs.apply(lambda v: zero if v is None else v)
        m = np.vstack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (m @ planes_t) >= 0.0  # (batch, n_planes)
        return pd.Series(bits @ weights)

    return df.withColumn("lsh_sig", _sig(F.col(vec_col)))


def lsh_knn(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 16,
    band_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "owes",
) -> DataFrame:
    """Approximate top-k: probe only rows sharing ≥1 signature band with
    the query, then exact cosine on the survivors.

    With ``n_planes=16, band_bits=4`` → 4 bands; collision prob for
    cosine-similar vectors is high while the probe set shrinks ~16× per
    band on random data.  At scale, persist ``lsh_signature`` output
    bucketed by a band column to turn probes into partition pruning.
    """
    dim = len(query_vec)
    planes = _pseudo_random_hyperplanes(dim, n_planes, seed)
    qsig = 0
    for p, plane in enumerate(planes):
        dot = sum(float(a) * b for a, b in zip(query_vec, plane))
        if dot >= 0:
            qsig |= 1 << p
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1

    signed = lsh_signature(df, dim, n_planes, vec_col, seed)
    band_match = None
    for b in range(n_bands):
        qband = (qsig >> (b * band_bits)) & mask
        cond = F.shiftright(F.col("lsh_sig"), b * band_bits).bitwiseAND(F.lit(mask)) == qband
        band_match = cond if band_match is None else (band_match | cond)

    q = _as_double_array(query_vec)
    return (
        signed.filter(band_match)
        .select(
            F.col(id_col),
            F.round(S.cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each row to its nearest centroid (``ivf_cell`` column).

    Centroids are literals in the plan; assignment is an argmax over
    cosines — scan-side only.  Persisting the output partitioned by
    ``ivf_cell`` makes future probes partition-pruned.
    """
    structs = [
        F.struct(
            S.cosine_similarity(F.col(vec_col), _as_double_array(c)).alias("cos"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.array_max(F.array(*structs))
    return df.withColumn("ivf_cell", best["cell"])


def ivf_knn(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query (driver-side —
    #centroids is small), filter to the best ``n_probe`` cells, exact
    cosine top-k on the survivors."""
    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) ** 2 for x in a) ** 0.5
        nb = sum(float(y) ** 2 for y in b) ** 0.5
        return dot / (na * nb) if na > 0 and nb > 0 else -1.0

    ranked = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec))
    probe = ranked[:n_probe]
    q = _as_double_array(query_vec)
    return (
        ivf_assign(df, centroids, vec_col)
        .filter(F.col("ivf_cell").isin(probe))
        .select(
            F.col(id_col),
            F.round(S.cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def grouped_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroid as (group, dim, centroid, n_vectors).

    The scalable shape for vector aggregation: ``posexplode`` turns the
    array column into (group, dim, value) rows scan-side, and one
    hash-aggregate shuffle on (group, dim) computes every component mean
    with map-side partial aggregation -- no per-group array buffering,
    no UDF.  The mean is a float fold (partition-order-dependent in the
    last bits), so per this repo's determinism rules it is rounded to
    6dp -- note a DECIMAL-sum would NOT fix cross-engine equality here,
    because Spark casts float->decimal through the value's shortest
    string form while DuckDB converts the exact binary value.  ``dim``
    is 1-based.

    Reassembling (group, dim, centroid) rows into array form when needed
    downstream is ``array_sort(collect_list(struct(dim, centroid)))`` --
    kept out of this operator so the aggregate output stays streamable.
    """
    ex = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("i", "v"),
    )
    return (
        ex.groupBy("grp", "i")
        .agg(
            F.avg(F.col("v").cast("double")).alias("m"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(
            F.col("grp").alias(group_col),
            (F.col("i") + 1).cast("long").alias("dim"),
            F.round(F.col("m"), 6).alias("centroid"),
            "n_vectors",
        )
    )
