"""PCA dimensionality reduction for the embedding tier: offline
deterministic eigenfit, persisted components, codegen'd projection.

The standard preprocessing stage in front of coarse ANN (IVF on 16
PCA dims probes far cheaper than on raw 64) and the basis of PQ-style
compression pipelines.  Follows the engine's trained-model doctrine
(IVF centroids / PQ codebooks / LM counts / tokenizers):

- **Fit** runs driver-side over the deterministic md5-smallest sample
  (``_det_sample`` — the kmeans precedent): numpy eigendecomposition of
  the sample covariance, eigenvectors sign-fixed (largest-magnitude
  entry positive) so the fit is bit-reproducible — eigenvector sign is
  otherwise arbitrary and would flip between refits.  Components and
  the dimension means persist once per source fingerprint.
- **Serve** is pure JVM codegen: the k component vectors are read from
  the warehouse (k rows) and embedded as array literals in the plan,
  so each projection coordinate is one fold over ``zip_with`` — no
  Python, no join, no shuffle beyond the scan.  Coordinates are
  rounded to 9 dp (the ANN-family discipline) so the fold is
  oracle-hash-stable.
- **Oracle** (surrogate): DuckDB recomputes the projection from the
  SAME persisted parquet with the same centered-dot-product-and-round,
  conditional on the fit — the eigendecomposition itself is genuinely
  non-SQL-expressible.

Output is long-form (vec_id, comp_id, coord) so every value is a
scalar the driver's column-sorted hash compares exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.queries.common import t
from crypto_datalake_spark.queries.registry import register

_PCA_K = 16          # output dimensionality (from 64)
_PCA_SAMPLE = 4096   # deterministic fit sample (covers the corpus at test SF)


def pca_fit(rows: list[list[float]], k: int = _PCA_K):
    """Deterministic PCA of a row-major sample: returns (mean, comps,
    evar) where comps is k eigenvectors of the sample covariance sorted
    by eigenvalue desc (ties broken toward lower index), each sign-fixed
    so its largest-|entry| coordinate is positive."""
    import numpy as np

    x = np.asarray(rows, dtype=np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / max(1, len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending, deterministic (LAPACK)
    order = np.argsort(-evals, kind="stable")[:k]
    comps, evar = [], []
    for j in order:
        v = evecs[:, j]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v.tolist())
        evar.append(float(evals[j]))
    return mean.tolist(), comps, evar


def pca_model_tables(spark, sf_dir, k: int = _PCA_K):
    """Persisted PCA fit: components (comp_id, cv, evar) and the 1-row
    dimension means (mv) — trained once per source fingerprint."""
    from crypto_datalake_spark.queries.llm import _det_sample, _served_model_table

    memo: dict = {}

    def fit():
        if "fit" not in memo:
            e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
            rows = [
                r["embedding"]
                for r in _det_sample(e, _PCA_SAMPLE)
                .select(F.col("embedding").cast("array<double>").alias("embedding"))
                .collect()
            ]
            memo["fit"] = pca_fit(rows, k)
        return memo["fit"]

    def build_comps():
        _, comps, evar = fit()
        return spark.createDataFrame(
            [(i, c, v) for i, (c, v) in enumerate(zip(comps, evar))],
            "comp_id bigint, cv array<double>, evar double",
        ).coalesce(1)

    def build_mean():
        mean, _, _ = fit()
        return spark.createDataFrame(
            [(mean,)], "mv array<double>"
        ).coalesce(1)

    suffix = f"k{k}_s{_PCA_SAMPLE}"
    return (
        _served_model_table(
            spark, sf_dir, "pca_components", suffix, build_comps,
            source="embeddings.parquet",
        ),
        _served_model_table(
            spark, sf_dir, "pca_mean", suffix, build_mean,
            source="embeddings.parquet",
        ),
    )


def pca_model_paths(sf_dir: str, k: int = _PCA_K) -> list[str]:
    """Feeds the oracle-first pre-build guard (llm.model_artifact_paths)."""
    from crypto_datalake_spark.queries.llm import _served_model_path

    suffix = f"k{k}_s{_PCA_SAMPLE}"
    return [
        _served_model_path(sf_dir, pre, suffix, source="embeddings.parquet")
        for pre in ("pca_components", "pca_mean")
    ]


def project_all_expr(comps: list[list[float]], mean: list[float]):
    """All k projection coordinates (Σ_i (x_i − m_i)·c_i, rounded to
    9 dp — the ANN-family discipline) in one pass: center the embedding
    ONCE, then fold each row of a k×d nested-array literal against it.
    One expression tree instead of k, and the centered array is shared
    instead of recomputed per coordinate — measured 2.08 → 1.56 s at
    sf0.1 (the remaining cost is the row explosion, not the
    arithmetic); at scale the saving is k−1 subtraction passes per
    row.  Returns array<double>[k] in ``comps`` order."""
    centered = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.lit([float(m) for m in mean]),
        lambda x, m: x - m,
    )
    comp_rows = F.array(*[F.lit([float(c) for c in row]) for row in comps])
    return F.transform(
        comp_rows,
        lambda cv: F.round(
            F.aggregate(
                F.zip_with(centered, cv, lambda xc, c: xc * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            9,
        ),
    )


def _pca_project_sql(sf_dir: str) -> str:
    cp = pca_model_paths(sf_dir)[0]
    mp = pca_model_paths(sf_dir)[1]
    return f"""
    WITH comps AS (
      SELECT comp_id, cv FROM read_parquet('{cp}/*.parquet')
    ),
    m AS (SELECT mv FROM read_parquet('{mp}/*.parquet'))
    SELECT e.vec_id, c.comp_id,
           round(list_sum(list_transform(
             list_zip(e.embedding, m.mv, c.cv),
             p -> (CAST(p[1] AS DOUBLE) - p[2]) * p[3]
           )), 9) AS coord
    FROM embeddings e CROSS JOIN m CROSS JOIN comps c
    WHERE e.vec_id <> 0
    """


@register(
    "embedding_pca_project",
    sql=_pca_project_sql,
    doc="Project every corpus embedding onto the persisted PCA basis "
    "(64 -> 16 dims): the fit is a deterministic driver-side "
    "eigendecomposition over the md5-smallest sample (eigenvectors "
    "sign-fixed so refits are bit-identical), persisted once per "
    "source fingerprint; serving embeds the k component vectors as "
    "plan literals so each coordinate is one codegen'd "
    "zip_with/aggregate fold — no Python, no join, no shuffle. "
    "Long-form (vec_id, comp_id, coord) output, coordinates rounded "
    "to 9 dp. SURROGATE oracle: DuckDB recomputes the centered "
    "projection from the same persisted parquet. The standard "
    "dimension-reduction stage in front of IVF ANN and PQ compression "
    "at 100 TB: projection cost is one map pass, and downstream ANN "
    "distance math shrinks 4x.",
)
def embedding_pca_project(spark, sf_dir):
    comps_df, mean_df = pca_model_tables(spark, sf_dir)
    comps = sorted(
        ((r["comp_id"], r["cv"]) for r in comps_df.collect()),
    )
    # posexplode derives comp_id from ARRAY POSITION, which is only
    # valid when the persisted ids are contiguous 0..k-1 — a stale or
    # reordered artifact must fail loudly, not mislabel every coordinate
    ids = [cid for cid, _ in comps]
    if ids != list(range(len(comps))):
        raise ValueError(
            f"pca_components ids must be contiguous 0..{len(comps) - 1}, "
            f"got {ids} — stale artifact? delete the warehouse table to refit"
        )
    mean = mean_df.collect()[0]["mv"]
    e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    coords = project_all_expr([cv for _, cv in comps], mean)
    return e.select(
        "vec_id", F.posexplode(coords).alias("comp_id", "coord")
    ).withColumn("comp_id", F.col("comp_id").cast("long"))
