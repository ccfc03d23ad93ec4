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
    The expression is built as ONE SQL string (r14): the former
    Column-operator construction spent ~1.3 s of every call in py4j
    round trips — ``F.lit(list)`` is one JVM call per element, 65 per
    component row — before the query even reached the planner; the SQL
    form is a single call (measured build 1.9 → 0.65 s, exec unchanged,
    bit-identical).  The fold itself is the IDENTICAL IEEE-754 op
    sequence as before (and as DuckDB's ``list_sum`` oracle), so every
    coordinate is bit-unchanged.  Returns array<double>[k] in ``comps``
    order."""
    from crypto_datalake_spark.queries.llm import _sp_arr

    comp_rows = "array(" + ",".join(_sp_arr(row) for row in comps) + ")"
    return F.expr(
        "transform(" + comp_rows + ", cv -> round(aggregate("
        "zip_with(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
        + _sp_arr(mean)
        + ", (x, m) -> x - m), cv, (xc, c) -> xc * c), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 9))"
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


def _pca_literals(spark, sf_dir, k: int = _PCA_K):
    """Load the persisted fit as plain lists (comps in comp_id order,
    mean), validating artifact integrity — shared by the projection
    query and the IVF-over-PCA composition."""
    comps_df, mean_df = pca_model_tables(spark, sf_dir, k)
    comps = sorted(((r["comp_id"], r["cv"]) for r in comps_df.collect()))
    # posexplode / array order derive comp_id from ARRAY POSITION, which
    # is only valid when the persisted ids are contiguous 0..k-1 — a
    # stale or reordered artifact must fail loudly, not mislabel
    ids = [cid for cid, _ in comps]
    if ids != list(range(len(comps))):
        raise ValueError(
            f"pca_components ids must be contiguous 0..{len(comps) - 1}, "
            f"got {ids} — stale artifact? delete the warehouse table to refit"
        )
    return [cv for _, cv in comps], mean_df.collect()[0]["mv"]


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
    comps, mean = _pca_literals(spark, sf_dir)
    e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    coords = project_all_expr(comps, mean)
    return e.select(
        "vec_id", F.posexplode(coords).alias("comp_id", "coord")
    ).withColumn("comp_id", F.col("comp_id").cast("long"))


# ------------------------------------------------- IVF over PCA space


def ivf_pca_centroid_table(spark, sf_dir, k=None, seed: int = 7):
    """Trained IVF coarse centroids IN THE 16-DIM PCA SPACE: project the
    corpus through the persisted eigenfit, then the standard KMeans
    centroid recipe (llm.kmeans_centroids — deterministic sample, fixed
    seed), persisted once per (source fingerprint, k, seed).  Distance
    math at fit AND serve time runs on 16 dims instead of 64."""
    from crypto_datalake_spark.queries.llm import (
        _IVF_K,
        _served_model_table,
        kmeans_centroids,
    )

    k = _IVF_K if k is None else k

    def build():
        comps, mean = _pca_literals(spark, sf_dir)
        e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
        proj = e.select(
            "vec_id", project_all_expr(comps, mean).alias("embedding")
        )
        return kmeans_centroids(proj, k=k, seed=seed).coalesce(1)

    return _served_model_table(
        spark, sf_dir, "ivf_pca_centroids", f"k{k}_s{seed}", build,
        source="embeddings.parquet",
    )


def ivf_pca_centroid_path(sf_dir, k=None, seed: int = 7) -> str:
    """Where :func:`ivf_pca_centroid_table` persists its fit."""
    from crypto_datalake_spark.queries.llm import _IVF_K, _served_model_path

    k = _IVF_K if k is None else k
    return _served_model_path(
        sf_dir, "ivf_pca_centroids", f"k{k}_s{seed}",
        source="embeddings.parquet",
    )


def _ann_ivf_pca_sql(sf_dir: str) -> str:
    """Surrogate oracle: projection, assignment, probe, and full-dim
    re-rank are all recomputed CONDITIONAL on the two persisted fits
    (eigenbasis + PCA-space centroids); only the eigendecomposition and
    the KMeans iteration rest on pytest invariants.  Coordinates round
    to 9 dp before any comparison (the projection discipline), so cell
    argmax cannot flip on cross-engine float-sum association."""
    from crypto_datalake_spark.queries.llm import _DK_COS, _IVF_NPROBE

    cp, mp = pca_model_paths(sf_dir)
    ctp = ivf_pca_centroid_path(sf_dir)
    return f"""
    WITH comps AS (
      SELECT comp_id, cv FROM read_parquet('{cp}/*.parquet')
    ),
    m AS (SELECT mv FROM read_parquet('{mp}/*.parquet')),
    cents AS (
      SELECT CAST(cent_id AS BIGINT) AS cent_id, cv
      FROM read_parquet('{ctp}/*.parquet')
    ),
    pj AS (
      SELECT e.vec_id, c.comp_id,
             round(list_sum(list_transform(
               list_zip(e.embedding, m.mv, c.cv),
               p -> (CAST(p[1] AS DOUBLE) - p[2]) * p[3]
             )), 9) AS coord
      FROM embeddings e CROSS JOIN m CROSS JOIN comps c
    ),
    pv AS (
      SELECT vec_id, list(coord ORDER BY comp_id) AS pv
      FROM pj GROUP BY vec_id
    ),
    assign AS (
      SELECT p.vec_id, c.cent_id,
             round({_DK_COS.format(a="p.pv", b="c.cv")}, 9) AS sim
      FROM pv p CROSS JOIN cents c
      WHERE p.vec_id <> 0
      QUALIFY row_number() OVER (
        PARTITION BY p.vec_id ORDER BY sim DESC, c.cent_id ASC
      ) = 1
    ),
    qcells AS (
      SELECT c.cent_id
      FROM pv p CROSS JOIN cents c
      WHERE p.vec_id = 0
      QUALIFY row_number() OVER (
        ORDER BY round({_DK_COS.format(a="p.pv", b="c.cv")}, 9) DESC,
                 c.cent_id ASC
      ) <= {_IVF_NPROBE}
    )
    SELECT a.vec_id, e.label, a.cent_id,
           round({_DK_COS.format(a="e.embedding", b="q.embedding")}, 6)
             AS cosine
    FROM assign a
    JOIN qcells USING (cent_id)
    JOIN embeddings e ON e.vec_id = a.vec_id
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY cosine DESC, a.vec_id ASC
    LIMIT 10
    """


@register(
    "ann_ivf_pca",
    sql=_ann_ivf_pca_sql,
    doc="IVF ANN probed in the 16-dim PCA space with EXACT full-dim "
    "re-ranking: corpus and query project through the persisted "
    "eigenbasis (codegen'd plan-literal folds, map-only), cell "
    "assignment and the nprobe probe run on 16-dim vectors against "
    "KMeans centroids TRAINED in PCA space (persisted per source "
    "fingerprint), and only the probed cells' candidates are scored — "
    "with the ORIGINAL 64-dim cosine, so ranking quality inside the "
    "probe set equals brute force. The standard big-corpus recipe: at "
    "100 TB the assignment pass does 4x less distance math than raw-"
    "space IVF and the coarse index shrinks 4x, while re-rank cost "
    "stays candidate-sized. Composition of embedding_pca_project + "
    "ann_ivf_kmeans, both already shipped; recall vs full-dim IVF "
    "measured in tests/test_ann.py (near-isotropic synthetic "
    "embeddings make PCA nearly rotation-only here, so parity — not "
    "uplift — is the honest expectation, and the probe-set agreement "
    "is asserted rather than claimed). SURROGATE oracle: DuckDB "
    "mirrors projection/assignment/probe/re-rank from the same two "
    "persisted fits.",
)
def ann_ivf_pca(spark, sf_dir):
    from crypto_datalake_spark.queries.llm import (
        _IVF_NPROBE,
        _assign_cells,
        _cells_sorted,
        _cosine,
        _probe_cells,
    )

    comps, mean = _pca_literals(spark, sf_dir)
    pv = project_all_expr(comps, mean)
    e = t(spark, sf_dir, "embeddings")
    corpus = e.where(F.col("vec_id") != 0).select(
        "vec_id", "label", F.col("embedding").alias("fv"),
        pv.alias("embedding"),  # the 16-dim vector drives assignment
    )
    query = e.where(F.col("vec_id") == 0).select(
        "vec_id", "embedding", pv.alias("pv")
    )
    cents, cents_arr = _cells_sorted(ivf_pca_centroid_table(spark, sf_dir))
    assign = _assign_cells(corpus, cents_arr).select(
        "vec_id", "label", "fv", "cent_id"
    )
    qcells = _probe_cells(
        query.select("vec_id", F.col("pv").alias("embedding")),
        cents, _IVF_NPROBE,
    ).select("cent_id")
    qfull = query.select(F.col("embedding").alias("qv"))
    return (
        assign.join(F.broadcast(qcells), "cent_id")
        .crossJoin(F.broadcast(qfull))
        .select(
            "vec_id",
            "label",
            "cent_id",
            F.round(_cosine(F.col("fv"), F.col("qv")), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )
