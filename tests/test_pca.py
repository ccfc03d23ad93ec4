"""PCA fit determinism, spectral properties, and the shuffle-free
projection plan.  Surrogate-oracle parity for the registered query is
swept by tests/test_oracle_parity.py."""

from __future__ import annotations

import math
import random

import numpy as np

from crypto_datalake_spark.queries.pca import pca_fit, pca_model_tables


def _sample(n=200, d=12, seed=3):
    rng = random.Random(seed)
    # anisotropic cloud: two dominant directions
    base = [[rng.gauss(0, 1) for _ in range(d)] for _ in range(n)]
    return [
        [5 * r[0] + x for x in r] for r in base
    ]


def test_fit_deterministic_and_sign_fixed():
    rows = _sample()
    m1, c1, v1 = pca_fit(rows, k=6)
    m2, c2, v2 = pca_fit(list(rows), k=6)
    assert m1 == m2 and c1 == c2 and v1 == v2  # bit-identical refit
    for comp in c1:
        pivot = max(range(len(comp)), key=lambda i: abs(comp[i]))
        assert comp[pivot] > 0  # sign convention


def test_variance_sorted_and_components_orthonormal():
    _, comps, evar = pca_fit(_sample(), k=6)
    assert all(a >= b for a, b in zip(evar, evar[1:]))
    c = np.asarray(comps)
    gram = c @ c.T
    assert np.allclose(gram, np.eye(len(comps)), atol=1e-9)


def test_reconstruction_error_decreases_with_k():
    rows = _sample()
    x = np.asarray(rows)
    errs = []
    for k in (1, 3, 6, 12):
        mean, comps, _ = pca_fit(rows, k=k)
        c = np.asarray(comps)
        xc = x - np.asarray(mean)
        recon = xc @ c.T @ c
        errs.append(float(((xc - recon) ** 2).sum()))
    assert all(a >= b - 1e-9 for a, b in zip(errs, errs[1:]))
    assert errs[-1] < 1e-18  # k = d reconstructs exactly


def test_projection_matches_numpy_and_plan_is_map_only(spark, sf_dir):
    from crypto_datalake_spark.queries import REGISTRY
    from crypto_datalake_spark.queries.common import t
    from pyspark.sql import functions as F
    from tests.test_scale_plans import plan_text

    df = REGISTRY["embedding_pca_project"].fn(spark, sf_dir)
    p = plan_text(df, "simple")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p  # components are plan literals
    assert "Exchange hashpartitioning" not in p  # map-only projection

    comps_df, mean_df = pca_model_tables(spark, sf_dir)
    comps = {r["comp_id"]: r["cv"] for r in comps_df.collect()}
    mean = np.asarray(mean_df.collect()[0]["mv"])
    got = {(r["vec_id"], r["comp_id"]): r["coord"] for r in df.collect()}
    sample = (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") != 0)
        .limit(5)
        .collect()
    )
    for r in sample:
        x = np.asarray([float(v) for v in r["embedding"]])
        for cid, cv in comps.items():
            want = float((x - mean) @ np.asarray(cv))
            assert math.isclose(
                got[(r["vec_id"], cid)], round(want, 9), abs_tol=1e-9
            )


def test_projection_contracts_and_captures_spectrum_variance(spark, sf_dir):
    """Exact invariants of an orthonormal projection, independent of the
    data's structure (the synthetic embeddings are near-isotropic, so
    neighbor-recall-style claims would test the data, not the code):

    - contraction: every projected squared distance ≤ the raw centered
      one (so PCA-space ANN candidate sets can over-approximate but the
      distances never lie long);
    - variance capture: corpus-wide, the ratio of projected to centered
      total variance equals Σ(top-k eigenvalues)/total variance — the
      fit's own explained-variance accounting, closed loop against the
      served projection."""
    from pyspark.sql import functions as F

    from crypto_datalake_spark.queries import REGISTRY
    from crypto_datalake_spark.queries.common import t

    proj = REGISTRY["embedding_pca_project"].fn(spark, sf_dir).collect()
    vecs: dict[int, np.ndarray] = {}
    for r in proj:
        vecs.setdefault(r["vec_id"], np.zeros(16))[r["comp_id"]] = r["coord"]

    rows = (
        t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0).collect()
    )
    raw = {r["vec_id"]: np.asarray([float(x) for x in r["embedding"]])
           for r in rows}
    _, mean_df = pca_model_tables(spark, sf_dir)
    mean = np.asarray(mean_df.collect()[0]["mv"])

    ids = sorted(raw)
    for a, b in zip(ids[:20], ids[1:21]):  # contraction on sample pairs
        d_raw = float(((raw[a] - mean) - (raw[b] - mean)) @ ((raw[a] - raw[b])))
        d_pca = float((vecs[a] - vecs[b]) @ (vecs[a] - vecs[b]))
        assert d_pca <= d_raw + 1e-6, (a, b, d_pca, d_raw)

    centered = np.stack([raw[i] - mean for i in ids])
    projected = np.stack([vecs[i] for i in ids])
    ratio = float((projected**2).sum() / (centered**2).sum())
    # the fit trained on (a superset sample of) these rows: the captured
    # fraction must sit strictly between "nothing" and "everything" and
    # match the eigen-spectrum's own accounting to a few percent
    comps_df, _ = pca_model_tables(spark, sf_dir)
    evar = sum(r["evar"] for r in comps_df.collect())
    total = float((centered**2).sum() / max(1, len(ids) - 1))
    assert 0.0 < ratio < 1.0
    assert abs(ratio - evar / total) < 0.05, (ratio, evar / total)
