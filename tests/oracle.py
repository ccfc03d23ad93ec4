"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column-name set, and
order-insensitive values (columns sorted by name, rows sorted by all
columns) — the same shape as CORRECTNESS_r{N}.json.

Comparison is strict-ish: exact for ints/strings/timestamps/bools, and for
floats requires agreement to 1e-9 relative — our determinism discipline
(decimal sums, double division, symmetric rounding) should make both sides
*identical*, so any drift here is a red flag for the real gate.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

from crypto_datalake_spark.io import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _sortkey(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def compare(spark_df, con, sql, float_rtol=1e-9):
    """Return (ok, msg). Columns sorted by name; rows sorted canonically."""
    sp_cols = sorted(spark_df.columns)
    sp_rows = [
        tuple(_norm(r[c]) for c in sp_cols) for r in spark_df.collect()
    ]
    duck = con.execute(sql)
    dk_cols_raw = [d[0] for d in duck.description]
    dk_all = duck.fetchall()
    dk_cols = sorted(dk_cols_raw)
    if sp_cols != dk_cols:
        return False, f"columns differ: spark={sp_cols} duck={dk_cols}"
    idx = [dk_cols_raw.index(c) for c in dk_cols]
    dk_rows = [tuple(_norm(r[i]) for i in idx) for r in dk_all]
    if len(sp_rows) != len(dk_rows):
        return False, f"row count: spark={len(sp_rows)} duck={len(dk_rows)}"
    sp_rows.sort(key=_sortkey)
    dk_rows.sort(key=_sortkey)
    n_exact = 0
    for i, (a, b) in enumerate(zip(sp_rows, dk_rows)):
        for c, (x, y) in zip(dk_cols, zip(a, b)):
            if x == y:
                n_exact += 1
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isclose(x, y, rel_tol=float_rtol, abs_tol=1e-12):
                    continue
            return False, f"row {i} col {c}: spark={x!r} duck={y!r}"
    return True, f"ok rows={len(sp_rows)}"


def exact_fraction(spark_df, con, sql):
    """Fraction of cells that match bit-exactly (diagnostic for the real
    driver gate, which may hash exact values)."""
    sp_cols = sorted(spark_df.columns)
    sp_rows = sorted(
        [tuple(_norm(r[c]) for c in sp_cols) for r in spark_df.collect()],
        key=_sortkey,
    )
    duck = con.execute(sql)
    dk_cols_raw = [d[0] for d in duck.description]
    idx = [dk_cols_raw.index(c) for c in sorted(dk_cols_raw)]
    dk_rows = sorted(
        [tuple(_norm(r[i]) for i in idx) for r in duck.fetchall()], key=_sortkey
    )
    total = 0
    exact = 0
    for a, b in zip(sp_rows, dk_rows):
        for x, y in zip(a, b):
            total += 1
            if x == y or (
                isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y)
            ):
                exact += 1
    return exact, total
