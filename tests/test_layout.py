"""Z-order layout: interleave correctness and the actual pruning payoff,
verified against parquet footers — not claimed from theory.

Oracle parity for `layout_zorder_key` is swept by test_oracle_parity.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crypto_datalake_spark.io import load_table
from crypto_datalake_spark.ops.layout import (
    dim_bucket,
    interleave_bits,
    write_zordered,
)

_N_FILES = 16


def test_interleave_known_bits(spark):
    # bx=0b101, by=0b011 -> bits: z[2j]=bx[j], z[2j+1]=by[j]
    # j=0: bx0=1,by0=1 -> z0=1,z1=1 ; j=1: bx1=0,by1=1 -> z2=0,z3=1
    # j=2: bx2=1,by2=0 -> z4=1,z5=0 ==> z = 0b011011 = 27
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    out = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()
    assert out[0]["z"] == 0b011011


def test_dim_bucket_bounds_and_constant_dim(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
    mm = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    b = (
        df.crossJoin(F.broadcast(mm))
        .select(dim_bucket(F.col("v"), F.col("lo"), F.col("hi"), bits=4).alias("b"))
        .collect()
    )
    vals = sorted(r["b"] for r in b)
    assert vals[0] == 0 and vals[-1] == 15 and all(0 <= v <= 15 for v in vals)
    # constant dimension collapses to 0, never divides by zero
    c = spark.createDataFrame([(7,), (7,)], "v long")
    cm = c.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    assert all(
        r["b"] == 0
        for r in c.crossJoin(F.broadcast(cm))
        .select(dim_bucket(F.col("v"), F.col("lo"), F.col("hi")).alias("b"))
        .collect()
    )


def _file_boxes(path: str, cols: tuple[str, str]):
    """[(min,max) per col] per parquet file, from footer stats."""
    boxes = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        boxes.append(tuple((lo[c], hi[c]) for c in cols))
    return boxes


def _files_matching(boxes, pred_ranges):
    """How many files a min/max-pruning reader must open for a box
    predicate (AND of per-column ranges)."""
    n = 0
    for box in boxes:
        if all(
            not (b_hi < p_lo or b_lo > p_hi)
            for (b_lo, b_hi), (p_lo, p_hi) in zip(box, pred_ranges)
        ):
            n += 1
    return n


def test_zorder_layout_prunes_more_files(spark, tmp_path):
    """THE payoff test: same rows, same file count, two layouts — the
    z-ordered one must give footer min/max pruning a lower READ
    AMPLIFICATION (rows a pruning reader must fetch per predicate row)
    than a time-sorted layout, totalled over a sweep of (user AND time)
    box predicates, and must never lose rows.  Uses sf0.01 (10k events)
    regardless of the suite SF — file-level stats need enough rows per
    file for the geometry to dominate sampling noise."""
    e = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(MINUTE, TIMESTAMP'2024-01-01 00:00:00', ts)"
        ).alias("m"),
    )
    mm = e.agg(
        F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
        F.min("m").alias("mlo"), F.max("m").alias("mhi"),
    )
    j = e.crossJoin(F.broadcast(mm))
    zkey = interleave_bits(
        [
            dim_bucket(F.col("user_id"), F.col("ulo"), F.col("uhi")),
            dim_bucket(F.col("m"), F.col("mlo"), F.col("mhi")),
        ]
    )

    naive = str(tmp_path / "naive")
    zpath = str(tmp_path / "zorder")
    # time-sorted baseline: the layout a stream naturally lands in
    (
        e.repartitionByRange(_N_FILES, "m")
        .sortWithinPartitions("m")
        .write.mode("overwrite")
        .parquet(naive)
    )
    jz = j.select("event_id", "user_id", "m", zkey.alias("zv"))
    write_zordered(jz, zpath, F.col("zv"), _N_FILES)

    total = e.count()
    assert spark.read.parquet(zpath).count() == total
    assert spark.read.parquet(naive).count() == total

    cols = ("user_id", "m")
    nb, zb = _file_boxes(naive, cols), _file_boxes(zpath, cols)
    nrows = _file_rows(naive)
    zrows = _file_rows(zpath)
    assert len(zb) == len(nb) == _N_FILES

    ulo, uhi, mlo, mhi = (
        e.agg(F.min("user_id"), F.max("user_id"), F.min("m"), F.max("m"))
        .collect()[0]
    )
    uspan, mspan = uhi - ulo, mhi - mlo

    # sweep of box predicates: user slices ~1/8 wide x time windows ~1/4
    # wide at varied offsets — wide enough in time to span several
    # time-sorted files (where z-order's both-dims boxing pays)
    def read_rows(boxes, rows, pred):
        return sum(
            r
            for box, r in zip(boxes, rows)
            if _files_matching([box], pred)
        )

    n_read = z_read = pred_rows = 0
    zfile_paths = sorted(glob.glob(os.path.join(zpath, "*.parquet")))
    for ui in range(4):
        for mi in range(3):
            pred = (
                (ulo + uspan * (2 * ui) // 8, ulo + uspan * (2 * ui + 1) // 8),
                (mlo + mspan * mi // 4, mlo + mspan * (mi + 1) // 4),
            )
            n_read += read_rows(nb, nrows, pred)
            z_read += read_rows(zb, zrows, pred)
            want = e.where(
                F.col("user_id").between(*pred[0])
                & F.col("m").between(*pred[1])
            ).count()
            pred_rows += want
            # pruning must stay CORRECT: the matching z files hold every
            # predicate row
            zf = [
                f
                for f, box in zip(zfile_paths, zb)
                if _files_matching([box], pred)
            ]
            got = (
                spark.read.parquet(*zf)
                .where(
                    F.col("user_id").between(*pred[0])
                    & F.col("m").between(*pred[1])
                )
                .count()
            )
            assert got == want
    assert pred_rows > 0
    # read amplification: rows fetched per predicate row. The time-sorted
    # layout always fetches ALL users inside the time window (~8x here);
    # z-order must be strictly better in aggregate.
    assert z_read < n_read, (z_read, n_read, pred_rows)


def _file_rows(path: str) -> list[int]:
    return [
        pq.ParquetFile(f).metadata.num_rows
        for f in sorted(glob.glob(os.path.join(path, "*.parquet")))
    ]
