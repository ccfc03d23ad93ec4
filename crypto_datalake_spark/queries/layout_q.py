"""Z-order clustering key over the events table (data-layout tier).

The registered query certifies the KEY computation cross-engine (the
part that must be deterministic and cheap — pure codegen'd integer/
double expressions, one broadcast of a 1-row min/max frame, no
shuffle); the LAYOUT effect (tighter file bounding boxes, more files
pruned by a box predicate) is verified empirically against parquet
footers in tests/test_layout.py, where the same key drives
``ops.layout.write_zordered``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_datalake_spark.io import load_table
from crypto_datalake_spark.ops.layout import (
    dim_bucket,
    dim_bucket_sql,
    interleave_bits,
    interleave_bits_sql,
)
from crypto_datalake_spark.queries.registry import register

# minutes since the events epoch — integral on both engines (the start
# sits on a minute boundary, so boundary-crossing vs elapsed-minute
# semantics agree)
_MIN_EXPR = "timestampdiff(MINUTE, TIMESTAMP'2024-01-01 00:00:00', ts)"
_MIN_SQL = "date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts)"


@register(
    "layout_zorder_key",
    sql=f"""
    WITH e AS (
      SELECT event_id, user_id, {_MIN_SQL} AS m FROM events
    ),
    mm AS (
      SELECT min(user_id) AS umin, max(user_id) AS umax,
             min(m) AS mmin, max(m) AS mmax
      FROM e
    ),
    b AS (
      SELECT event_id,
             {dim_bucket_sql('user_id', 'umin', 'umax')} AS bu,
             {dim_bucket_sql('m', 'mmin', 'mmax')} AS bt
      FROM e CROSS JOIN mm
    )
    SELECT event_id, bu, bt,
           {interleave_bits_sql(['bu', 'bt'])} AS zkey
    FROM b
    """,
    doc="Z-order (Morton) clustering key over (user_id, event minute): "
    "min-max scale each dimension to a 16-bit bucket (double "
    "arithmetic, IEEE-identical cross-engine), interleave the bits "
    "into one 32-bit sort key. The plan is one tiny min/max aggregate "
    "broadcast back over the scan — no data shuffle; the key feeds "
    "ops.layout.write_zordered (range repartition + in-partition "
    "sort), whose file-pruning payoff is footer-verified in "
    "tests/test_layout.py. The lake-layout lever for predicates that "
    "box BOTH time and key at 100 TB.",
)
def layout_zorder_key(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr(_MIN_EXPR).alias("m")
    )
    mm = e.agg(
        F.min("user_id").alias("umin"),
        F.max("user_id").alias("umax"),
        F.min("m").alias("mmin"),
        F.max("m").alias("mmax"),
    )
    b = e.crossJoin(F.broadcast(mm)).select(
        "event_id",
        dim_bucket(F.col("user_id"), F.col("umin"), F.col("umax")).alias("bu"),
        dim_bucket(F.col("m"), F.col("mmin"), F.col("mmax")).alias("bt"),
    )
    return b.select(
        "event_id",
        "bu",
        "bt",
        interleave_bits([F.col("bu"), F.col("bt")]).alias("zkey"),
    )
