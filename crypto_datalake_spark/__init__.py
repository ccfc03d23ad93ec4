"""crypto_datalake_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference lake (shashankniranjan/Crypto-DataLake, a Polars+Parquet+SQLite
single-node platform) as idiomatic Spark DataFrame/SQL/Structured Streaming,
designed for multi-executor scale:

- ``session``   — SparkSession construction (UTC, AQE, tuned shuffle).
- ``io``        — lake table loaders (schema-normalised, TIMESTAMP_NTZ).
- ``ops``       — reusable operator library (as-of joins, limited ffill,
                  dedup-keep-last, gaps-and-islands, weighted averages,
                  nearest-rank percentiles, time bucketing, dense spines).
- ``queries``   — the driver-facing query catalog: every operator of
                  SURVEY.md §2 runnable as ``(spark, sf_dir) -> DataFrame``
                  with a DuckDB oracle.
- ``pipelines`` — composed domain pipelines (minute builder, HTF rollup).
- ``streaming`` — Structured Streaming analogues of the live subsystem.
"""

__version__ = "0.1.0"
