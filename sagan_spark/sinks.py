"""Sink writer abstraction: Iceberg when the runtime has the Iceberg Spark
extension, parquet otherwise (this sandbox ships no Iceberg jars).

At cluster scale the intended DDL (SURVEY §3.4) is::

    CREATE TABLE db.alerts (...)
    USING iceberg
    PARTITIONED BY (bucket(64, conv_id), days(ts))

which gives partition pruning on both the correlation key and time.  The
parquet fallback keeps the same layout via ``partitionBy`` on a bucket
column so the physical file layout matches what the Iceberg spec would
produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False


def write_sink(df: DataFrame, path_or_table: str,
               bucket_col: str | None = "conv_id", n_buckets: int = 128,
               mode: str = "overwrite") -> None:
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in path_or_table:
        (df.writeTo(path_or_table).using("iceberg")
         .createOrReplace())
        return
    if bucket_col and bucket_col in df.columns:
        # cluster rows by bucket(conv_id) with ONE shuffle into n_buckets
        # files — the parquet analog of Iceberg's bucket transform.  (A
        # directory partitionBy("bucket") would write tasks×buckets small
        # files and sort per task — measurably slower and worse to scan.)
        df = df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(bucket_col)),
                             F.lit(n_buckets)).cast("int"))
        (df.repartition(n_buckets, F.col("bucket"))
         .write.mode(mode).parquet(path_or_table))
    else:
        df.write.mode(mode).parquet(path_or_table)
