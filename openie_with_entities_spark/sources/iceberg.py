"""Iceberg table integration (import-gated; parquet fallback in sandbox).

The north rule targets Iceberg tables for transcripts/triples/entity nodes.
This container ships no Iceberg runtime jar, so every storage touchpoint in
the engine goes through the two helpers below: with the jar on the
classpath they bind to an Iceberg catalog (giving snapshot isolation,
hidden-partitioning by ``bucket(N, conv_id)``, and atomic commits that make
plans/checkpoint.py's lineage-after-data ordering transactional); without
it they fall back to plain parquet paths with identical dataframe shapes.

Cluster config (spark-submit):
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.kg=org.apache.spark.sql.catalog.iceberg.SparkCatalog
    --conf spark.sql.catalog.kg.type=hadoop
    --conf spark.sql.catalog.kg.warehouse=<warehouse-uri>

Table DDL the engine expects (created on first write):
    CREATE TABLE kg.db.transcripts (conv_id string, turn_idx int,
        role string, text string, tool string, ts timestamp)
    USING iceberg PARTITIONED BY (bucket(4096, conv_id))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    """Iceberg table name (catalog.db.table) when the runtime is present
    and the identifier looks like one; parquet path otherwise."""
    if "/" not in name_or_path and iceberg_available(spark):
        return spark.read.table(name_or_path)
    return spark.read.parquet(name_or_path)


def write_table(
    df: DataFrame, name_or_path: str, mode: str = "append"
) -> None:
    spark = df.sparkSession
    if "/" not in name_or_path and iceberg_available(spark):
        df.writeTo(name_or_path).append() if mode == "append" else (
            df.writeTo(name_or_path).createOrReplace()
        )
        return
    df.write.mode(mode if mode != "replace" else "overwrite").parquet(
        name_or_path
    )
