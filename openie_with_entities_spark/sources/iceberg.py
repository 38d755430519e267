"""Iceberg table I/O helpers (import-gated; parquet fallback in sandbox).

The north rule targets Iceberg tables for transcripts/triples/entity
nodes. This container ships no Iceberg runtime jar, so these are OPT-IN
helpers a deployment substitutes at its storage boundaries (run_pipeline's
--input/--output, the checkpoint base) — the engine's internal
checkpoint/metrics writes remain plain parquet until a deployment rebinds
them. With the jar on the classpath the helpers bind to an Iceberg
catalog (snapshot isolation, hidden partitioning by ``bucket(N,
conv_id)``, atomic commits that would make plans/checkpoint.py's
lineage-after-data ordering transactional); without it they fall back to
parquet paths with identical dataframe shapes.

Cluster config (spark-submit):
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.kg.type=hadoop
    --conf spark.sql.catalog.kg.warehouse=<warehouse-uri>

Table DDL the engine expects (write_table creates it on first write):
    CREATE TABLE kg.db.transcripts (conv_id string, turn_idx int,
        role string, text string, tool string, ts timestamp)
    USING iceberg PARTITIONED BY (bucket(4096, conv_id))

Identifier routing: a name is treated as an Iceberg table only when the
runtime is present AND it is slash-free, dotted (catalog.db.table), and
not a ``*.parquet`` file name — everything else is a parquet path.
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


def _is_table_identifier(spark: SparkSession, name: str) -> bool:
    return (
        "/" not in name
        and "." in name
        and not name.endswith(".parquet")
        and iceberg_available(spark)
    )


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    """Iceberg table name (catalog.db.table) when the runtime is present
    and the identifier looks like one; parquet path otherwise."""
    if _is_table_identifier(spark, name_or_path):
        return spark.read.table(name_or_path)
    return spark.read.parquet(name_or_path)


def write_table(
    df: DataFrame, name_or_path: str, mode: str = "append"
) -> None:
    """``mode``: 'append' (creates the table on first write —
    DataFrameWriterV2.append alone would raise NoSuchTable) or
    'replace'/'overwrite'. Other Spark modes ('ignore', 'error') are
    REJECTED on both backends rather than silently meaning different
    things per backend (createOrReplace would have destroyed data a
    parquet-mode 'ignore' caller expected to keep)."""
    if mode not in ("append", "replace", "overwrite"):
        raise ValueError(
            f"write_table supports append/replace/overwrite, got {mode!r}"
        )
    spark = df.sparkSession
    if _is_table_identifier(spark, name_or_path):
        if mode == "append":
            if spark.catalog.tableExists(name_or_path):
                df.writeTo(name_or_path).append()
            else:
                df.writeTo(name_or_path).create()
        else:
            df.writeTo(name_or_path).createOrReplace()
        return
    df.write.mode("append" if mode == "append" else "overwrite").parquet(
        name_or_path
    )
