"""Table IO abstraction: Iceberg when a runtime catalog is configured,
parquet directory layout otherwise (this sandbox has no Iceberg jar).

The pipeline only calls read_table/write_table, so flipping to Iceberg
is a spark-submit flag away:
  spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v>
    --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog ...
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str, name: str) -> DataFrame:
    """location = Iceberg table prefix (catalog.db) or a directory."""
    if "://" not in location and not location.startswith("/"):
        return spark.read.format("iceberg").load(f"{location}.{name}")
    return spark.read.parquet(os.path.join(location, f"{name}.parquet"))


def write_table(df: DataFrame, location: str, name: str,
                mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    if "://" not in location and not location.startswith("/"):
        writer = df.writeTo(f"{location}.{name}")
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(os.path.join(location, f"{name}.parquet"))
