"""Checkpointed manifest for resumable restarts (SURVEY §7.1).

The unit of resumability is a conv_id *range partition* (hash-bucketed
by pmod(xxhash64(conv_id), n_shards)).  A run processes shard by shard;
after each shard's outputs commit, the shard id is appended to the
manifest (a tiny parquet dir).  A restarted run anti-joins its input
against completed shards and recomputes only the remainder — the
reference's "partial results on failure" behavior lifted to cluster
scale (driver-side manifest, no Structured Streaming needed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def shard_of(conv_id_col, n_shards: int):
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_shards)).cast("int")


class Manifest:
    def __init__(self, spark: SparkSession, path: str, run_id: str):
        self.spark = spark
        self.path = path
        self.run_id = run_id

    def completed_shards(self) -> set[int]:
        try:
            rows = (
                self.spark.read.parquet(self.path)
                .filter(F.col("run_id") == self.run_id)
                .select("shard")
                .collect()
            )
            return {r["shard"] for r in rows}
        except Exception:  # first run: no manifest yet
            return set()

    def mark_done(self, shard: int, rows_out: int) -> None:
        df = self.spark.createDataFrame(
            [(self.run_id, shard, rows_out)], "run_id string, shard int, rows_out long"
        )
        df.coalesce(1).write.mode("append").parquet(self.path)

    def pending(self, transcripts: DataFrame, n_shards: int) -> list[int]:
        done = self.completed_shards()
        return [s for s in range(n_shards) if s not in done]

    def filter_shard(self, transcripts: DataFrame, shard: int,
                     n_shards: int) -> DataFrame:
        return transcripts.filter(shard_of(F.col("conv_id"), n_shards) == shard)


def output_shard_dir(base: str, name: str, shard: int) -> str:
    return os.path.join(base, f"{name}.parquet", f"shard={shard}")
