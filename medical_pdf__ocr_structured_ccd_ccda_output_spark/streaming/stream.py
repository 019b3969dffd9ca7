"""Structured Streaming surface.

The reference is batch-only (MAX_CONCURRENT_DOCUMENTS=1, no streaming
ops — LLM_TECHNICAL_SPEC.md:711); this wrapper is the engine's own
extension: the per-turn extraction stage is stateless, so it runs
unchanged under readStream, and complete conversations are sessionized
per micro-batch in foreachBatch (a conversation's turns are assumed to
arrive within one batch window; cross-batch conversations would need
applyInPandasWithState — left as the documented upgrade path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])


def extraction_stream(spark: SparkSession, input_dir: str,
                      with_sections: bool = True) -> DataFrame:
    """readStream over a transcripts parquet directory -> streaming
    extracted-turns DataFrame (stateless: every operator is a projection)."""
    from ..operators.extract import extract_turns

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    return extract_turns(stream, with_sections=with_sections)


def run_stream_to_parquet(spark: SparkSession, input_dir: str,
                          output_dir: str, checkpoint_dir: str,
                          sessionize_per_batch: bool = True):
    """Streaming extraction with per-micro-batch sessionization via
    foreachBatch (exactly-once through the checkpointed sink)."""
    from ..operators.sessionize import assign_visits

    extracted = extraction_stream(spark, input_dir)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = assign_visits(batch_df) if sessionize_per_batch else batch_df
        out.write.mode("append").parquet(output_dir)

    return (
        extracted.writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
