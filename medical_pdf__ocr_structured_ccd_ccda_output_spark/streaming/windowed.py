"""Event-time windowed extraction metrics with watermarked late data.

The reference is batch-only (LLM_TECHNICAL_SPEC.md:711 — one document
at a time, no streaming surface); like `stream.py` this module is the
engine's own streaming extension: the stage-metrics rollup (reference
A2/A14 family, ocr_service.py success counters) re-expressed over
EVENT time, so a continuously-ingesting cluster gets per-hour
extraction-quality metrics that tolerate late-arriving turns up to a
bounded watermark delay instead of requiring a nightly batch rollup.

Semantics (Structured Streaming, append output mode):

* ``withWatermark(ts, delay)`` — the engine's watermark is the max
  event time across COMPLETED micro-batches minus ``delay``; a batch
  is filtered/evicted against the watermark computed from strictly
  earlier batches (measured: a row arriving after the watermark passed
  its window end is counted in ``numRowsDroppedByWatermark`` and
  excluded from the emitted window — tests/test_windowed_stream.py).
* a window [start, end) is emitted exactly once, when the watermark
  passes ``end``; with ``trigger(availableNow=True)`` the final
  no-data micro-batch (spark.sql.streaming.noDataMicroBatches.enabled,
  default true) applies the last watermark and flushes every
  finalized window, so a bounded replay terminates with its results
  emitted rather than parked in the state store.
* windows the watermark has NOT passed stay in state and are withheld
  — callers that need a full flush append a sentinel row with
  ``ts > max_real_ts + delay + window`` (its own window is withheld
  in turn; see q_streaming_windowed_metrics in __spark_entry__.py).

The SAME function works on a batch DataFrame — the analyzer's
EliminateEventTimeWatermark rule removes the watermark node for
non-streaming plans — which is what makes the streamed result
oracle-able: a fully-finalized streamed run must equal the batch twin
row-for-row, and the batch twin is plain SQL.

100 TB notes:

* one shuffle, keyed on (window, role): role has a handful of values
  but the window component makes the composite key high-cardinality
  and uniform over event time, and the pre-shuffle partial aggregate
  (HashAggregate partial -> Exchange -> HashAggregate final) reduces
  each map partition to (#windows x #roles) rows before any bytes
  move — the exchange is tiny regardless of input row count.
* state is bounded: the store holds only windows the watermark has
  not passed — ceil(delay / window) + 1 open windows per role —
  independent of input volume; everything older was emitted and
  evicted.  That bound is what makes the operator runnable forever.
* all metric columns are integral (counts, summed lengths, confidence
  summed as exact 2-decimal hundredths) so results are bit-stable
  across partitionings and engines — no float accumulation order
  dependence anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: output schema of :func:`windowed_turn_metrics` (all deterministic /
#: integral except role): window_start_epoch is the tumbling-window
#: start as epoch seconds (UTC session tz — engine default, session.py).
WINDOWED_METRIC_COLS = [
    "window_start_epoch", "role", "turn_count", "boundary_count",
    "total_chars", "sum_conf_x100",
]


def windowed_turn_metrics(turns: DataFrame,
                          window_duration: str = "1 hour",
                          watermark_delay: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window of per-role extraction metrics.

    ``turns`` must carry ``ts`` (event-time timestamp), ``role``,
    ``text_clean``, ``confidence`` (2-decimal, F1 estimator) and
    ``is_boundary`` — i.e. the output of ``extract_turns`` over a
    transcripts table/stream that kept ``ts`` and ``role``.

    Works identically on streaming and batch inputs (watermark is a
    no-op in batch); per (window, role) emits turn count, visit-
    boundary count, total cleaned characters, and the confidence sum
    in exact hundredths (confidence is HALF_EVEN-rounded to 2 decimals
    upstream, so ``confidence * 100`` is integral — summing the
    integer keeps the column bit-stable under any aggregation order,
    where a double sum would not be).
    """
    return (
        turns.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum(F.col("is_boundary").cast("long")).alias("boundary_count"),
            F.sum(F.length("text_clean")).alias("total_chars"),
            F.sum(F.round(F.col("confidence") * 100).cast("long"))
            .alias("sum_conf_x100"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("window_start_epoch"),
            "role", "turn_count", "boundary_count", "total_chars",
            "sum_conf_x100",
        )
    )


def run_windowed_metrics_stream(spark, input_dir: str, checkpoint_dir: str,
                                queryName: str,
                                window_duration: str = "1 hour",
                                watermark_delay: str = "30 minutes",
                                max_files_per_trigger: int = 1):
    """availableNow replay of a transcripts parquet directory through
    extraction + :func:`windowed_turn_metrics` into an append-mode
    memory sink (table ``queryName``).  Returns the StreamingQuery;
    callers awaitTermination then read ``spark.table(queryName)``.

    Files are consumed in mtime order (``max_files_per_trigger`` per
    micro-batch), so writers control watermark progression by writing
    time-ordered slabs — the contract the oracled driver query and the
    tests rely on."""
    from ..operators.extract import extract_turns
    from .stream import TRANSCRIPT_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    extracted = extract_turns(stream, with_sections=False)
    agg = windowed_turn_metrics(extracted, window_duration, watermark_delay)
    return (
        agg.writeStream.format("memory").queryName(queryName)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
