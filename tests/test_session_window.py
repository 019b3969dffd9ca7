"""Native session_window gap-sessions: boundary semantics, measured.

Pins the contract session_window_rollup documents:
* two events exactly `gap` apart MERGE into one session (a new session
  starts only when the difference is STRICTLY greater than the gap) —
  the semantics the DuckDB islands oracle encodes with `> gap`;
* session start = first event ts, end = last event ts + gap;
* the native operator equals the lag/prefix-sum islands form on the
  driver events table (same islands, independently computed).
"""

import datetime as dt
import os

from pyspark.sql import Window, functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.sessionize import (
    session_window_rollup,
)

T0 = dt.datetime(2024, 1, 1)
GAP_US = 30 * 60 * 1_000_000


def _ev(uid, minutes, seconds=0, value=1.0):
    return (uid, T0 + dt.timedelta(minutes=minutes, seconds=seconds), value)


def test_gap_boundary_is_strict(spark):
    """diff == gap merges; diff == gap + 1s splits; end = last + gap."""
    df = spark.createDataFrame(
        [_ev(1, 0), _ev(1, 30),            # exactly gap apart -> one session
         _ev(2, 0), _ev(2, 30, 1),         # 1s over gap -> two sessions
         _ev(3, 0), _ev(3, 29, 59)],       # inside gap -> one session
        "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in
           session_window_rollup(df).groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_sessions"),
                F.max("session_end_us").alias("last_end"))
           .collect()}
    assert out[1]["n_sessions"] == 1
    assert out[2]["n_sessions"] == 2
    assert out[3]["n_sessions"] == 1
    t0us = int(T0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    # user 1: end = last event (00:30) + gap
    assert out[1]["last_end"] == t0us + 30 * 60 * 1_000_000 + GAP_US


def test_native_equals_islands_form(spark):
    """session_window == lag/prefix-sum islands on the events table
    (sf0.001) — the two independent formulations produce identical
    (key, start, end, count, max) rows."""
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    native = {tuple(r) for r in session_window_rollup(ev).collect()}

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_sess = F.when(F.lag(us).over(w).isNull(), 0).when(
        us - F.lag(us).over(w) > GAP_US, 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (
        ev.withColumn("_sid", F.sum(new_sess).over(run))
        .groupBy("user_id", "_sid")
        .agg(F.min(us).alias("session_start_us"),
             (F.max(us) + GAP_US).alias("session_end_us"),
             F.count(F.lit(1)).alias("n_events"),
             F.max("value").alias("max_value"))
        .drop("_sid")
        .select("user_id", "session_start_us", "session_end_us",
                "n_events", "max_value")
    )
    assert native == {tuple(r) for r in islands.collect()}
    assert len(native) > 15  # more sessions than users: gaps really split


def _sw_agg(df):
    return (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max("value").alias("max_value"))
        .select("user_id", F.unix_micros("sw.start").alias("session_start_us"),
                F.unix_micros("sw.end").alias("session_end_us"),
                "n_events", "max_value")
    )


def test_session_window_streams_and_merges_across_batches(spark, tmp_path):
    """The same session_window expression is a stateful streaming
    aggregation: sessions whose events arrive in DIFFERENT micro-
    batches merge in the state store (u3's 00:05 and 00:20 land in
    separate slabs but emit ONE session), and a fully-finalized
    availableNow replay equals the batch twin row-for-row.  Slab order
    is pinned with explicit mtimes; a far-future sentinel advances the
    watermark past every real session's end so the final no-data batch
    flushes them; the sentinel's own session is withheld."""
    schema = "user_id long, ts timestamp, value double"
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def ev(uid, minutes, value=1.0):
        return (uid, T0 + dt.timedelta(minutes=minutes), value)

    slabs = [
        [ev(1, 0), ev(1, 10), ev(2, 5), ev(3, 5)],
        [ev(3, 20), ev(1, 50), ev(2, 90)],      # u3 merges cross-batch
        [ev(1, 200, 7.0)],
    ]
    sentinel = [(99, T0 + dt.timedelta(days=365), 0.0)]
    mtime = 1_700_000_000
    for slab in slabs + [sentinel]:
        before = set(os.listdir(in_dir))
        spark.createDataFrame(slab, schema).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        for f in set(os.listdir(in_dir)) - before:
            os.utime(os.path.join(in_dir, f), (mtime, mtime))
        mtime += 60

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = (_sw_agg(stream.withWatermark("ts", "30 minutes"))
         .writeStream.format("memory").queryName("sw_stream_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.table("sw_stream_out").collect()}

    real = [r for slab in slabs for r in slab]
    exp = {tuple(r) for r in
           _sw_agg(spark.createDataFrame(real, schema)).collect()}
    assert got == exp
    by_user = {}
    for row in got:
        by_user[row[0]] = by_user.get(row[0], 0) + 1
    # u3's two events, from different micro-batches, merged: ONE session
    assert by_user[3] == 1
    assert next(r for r in got if r[0] == 3)[3] == 2
    assert 99 not in by_user  # sentinel session withheld
