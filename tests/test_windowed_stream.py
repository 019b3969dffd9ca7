"""Event-time windowed metrics: watermark semantics, measured.

Pins the contract windowed.py documents:
* a fully-finalized streamed replay equals the batch twin row-for-row
  (same function, watermark analyzer-eliminated in batch);
* a row arriving after the watermark passed its window's end is
  dropped (visible in numRowsDroppedByWatermark) — late data within
  the delay is counted;
* windows the watermark never passes (the sentinel's own) are withheld.
"""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.extract import (
    extract_turns,
)
from medical_pdf__ocr_structured_ccd_ccda_output_spark.streaming.stream import (
    TRANSCRIPT_SCHEMA,
)
from medical_pdf__ocr_structured_ccd_ccda_output_spark.streaming.windowed import (
    run_windowed_metrics_stream,
    windowed_turn_metrics,
)

T0 = dt.datetime(2024, 1, 1)


def _turn(conv, idx, role, minutes, boundary=False):
    body = (f"Patient follow-up note {conv}-{idx}: stable, continue "
            f"current medications without change.")
    if boundary:
        body = "Visit Date: 03/15/2024\n" + body
    return (conv, idx, role, body, None, T0 + dt.timedelta(minutes=minutes))


def _write_slab(spark, in_dir, rows):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(str(in_dir))
    time.sleep(1.1)  # distinct mtimes -> deterministic batch order


def _collect(spark, name):
    return {
        (r["window_start_epoch"], r["role"]):
            (r["turn_count"], r["boundary_count"], r["total_chars"],
             r["sum_conf_x100"])
        for r in spark.table(name).collect()
    }


def test_streamed_equals_batch_twin(spark, tmp_path):
    """Three ts-ordered slabs + a far-future sentinel: every real
    window finalizes (final no-data batch applies the last watermark),
    and the streamed result equals the batch twin on the real rows.
    The sentinel's own window is withheld (watermark never passes it)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    slabs = [
        [_turn("c1", 0, "user", 5, boundary=True),
         _turn("c1", 1, "assistant", 20),
         _turn("c2", 0, "user", 40)],
        [_turn("c1", 2, "user", 70, boundary=True),
         _turn("c2", 1, "assistant", 95)],
        [_turn("c2", 2, "user", 130),
         _turn("c1", 3, "assistant", 170)],
    ]
    sentinel = [_turn("zz", 0, "sentinel", 24 * 60)]
    for slab in slabs:
        _write_slab(spark, in_dir, slab)
    _write_slab(spark, in_dir, sentinel)

    q = run_windowed_metrics_stream(
        spark, str(in_dir), str(tmp_path / "ckpt"), "win_eq_out")
    q.awaitTermination(180)
    got = _collect(spark, "win_eq_out")

    real = [r for slab in slabs for r in slab]
    batch = windowed_turn_metrics(
        extract_turns(spark.createDataFrame(real, TRANSCRIPT_SCHEMA),
                      with_sections=False))
    exp = {
        (r["window_start_epoch"], r["role"]):
            (r["turn_count"], r["boundary_count"], r["total_chars"],
             r["sum_conf_x100"])
        for r in batch.collect()
    }
    assert got == exp
    # 3 hours x per-role rows actually present; sentinel hour absent
    sentinel_epoch = int((T0 + dt.timedelta(hours=24)).timestamp())
    assert all(ws != sentinel_epoch for ws, _ in got)
    # boundary counting flowed through extraction
    assert sum(v[1] for v in got.values()) == 2


def test_too_late_row_dropped(spark, tmp_path):
    """A row whose window end is behind the watermark (computed from
    strictly earlier batches) is dropped, not double-emitted: hour-0
    finalizes WITHOUT the straggler, and the drop is visible in
    numRowsDroppedByWatermark."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_slab(spark, in_dir, [_turn("c1", 0, "user", 5),
                                _turn("c1", 1, "user", 20)])
    _write_slab(spark, in_dir, [_turn("c1", 2, "user", 150)])  # wm -> 02:00
    _write_slab(spark, in_dir, [_turn("c1", 3, "user", 210)])  # wm -> 03:00
    _write_slab(spark, in_dir, [_turn("c1", 4, "late-role", 10)])  # too late
    _write_slab(spark, in_dir, [_turn("zz", 0, "sentinel", 24 * 60)])

    q = run_windowed_metrics_stream(
        spark, str(in_dir), str(tmp_path / "ckpt"), "win_late_out")
    q.awaitTermination(180)
    got = _collect(spark, "win_late_out")

    hour0 = int(T0.timestamp())
    assert got[(hour0, "user")][0] == 2          # straggler not counted
    assert (hour0, "late-role") not in got        # and not re-emitted
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress for op in p["stateOperators"]
    )
    assert dropped == 1


def test_within_delay_late_row_counted(spark, tmp_path):
    """Late arrival within the watermark delay lands in its (still
    open) window: watermark after slab 1 is 01:10-30min = 00:40, so a
    00:30 row in slab 2 joins hour-0 before it finalizes."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_slab(spark, in_dir, [_turn("c1", 0, "user", 5),
                                _turn("c1", 1, "user", 70)])
    _write_slab(spark, in_dir, [_turn("c1", 2, "user", 30)])   # late, in delay
    _write_slab(spark, in_dir, [_turn("zz", 0, "sentinel", 24 * 60)])

    q = run_windowed_metrics_stream(
        spark, str(in_dir), str(tmp_path / "ckpt"), "win_okl_out")
    q.awaitTermination(180)
    got = _collect(spark, "win_okl_out")
    assert got[(int(T0.timestamp()), "user")][0] == 2


def test_state_stays_bounded_over_long_replay(spark, tmp_path):
    """The 100 TB claim in windowed.py, measured: with window=1h and
    delay=30min the state store never holds more than
    ceil(delay/window)+1 = 2 windows per role, no matter how many
    hours stream through.  Eight hour-advancing slabs -> every batch's
    numRowsTotal stays <= 2; all eight finalized windows are emitted."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for h in range(8):
        _write_slab(spark, in_dir, [
            _turn("c1", 2 * h, "user", h * 60 + 5),
            _turn("c1", 2 * h + 1, "user", h * 60 + 40),
        ])
    _write_slab(spark, in_dir, [_turn("zz", 0, "sentinel", 48 * 60)])

    q = run_windowed_metrics_stream(
        spark, str(in_dir), str(tmp_path / "ckpt"), "win_bound_out")
    q.awaitTermination(300)
    got = _collect(spark, "win_bound_out")

    hours = {ws for ws, _ in got}
    assert hours == {int((T0 + dt.timedelta(hours=h)).timestamp())
                     for h in range(8)}
    assert all(v[0] == 2 for k, v in got.items() if k[1] == "user")
    state_rows = [op["numRowsTotal"]
                  for p in q.recentProgress for op in p["stateOperators"]]
    assert state_rows, "no state metrics recorded"
    assert max(state_rows) <= 2, state_rows
