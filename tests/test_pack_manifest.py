"""pack_manifest: the doc->bin mapping really is a packing.

Exact values are DuckDB-oracled through the driver contract; this file
pins the structural invariants of a valid concat-and-chunk pack:
* offsets are contiguous — each doc starts exactly where the previous
  one (in doc_id order, per group) ended;
* bin spans are consistent with the offsets (first_bin at the start
  offset, last_bin at the last occupied token);
* a document longer than the capacity straddles the right number of
  bins; an empty document occupies zero tokens at its offset's bin.
"""

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    pack_manifest,
)

CAP = 64


def test_offsets_contiguous_and_bins_consistent(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = pack_manifest(d, capacity=CAP).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["source"], []).append(r)
    assert len(by_group) > 1
    straddlers = 0
    for g, rs in by_group.items():
        rs.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rs:
            assert r["stream_offset"] == expect
            expect += r["n_tokens"]
            assert r["first_bin"] == r["stream_offset"] // CAP
            last_tok = r["stream_offset"] + max(r["n_tokens"], 1) - 1
            assert r["last_bin"] == last_tok // CAP
            straddlers += r["last_bin"] > r["first_bin"]
    assert straddlers > 0  # capacity small enough that docs straddle


def test_empty_and_oversized_docs(spark):
    d = spark.createDataFrame(
        [("s", 0, "w " * 200), ("s", 1, ""), ("s", 2, "x")],
        "source string, doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_manifest(d, capacity=CAP).collect()}
    assert out[0]["n_tokens"] == 200
    assert (out[0]["first_bin"], out[0]["last_bin"]) == (0, 199 // CAP)
    assert out[1]["n_tokens"] == 0
    assert out[1]["first_bin"] == out[1]["last_bin"] == 200 // CAP
    assert out[2]["stream_offset"] == 200
