"""semantic_dedup family: properties past the DuckDB oracle.

The md5-cell tier's full decision table is value-hash-oracled through
the driver contract (`semantic_dedup`); this file pins the core prune
semantics on closed-form inputs (keep-min-id, greedy non-transitive
decisions, threshold boundary, cell-miss behavior), the IVF production
tier's exact-duplicate guarantee (identical vectors always share a
nearest centroid, so exact dups can never escape pruning), and
one-row-per-vector totality.
"""

import pytest
from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.similarity import (
    ivf_centroids,
    semantic_dedup,
    semantic_dedup_ivf,
    semantic_dedup_md5,
)


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cell string"
    )


def test_keep_min_id_and_cell_miss(spark):
    # 2 is a near-clone of 1 in the same cell -> pruned with dup_of=1;
    # 3 is orthogonal -> kept; 4 is IDENTICAL to 1 but in another cell
    # -> kept (the SemDeDup trade: cross-cell duplicates are the
    # partitioner's recall loss, not the prune rule's)
    d = _cells(spark, [
        (1, [1.0, 0.0], "c0"),
        (2, [0.9999, 0.0141], "c0"),
        (3, [0.0, 1.0], "c0"),
        (4, [1.0, 0.0], "c1"),
    ])
    out = {r["vec_id"]: r for r in semantic_dedup(d, threshold=0.95).collect()}
    assert len(out) == 4
    assert not out[2]["keep"] and out[2]["dup_of"] == 1
    assert out[2]["dup_score"] == pytest.approx(0.9999, abs=1e-3)
    assert out[1]["keep"] and out[1]["dup_of"] is None
    assert out[3]["keep"]
    assert out[4]["keep"]


def test_greedy_prune_is_not_transitive(spark):
    # three co-cell clones: 2 and 3 both have 1 as their smallest
    # above-threshold lower-id neighbor, even though 2 is itself
    # pruned — the decision is a pure function of the pair set, no
    # closure (matches the semantic_dedup docstring contract)
    d = _cells(spark, [
        (1, [1.0, 0.0], "c0"),
        (2, [0.9999, 0.0141], "c0"),
        (3, [0.9996, 0.0283], "c0"),
    ])
    out = {r["vec_id"]: r for r in semantic_dedup(d, threshold=0.95).collect()}
    assert out[1]["keep"]
    assert not out[2]["keep"] and out[2]["dup_of"] == 1
    assert not out[3]["keep"] and out[3]["dup_of"] == 1


def test_threshold_is_strict_on_unrounded_score(spark):
    # cos(45deg) ~= 0.7071: above a 0.7 threshold, below 0.71 — the
    # cut applies to the exact fold, not a rounded display value
    d = _cells(spark, [
        (1, [1.0, 0.0], "c0"),
        (2, [1.0, 1.0], "c0"),
    ])
    hi = semantic_dedup(d, threshold=0.71).collect()
    lo = semantic_dedup(d, threshold=0.70).collect()
    assert all(r["keep"] for r in hi)
    assert {r["vec_id"]: r["keep"] for r in lo} == {1: True, 2: False}


def test_ivf_tier_exact_duplicates_never_escape(spark):
    # identical vectors have identical nearest-centroid assignments BY
    # CONSTRUCTION, so unlike the hashed-cell tiers the IVF tier can
    # never lose an exact duplicate to a cell miss
    import hashlib

    def vec(i):
        # deterministic pseudo-random 8-dim vector in [-1, 1): 800
        # base pairs at expected |cos| ~ 0.35 sigma, so nothing but
        # the planted exact clones clears a 0.999 threshold
        return [
            (int(hashlib.md5(f"{i},{d}".encode()).hexdigest()[:8], 16)
             % 2000) / 1000.0 - 1.0
            for d in range(8)
        ]

    base = [(i, vec(i)) for i in range(40)]
    clones = [(100 + i, list(v)) for i, v in base[:10]]
    emb = spark.createDataFrame(
        base + clones, "vec_id long, embedding array<float>")
    C = ivf_centroids(emb, n_centroids=4, iters=3, dim=8)
    out = {r["vec_id"]: r
           for r in semantic_dedup_ivf(emb, C, threshold=0.999).collect()}
    assert len(out) == 50
    for i in range(10):
        assert not out[100 + i]["keep"]
        assert out[100 + i]["dup_of"] == i
        assert out[100 + i]["dup_score"] == pytest.approx(1.0, abs=1e-9)


def test_md5_tier_totality_and_schema(spark):
    emb = spark.createDataFrame(
        [(i, [float((i * 3 + d) % 7) - 3.0 for d in range(8)])
         for i in range(30)],
        "vec_id long, embedding array<float>")
    out = semantic_dedup_md5(emb, threshold=0.95, n_planes=4, dim=8)
    rows = out.collect()
    assert len(rows) == 30
    assert out.columns == ["vec_id", "cell", "keep", "dup_of", "dup_score"]
    # cells are 4-bit sign strings
    assert all(len(r["cell"]) == 4 and set(r["cell"]) <= {"0", "1"}
               for r in rows)
    # every pruned row carries a smaller dup_of; every kept row nulls
    for r in rows:
        if r["keep"]:
            assert r["dup_of"] is None and r["dup_score"] is None
        else:
            assert r["dup_of"] < r["vec_id"]
