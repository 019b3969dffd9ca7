"""Semantic checks for the engine-portable md5 twins of the sketch/ANN
family (their exact-value gates are the DuckDB oracles in
__spark_entry__.oracle_sql; here we pin the algorithmic invariants on
hand-built corpora)."""

from __future__ import annotations

from pyspark.sql import functions as F

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators import (
    corpus,
    similarity,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
    (3, "the quick brown fox jumps over the lazy cat again and again"),  # near-dup
    (4, "completely different content about spark window aggregation plans"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_minhash_md5_exact_dup_pair(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in corpus.minhash_lsh_pairs(
            _docs(spark), num_hashes=16, bands=4,
            jaccard_threshold=0.5, hash_fn="md5",
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0          # identical docs: all components equal
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_md5_hamming_zero_for_dups(spark):
    rows = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in corpus.simhash_near_dups(
            _docs(spark), max_hamming=3, hash_fn="md5"
        ).collect()
    }
    assert rows[(1, 2)] == 0
    assert all(h <= 3 for h in rows.values())


def test_fingerprints_md5_set_equality_for_dups(spark):
    fps = {
        r["doc_id"]: tuple(r["fingerprints"])
        for r in corpus.fingerprints(_docs(spark), hash_fn="md5").collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[4]
    # md5 hex digests, sorted ascending
    assert list(fps[1]) == sorted(fps[1])
    assert all(len(h) == 32 for h in fps[1])


def test_lsh_topk_md5_finds_exact_duplicate(spark):
    import math

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.5, -0.25] * 4),
            (1, [1.0, 0.0, 0.5, -0.25] * 4),        # duplicate of 0
            (2, [-1.0, 2.0, 0.125, 0.75] * 4),
            (3, [0.5, -1.5, 2.0, 0.0] * 4),
        ],
        ["vec_id", "embedding"],
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = similarity.lsh_topk_md5(emb, q, k=2, n_planes=4, n_tables=4, dim=16)
    top = out.filter(F.col("rank") == 1).collect()[0]
    assert top["neighbor_id"] == 1
    assert math.isclose(top["score"], 1.0, rel_tol=1e-12)


def test_md5_planes_deterministic_and_portable():
    """Plane weights must derive from md5 nibble parity exactly as the
    DuckDB oracle computes them (instr('0123..f', first hex char))."""
    import hashlib

    planes = similarity._md5_planes(dim=8, n_planes=2, table=3)
    for p, row in enumerate(planes):
        for d, w in enumerate(row):
            nib = int(hashlib.md5(f"3,{p},{d}".encode()).hexdigest()[0], 16)
            assert w == (1.0 if nib % 2 == 0 else -1.0)
