"""containment_pairs: asymmetric copy detection over winnowing fingerprints.

The full pair table is DuckDB-oracled through the driver contract
(planted-excerpt corpus); this file pins the semantics the oracle only
witnesses in aggregate: the asymmetric doc-inside-doc case that a
symmetric Jaccard threshold misses, exact-duplicate symmetry, the
max_df boilerplate guard, and the min_containment cut.
"""

from pyspark.sql import Row

from medical_pdf__ocr_structured_ccd_ccda_output_spark.operators.corpus import (
    containment_pairs,
    fingerprints,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


_EXCERPT = ("the quick brown fox jumps over the lazy dog while the "
            "patient reports persistent headaches since early march")
_HOST_PAD = ("entirely unrelated narrative about inventory systems and "
             "warehouse logistics procedures for seasonal distribution "
             "centers across multiple regional facilities nationwide "
             "including overflow staging zones near the loading docks")


def test_doc_inside_doc_detected_asymmetrically(spark):
    # doc0 is (almost) entirely the excerpt; doc1 embeds the excerpt
    # inside a much larger body.  Containment of 0-in-1 must be high
    # while 1-in-0 stays low — the asymmetric case.
    d = _corpus(spark, [_EXCERPT, _HOST_PAD + " " + _EXCERPT + " " + _HOST_PAD])
    rows = containment_pairs(d, min_containment=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["containment_a_in_b"] >= 0.5
    assert r["containment_b_in_a"] < 0.5
    # symmetric Jaccard over the same fingerprint sets would MISS it
    jac = r["n_common"] / (r["n_fp_a"] + r["n_fp_b"] - r["n_common"])
    assert jac < 0.5


def test_exact_duplicates_are_mutually_contained(spark):
    d = _corpus(spark, [_EXCERPT, _EXCERPT, _HOST_PAD])
    rows = containment_pairs(d, min_containment=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["containment_a_in_b"] == 1.0
    assert r["containment_b_in_a"] == 1.0
    assert r["n_common"] == r["n_fp_a"] == r["n_fp_b"]


def test_min_containment_cut_is_inclusive_on_the_larger_side(spark):
    d = _corpus(spark, [_EXCERPT, _HOST_PAD + " " + _EXCERPT])
    all_pairs = containment_pairs(d, min_containment=0.0).collect()
    assert len(all_pairs) == 1
    hi = max(all_pairs[0]["containment_a_in_b"],
             all_pairs[0]["containment_b_in_a"])
    # threshold exactly at the measured max keeps the pair...
    assert len(containment_pairs(d, min_containment=hi).collect()) == 1
    # ...and anything above it drops it
    assert containment_pairs(d, min_containment=hi + 1e-6).count() == 0


def test_max_df_guard_drops_boilerplate_fingerprints(spark):
    # Excerpt planted in 4 docs -> its fingerprints have df=4; with
    # max_df=3 they are boilerplate and no pair survives.  The two
    # genuinely-identical pad docs (df=2 fingerprints) still pair.
    texts = ["uniquely phrased preamble about quarterly budget review "
             "meetings and staffing allocations " + _EXCERPT,
             "alpha beta gamma delta epsilon zeta " + _EXCERPT,
             "one two three four five six seven eight " + _EXCERPT,
             "nine ten eleven twelve thirteen fourteen " + _EXCERPT,
             _HOST_PAD, _HOST_PAD]
    d = _corpus(spark, texts)
    kept = containment_pairs(d, min_containment=0.5, max_df=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in kept}
    assert (4, 5) in pairs
    assert all(a >= 4 for a, _ in pairs)   # excerpt-driven pairs gone
    # without the guard the excerpt fans out pairs among docs 0-3
    unguarded = {(r["doc_a"], r["doc_b"])
                 for r in containment_pairs(d, min_containment=0.3).collect()}
    assert any(a < 4 for a, _ in unguarded)


def test_cache_modes_agree_and_invalid_rejected(spark):
    import pytest

    d = _corpus(spark, [_EXCERPT, _HOST_PAD + " " + _EXCERPT])
    base = sorted(map(tuple, containment_pairs(d).collect()))
    local = sorted(map(tuple, containment_pairs(d, cache="local").collect()))
    assert base == local
    with pytest.raises(ValueError):
        containment_pairs(d, cache="disk")


def test_counts_match_fingerprint_set_arithmetic(spark):
    d = _corpus(spark, [_EXCERPT, _HOST_PAD + " " + _EXCERPT + " end"])
    fp = {r["doc_id"]: set(r["fingerprints"]) for r in fingerprints(d).collect()}
    r = containment_pairs(d, min_containment=0.0).collect()[0]
    assert r["n_fp_a"] == len(fp[0])
    assert r["n_fp_b"] == len(fp[1])
    assert r["n_common"] == len(fp[0] & fp[1])
    assert r["containment_a_in_b"] == round(r["n_common"] / r["n_fp_a"], 6)
