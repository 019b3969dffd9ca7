"""Incremental dedup: clean a NEW batch of documents against an
EXISTING corpus index without touching the corpus.

A production training-data pipeline ingests daily; re-running the full
dedup DAG (``corpus_job.py``) over 10^12 historical documents to admit
a 10^7-document batch would be absurd.  The staged job already
materializes exactly the index this needs — the per-content digest map
and one minhash signature per distinct content — so the incremental
path is:

1. **exact vs corpus** — content_key equi-join against the corpus key
   map.  Key is a uniform 128-bit digest: no skew, and Catalyst
   broadcasts the SMALL side (the new batch) so the 10^12-row corpus
   is never shuffled.
2. **exact within batch** — groupBy(content_key) over what survived.
3. **near vs corpus** — band the batch survivors' signatures and
   equi-join on (band, bucket) against the corpus band table, batch
   side broadcast-hinted: a scan of the corpus bands with a map-side
   hash probe, zero corpus shuffle.  est-Jaccard >= threshold drops
   the batch doc (the corpus doc is canonical by seniority — the
   reference's first-wins rule for equal-quality merges,
   /root/reference/src/services/deduplication_service.py:101-170).
4. **near within batch** — LSH self-join over the remaining batch
   survivors + transitive closure (operators/graph.py); longest text
   then smallest doc_id survives per cluster, matching the full DAG.

Every decision records WHY (reason) and AGAINST WHAT (dup_of), so the
lineage table answers "where did my document go" exactly like the full
job's decision table.

The hash family and (num_hashes, bands, shingle_n) MUST match the run
that built the index — ``corpus_job.py --incremental`` reads them from
the stage manifest and refuses a mismatch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .operators import corpus, graph
from . import corpus_pipeline as cp

REASON_KEPT = "kept"
REASON_EXACT_CORPUS = "exact_dup_of_corpus"
REASON_EXACT_BATCH = "exact_dup_in_batch"
REASON_NEAR_CORPUS = "near_dup_of_corpus"
REASON_NEAR_BATCH = "near_dup_in_batch"


@dataclass
class IncrementalDedupResult:
    decisions: DataFrame   # per batch doc: (doc_id, content_key, reason, dup_of, keep)
    survivors: DataFrame   # kept batch rows (input schema)
    new_keys: DataFrame    # (content_key, keep_doc_id) to append to the index
    new_sigs: DataFrame    # (doc_id, signature, text_len) to append to the index


def incremental_dedup(
    batch: DataFrame,
    corpus_keys: DataFrame,
    corpus_sigs: DataFrame,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    hash_fn: str = "xxhash64",
    max_iter: int = 30,
    broadcast_batch: bool = True,
    corpus_bands: DataFrame | None = None,
) -> IncrementalDedupResult:
    """Dedup `batch` against a corpus index.

    batch:        new documents ``(doc_id, text, ...)``; doc_ids must
                  not collide with corpus doc_ids (the caller owns id
                  allocation — e.g. a per-ingest id range).
    corpus_keys:  ``(content_key, keep_doc_id)`` — the index's exact
                  map (``doc_keys``/``exact_sigs`` tables of the job).
    corpus_sigs:  ``(doc_id, signature)`` — one minhash signature per
                  distinct kept content, same hash family/params.
    broadcast_batch: hint the batch side of the two corpus probes as
                  broadcast.  The corpus side of both probes is an
                  INNER join, so the (small) batch side is
                  broadcastable and the 10^12-row corpus is scanned
                  once with a map-side hash probe — zero corpus
                  shuffle.  Disable for batches too big for the
                  driver; the joins fall back to shuffled hash joins
                  on uniform digest keys (or shuffle-free scans if the
                  index tables are bucketed by join key on disk).
    corpus_bands: optional PRECOMPUTED corpus band table
                  ``(doc_id, band, bucket)`` (write-once index
                  artifact, see ``corpus_job.run_incremental_job``).
                  When given, the admit skips re-deriving band buckets
                  from every corpus signature array — the probe scans
                  the narrow artifact instead, and the signature table
                  is only scanned for the candidate join-back.
                  Default None derives bands from ``corpus_sigs`` in
                  the admit (already narrow: the signature array never
                  rides the band join either way).
    """
    maybe_bc = F.broadcast if broadcast_batch else (lambda df: df)
    keyed = cp.content_keyed(batch).select("doc_id", "content_key", "text")

    # -- 1. exact vs corpus: inner-probe the corpus key map with the
    # batch broadcast, then left-join the (batch-sized) hit list back
    # so every input doc still gets a decision row
    corpus_hit = (
        corpus_keys.select("content_key",
                           F.col("keep_doc_id").alias("_corpus_doc"))
        .join(maybe_bc(keyed.select("doc_id", "content_key")), "content_key")
        # min-agg instead of raw join output: duplicate index rows for
        # a content (e.g. a replayed stream epoch's double-append) must
        # not duplicate batch decision rows, and attribution stays
        # deterministic
        .groupBy("doc_id")
        .agg(F.min("_corpus_doc").alias("_corpus_doc"))
    )
    vs_corpus = keyed.join(maybe_bc(corpus_hit), "doc_id", "left")

    # -- 2. exact within batch (among docs whose content is new to the
    # corpus): min doc_id per content keeps
    batch_min = (
        vs_corpus.filter(F.col("_corpus_doc").isNull())
        .groupBy("content_key")
        .agg(F.min("doc_id").alias("_batch_keep"))
    )
    exact = vs_corpus.join(maybe_bc(batch_min), "content_key", "left")
    exact_survivors = exact.filter(
        F.col("_corpus_doc").isNull() & (F.col("doc_id") == F.col("_batch_keep"))
    ).select("doc_id", "text")

    # -- 3. near vs corpus: band batch-survivor signatures, probe the
    # corpus band table (broadcast the batch side — the corpus is
    # scanned once, never shuffled).  NARROW LSH (round-5, the same
    # fix round 4 landed on the batch self-join): the band probe
    # carries only (doc_id, band, bucket) — never the num_hashes-long
    # signature array — and the est-Jaccard check joins signatures
    # back against the DISTINCT candidate set only.  Before, the
    # corpus side dragged its signature through the 8-way band
    # derivation and the join (~8x the signature bytes in flight per
    # admit); measured on the x1280-index admit bench as the dominant
    # cost.  Both join-backs are broadcast inner probes: still zero
    # corpus shuffle.
    sigs = corpus.minhash_signatures(
        exact_survivors, num_hashes, shingle_n, hash_fn
    )
    batch_bands = corpus.banded_signatures(sigs, num_hashes, bands, hash_fn)
    if corpus_bands is None:
        corpus_bands = corpus.banded_signatures(
            corpus_sigs, num_hashes, bands, hash_fn
        )
    corpus_bands = corpus_bands.select("doc_id", "band", "bucket")
    bb = batch_bands.select(
        F.col("doc_id").alias("_bid"), "band", "bucket",
    )
    cand = (
        corpus_bands.join(maybe_bc(bb), ["band", "bucket"])
        .select(F.col("doc_id").alias("_cdoc"), "_bid")
        .dropDuplicates()
    )
    hits = (
        corpus_sigs.select(F.col("doc_id").alias("_cdoc"),
                           F.col("signature").alias("_csig"))
        .join(maybe_bc(cand), "_cdoc")
        .join(maybe_bc(sigs.select(F.col("doc_id").alias("_bid"),
                                   F.col("signature").alias("_bsig"))),
              "_bid")
        .withColumn(
            "est",
            corpus.est_jaccard_expr(F.col("_csig"), F.col("_bsig"), num_hashes),
        )
        .filter(F.col("est") >= jaccard_threshold)
        # deterministic attribution: the smallest matching corpus doc
        .groupBy("_bid")
        .agg(F.min("_cdoc").alias("_near_corpus_doc"))
    )

    # -- 4. near within batch: LSH self-join + closure over what's left
    still = sigs.join(
        hits.select(F.col("_bid").alias("doc_id")), "doc_id", "left_anti"
    )
    pairs = corpus.lsh_pairs_from_signatures(
        still, num_hashes, bands, jaccard_threshold, hash_fn
    )
    still_docs = exact_survivors.join(
        still.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id", F.length("text").alias("text_len"))
    clusters = graph.near_dup_clusters(
        still_docs, pairs, max_iter=max_iter, len_col="text_len"
    )
    # dup_of must point at the doc that SURVIVES, not the cluster label
    # (the min-id labelling doc can itself be a dropped loser)
    cluster_surv = clusters.filter(F.col("keep")).select(
        "cluster_id", F.col("doc_id").alias("_surv")
    )
    cluster_loser = (
        clusters.filter(~F.col("keep"))
        .join(cluster_surv, "cluster_id")
        .select(F.col("doc_id").alias("_bid"),
                F.col("_surv").alias("_cluster_doc"))
    )

    # -- decisions: one row per input batch doc, first matching reason wins
    near = hits.unionByName(
        cluster_loser.withColumnRenamed("_cluster_doc", "_near_corpus_doc")
        .withColumn("_in_batch", F.lit(True)),
        allowMissingColumns=True,
    ).select(
        F.col("_bid").alias("doc_id"),
        F.col("_near_corpus_doc").alias("_near_doc"),
        F.coalesce("_in_batch", F.lit(False)).alias("_near_in_batch"),
    )
    dec = (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id", "content_key",
            F.when(F.col("_corpus_doc").isNotNull(), F.lit(REASON_EXACT_CORPUS))
            .when(F.col("doc_id") != F.col("_batch_keep"), F.lit(REASON_EXACT_BATCH))
            .when(F.col("_near_doc").isNotNull() & ~F.col("_near_in_batch"),
                  F.lit(REASON_NEAR_CORPUS))
            .when(F.col("_near_doc").isNotNull(), F.lit(REASON_NEAR_BATCH))
            .otherwise(F.lit(REASON_KEPT)).alias("reason"),
            F.coalesce(
                "_corpus_doc",
                F.when(F.col("doc_id") != F.col("_batch_keep"), F.col("_batch_keep")),
                "_near_doc",
                F.lit(-1),
            ).cast("long").alias("dup_of"),
        )
        .withColumn("keep", F.col("reason") == REASON_KEPT)
    )
    survivors = batch.join(
        dec.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )
    kept_ids = dec.filter("keep").select("doc_id")
    new_keys = (
        keyed.join(kept_ids, "doc_id", "left_semi")
        .select("content_key", F.col("doc_id").alias("keep_doc_id"))
    )
    new_sigs = sigs.join(kept_ids, "doc_id", "left_semi").join(
        exact_survivors.select("doc_id", F.length("text").alias("text_len")),
        "doc_id",
    )
    return IncrementalDedupResult(
        decisions=dec, survivors=survivors,
        new_keys=new_keys, new_sigs=new_sigs,
    )
