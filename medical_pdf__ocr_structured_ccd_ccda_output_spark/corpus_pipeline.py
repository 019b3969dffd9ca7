"""Corpus-scale dedup pipeline: exact dedup → minhash/LSH near-dup
pairs → transitive-closure clustering → survivor selection + lineage.

Reference analog: dedup is a first-class pipeline stage in the
reference (``/root/reference/main.py:170-174`` runs
``DeduplicationService`` over every extracted document before output;
the greedy merge loops live in
``src/services/deduplication_service.py:101-480``).  At 10^12-document
scale that per-process greedy loop becomes the staged shuffle DAG
here:

1. **content keys + exact dedup** — ``md5(norm_text)`` digest,
   groupBy(digest) with map-side combine.  Every duplicate group keys
   on a uniform 128-bit hash: no skew.
2. **minhash signatures once per DISTINCT content** — computing
   signatures after exact dedup means the shingle scan (the expensive
   part) never runs twice for byte-identical boilerplate, which is the
   bulk of web-corpus duplication.
3. **LSH banded candidate pairs** — equi-join on (band, bucket),
   estimated-Jaccard filter; no all-pairs work anywhere.
4. **transitive closure** (``operators/graph.py`` hash-min + pointer
   jumping) + canonical-survivor choice (longest text, then smallest
   doc_id — the reference's longer-entry-wins rule).
5. **per-document decision lineage** — one row per input doc recording
   its content key, whether it survived exact dedup, its near-dup
   cluster, and the final keep verdict; the kept-documents table is a
   semi-join against this.

``corpus_dedup`` composes the whole DAG lazily for the contract query
and tests; ``corpus_job.py`` materializes it stage-by-stage with a
``StageManifest`` for resumable 100 TB runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .operators import corpus, graph


@dataclass
class CorpusDedupResult:
    keyed: DataFrame       # (doc_id, content_key) per input doc
    exact_map: DataFrame   # (content_key, keep_doc_id, dup_count, text_len)
    signatures: DataFrame  # (doc_id, signature) per exact survivor
    pairs: DataFrame       # (doc_a, doc_b, est_jaccard)
    clusters: DataFrame    # (doc_id, cluster_id, cluster_size, keep)
    decisions: DataFrame   # per input doc: full lineage + final keep
    survivors: DataFrame   # kept document rows (input schema)


def content_keyed(documents: DataFrame) -> DataFrame:
    """Input docs + the exact-dedup content digest."""
    return documents.withColumn(
        "content_key", F.md5(corpus.norm_text(F.col("text")))
    )


def exact_map_of(keyed: DataFrame, len_col: str | None = None) -> DataFrame:
    """One row per distinct content: canonical doc (min doc_id), its
    raw-text length (for survivor ranking downstream — raw lengths can
    differ within a group since the digest normalizes case/whitespace),
    and the duplicate count.  min(struct(doc_id, len)) rides the same
    map-side-combined groupBy as the count.

    ``len_col``: precomputed raw-length column (the composed DAG passes
    a slim checkpointed projection so the wide text column never enters
    this aggregation); default computes ``length(text)`` in place."""
    length_expr = F.col(len_col) if len_col else F.length("text")
    return (
        keyed.groupBy("content_key")
        .agg(
            F.min(
                F.struct(F.col("doc_id"), length_expr.alias("l"))
            ).alias("_k"),
            F.count("*").alias("dup_count"),
        )
        .select(
            "content_key",
            F.col("_k.doc_id").alias("keep_doc_id"),
            F.col("_k.l").alias("text_len"),
            "dup_count",
        )
    )


def assemble_decisions(keyed: DataFrame, exact_map: DataFrame,
                       clusters: DataFrame) -> DataFrame:
    """Per-document decision lineage.

    Output: ``(doc_id, content_key, exact_keep, cluster_id,
    cluster_size, keep)``.  Exact-dropped docs get sentinel cluster
    columns (-1 / 0) rather than NULLs so the table is dense and
    join-friendly (and dtype-stable across engines).  ``keep`` is the
    final verdict: survived exact dedup AND is its near-dup cluster's
    canonical survivor.
    """
    ex = keyed.select("doc_id", "content_key").join(
        exact_map.select("content_key", "keep_doc_id"), "content_key"
    ).select(
        "doc_id", "content_key",
        (F.col("doc_id") == F.col("keep_doc_id")).alias("exact_keep"),
    )
    cl = clusters.select(
        F.col("doc_id").alias("_cid"), "cluster_id", "cluster_size",
        F.col("keep").alias("_near_keep"),
    )
    return (
        ex.join(cl, ex["doc_id"] == cl["_cid"], "left")
        .select(
            "doc_id", "content_key", "exact_keep",
            F.coalesce("cluster_id", F.lit(-1).cast("long")).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(0).cast("long")).alias("cluster_size"),
            F.coalesce("_near_keep", F.lit(False)).alias("keep"),
        )
    )


def corpus_dedup(documents: DataFrame, *, num_hashes: int = 32,
                 bands: int = 8, shingle_n: int = 3,
                 jaccard_threshold: float = 0.7,
                 hash_fn: str = "xxhash64",
                 max_iter: int = 30) -> CorpusDedupResult:
    """The full dedup DAG as lazy DataFrames (no materialization).

    ``hash_fn="md5"`` is the engine-portable tier (DuckDB-oracled,
    contract query ``corpus_dedup_pipeline``); ``"xxhash64"`` is the
    production/bench tier, pinned tier-equivalent in
    ``tests/test_corpus_job.py``.

    The narrow exact map is ``localCheckpoint``-ed once: it feeds three
    branches (the signature rep-filter, the decision lineage, the
    closure's vertex set), each of which would otherwise re-run the
    content-digest scan + groupBy.  The closure stage already
    materializes eagerly (``graph.connected_components`` checkpoints
    its label/edge tables), so the composition is eager at construction
    either way; the staged job (``corpus_job.py``) materializes every
    stage as a table instead and does not pay this.
    """
    keyed = content_keyed(documents)
    # slim lineage projection, lazily checkpointed: the normalize+digest
    # scan is the DAG's single most repeated stage (it feeds the exact
    # map, the rep join, AND the per-doc decision lineage — measured as
    # two duplicate ~150 executor-second stages per run at ×320 before
    # this).  The eager exact_map materialization right below computes
    # it once; every later consumer reads the 3-narrow-column blocks.
    keyed_slim = keyed.select(
        "doc_id", "content_key", F.length("text").alias("_tl")
    ).localCheckpoint(eager=False)
    exact_map = exact_map_of(keyed_slim, len_col="_tl") \
        .localCheckpoint(eager=True)
    reps = keyed.join(
        exact_map.select(F.col("keep_doc_id").alias("doc_id"), "text_len"),
        "doc_id",
    )
    signatures = corpus.minhash_signatures(
        reps.select("doc_id", "text"), num_hashes, shingle_n, hash_fn
    )
    pairs = corpus.lsh_pairs_from_signatures(
        signatures, num_hashes, bands, jaccard_threshold, hash_fn
    )
    # the closure's vertex set is exactly the exact-dedup survivors, and
    # the checkpointed exact_map already carries (keep_doc_id, text_len)
    # — deriving vertices from it (instead of `reps`) saves a full
    # corpus re-scan (content-digest + join) inside the eager closure
    clusters = graph.near_dup_clusters(
        exact_map.select(F.col("keep_doc_id").alias("doc_id"), "text_len"),
        pairs, max_iter=max_iter, len_col="text_len",
    )
    decisions = assemble_decisions(keyed_slim, exact_map, clusters)
    survivors = documents.join(
        decisions.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )
    return CorpusDedupResult(
        keyed=keyed, exact_map=exact_map, signatures=signatures,
        pairs=pairs, clusters=clusters, decisions=decisions,
        survivors=survivors,
    )
