"""Corpus curation chain as a library operator (and spark-submit stage):
quality gate + repetition gate + cross-doc substring-duplication gate,
then exact-duplicate keeper election — the standard pre-training filter
stack, composed into ONE Spark plan.

The driver-contract query ``corpus_curation_full`` is this function plus
a per-source aggregation; the spark-submit surface is
``python -m fetch_engines_spark.job --stage curate``.

Scale shape (10^12 docs): the quality and repetition signals are
shuffle-free scan-stage columns; the substring gate adds one
fingerprint aggregation + one equi-join (see
dedup.duplicated_ngram_stats); keeper election is one hash-groupBy and
one left-semi join.  Everything is map-side-combinable; no operator
materializes per-group state proportional to corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import duplicated_ngram_stats
from .text import quality_columns, repetition_columns


def curate_corpus(
    docs: DataFrame,
    min_quality: int = 4,
    max_shared_window_bp: int = 5000,
    text_col: str = "text",
) -> DataFrame:
    """documents(doc_id, text, ...) → the kept subset (one doc per exact
    duplicate group; passing all three quality gates), with the gate
    signals carried as columns (quality_score, n_tokens,
    repetition_flagged, shared_window_bp) for downstream auditing.

    The quality and repetition signals are pure per-row expressions and
    ride the SCAN (withColumns — no join, no shuffle); only the
    cross-doc substring signal genuinely aggregates, so the chain's
    corpus-wide shuffles are exactly that aggregation's."""
    qc = quality_columns(text_col)
    rc = repetition_columns(text_col)
    enriched = (
        docs.withColumn("quality_score", qc["quality_score"])
        .withColumn("n_tokens", qc["n_tokens"])
        .withColumn("repetition_flagged", rc["repetition_flagged"])
    )
    sub = duplicated_ngram_stats(docs, text_col).select("doc_id", "shared_window_bp")
    passed = (
        enriched.join(sub, "doc_id")
        .filter(
            (F.col("quality_score") >= min_quality)
            & (~F.col("repetition_flagged"))
            & (F.col("shared_window_bp") < max_shared_window_bp)
        )
    )
    # keeper election as a WINDOW over the content hash (min doc_id wins)
    # — the previous groupBy + self-semi-join planned the whole gate
    # chain (incl. the fingerprint aggregation join) TWICE and re-ran
    # the post-shuffle half per action; the window is one shuffle on the
    # hash and the chain appears once
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(text_col)).orderBy("doc_id")
    return (
        passed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def curation_stats(kept: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-group corpus stats over the kept set (the audit table a
    curation run publishes alongside the corpus)."""
    return kept.groupBy(group_col).agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tokens").alias("kept_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


def strip_boilerplate_spans(
    docs: DataFrame, min_docs: int = 3, spans_col: str = "spans"
) -> DataFrame:
    """Corpus-level boilerplate removal over interleaved span documents —
    the C4/RefinedWeb "repeated line" rule re-expressed on the span data
    model: a TEXT span whose exact text appears in >= ``min_docs``
    distinct documents is boilerplate (nav bars, footers, cookie
    banners survive per-document extraction because every page carries
    them; only the corpus view exposes them) and is removed from every
    document.  Media spans and under-threshold text ride through
    untouched, span order is preserved, offsets keep their original
    per-document values.

    Returns (doc_id, spans, n_text_removed).

    Scale shape (10^12 docs): one posexplode, one combinable
    two-level aggregation for distinct-doc counts (groupBy text-hash x
    countDistinct doc), one equi-join of the exploded spans against the
    boilerplate hash set (left; AQE broadcasts it when small — at high
    ``min_docs`` the set is tiny relative to the corpus), and one
    groupBy(doc_id) reassembly.  No per-group state beyond a document's
    own spans."""
    # posexplode_outer: a doc with an empty or NULL spans array must
    # survive as a row with zero spans, not silently vanish from the
    # corpus (the same defect class canonicalize_media_refs fixed for
    # NULL doc_ids)
    ex = docs.select(
        "doc_id", F.posexplode_outer(spans_col).alias("pos", "span")
    ).withColumn(
        "th",
        F.when(F.col("span.kind") == "text", F.md5(F.col("span.text"))),
    )
    boiler = (
        ex.filter(F.col("th").isNotNull())
        .groupBy("th")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("th", F.lit(1).alias("__bp"))
    )
    # join ONLY the hash-keyed rows: media spans and NULL-text spans all
    # carry th=NULL, and shuffling them into the join would pile every
    # NULL key onto one partition for rows that can never match; they
    # union back with __bp=NULL (kept) instead
    keyed = ex.filter(F.col("th").isNotNull()).join(boiler, "th", "left")
    unkeyed = ex.filter(F.col("th").isNull()).withColumn("__bp", F.lit(None).cast("int"))
    j = keyed.unionByName(unkeyed)
    # collect condition is pos-based, NOT span-based: a NULL span ELEMENT
    # inside a real array has a position and must survive (parity with
    # the unnest-based oracle), while the posexplode_outer row of an
    # empty/NULL array has pos NULL and must collapse to zero spans
    return j.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__bp").isNull() & F.col("pos").isNotNull(),
                        F.struct("pos", "span"),
                    )
                )
            ),
            lambda x: x["span"],
        ).alias(spans_col),
        F.sum(F.coalesce("__bp", F.lit(0))).cast("long").alias("n_text_removed"),
    )
