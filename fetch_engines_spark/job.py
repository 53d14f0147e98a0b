"""spark-submit job entry for the extraction pipeline.

Deploy (north_rule packaging):

    python -c "from fetch_engines_spark.packaging import build_pyfiles_zip as b; print(b())"
    spark-submit --py-files /tmp/fetch_engines_spark-0.1.0.zip \
        -- fetch_engines_spark/job.py \
        --input  <documents parquet/iceberg path> \
        --output <checkpoint root> \
        --run-id <run id> [--n-buckets 64] [--partitions 256] [--resume]

The job is idempotent per (run_id, bucket): re-running after a failure
anti-joins the ledger and only processes missing buckets (checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="fetch-engines-spark extraction job")
    p.add_argument("--input", required=True, help="documents table path (parquet)")
    p.add_argument(
        "--input-format",
        default="parquet",
        choices=("parquet", "warc"),
        help="extract-stage input: parquet documents (interleaved-span "
        "schema), or warc — a directory/glob of WARC archives (plain or "
        "gzip members, the Common Crawl layout); 200/text-html response "
        "records are adapted into the documents shape before extraction",
    )
    p.add_argument("--output", required=True, help="checkpoint root directory")
    p.add_argument("--run-id", required=True)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--keep-markdown", action="store_true")
    p.add_argument(
        "--max-content-length",
        type=int,
        default=None,
        help="M13 truncation: cut markdown at a sentence boundary near this length",
    )
    p.add_argument("--table-format", default="parquet", help="sink format (parquet, or iceberg when the runtime jar is present)")
    p.add_argument("--master", default=None)
    p.add_argument(
        "--stage",
        default="extract",
        choices=("extract", "curate", "dedup", "compact-index", "media-dedup", "semdedup", "mix"),
        help="extract: spans→markdown with checkpoint/resume; curate: the "
        "quality/repetition/substring-gate + exact-dup-keeper chain over a "
        "documents(doc_id, text, source) table, writing kept corpus + stats; "
        "dedup: MinHash-LSH candidates → Jaccard verify → connected "
        "components → keepers, writing pairs/clusters/keepers; "
        "compact-index: merge N per-increment LSH index parquets "
        "(comma-separated --input) into one deduplicated index so the "
        "next increment reads one index, not N; "
        "media-dedup: perceptual near-dup over a media(media_id, payload) "
        "table (dHash for images, segment-loudness fingerprint for WAV, "
        "per-frame dHash containment for AVI/MJPEG video) "
        "writing signatures/pairs/canonical_map — with --docs, also "
        "rewrites every media span's media_ref to its cluster-canonical "
        "id across the interleaved documents; "
        "semdedup: SemDeDup semantic dedup over an embeddings(vec_id, "
        "embedding) table — k-means cells, within-cell cosine prune, "
        "writing semantic/ (vec_id, cell, n_close, keep); "
        "mix: deterministic training-mix construction at exact "
        "--mix-targets source ratios, writing mix/",
    )
    p.add_argument(
        "--mix-targets",
        default=None,
        help="--stage mix: comma-separated source:share_bp pairs, e.g. "
        "'web:6000,books:2500,code:1500' (shares in basis points; the "
        "limiting source sets the mix size)",
    )
    p.add_argument(
        "--mix-stratum-col", default="source",
        help="--stage mix: stratum column (default: source)",
    )
    p.add_argument(
        "--semdedup-centroids",
        type=int,
        default=8,
        help="--stage semdedup: k-means cells; scale ~ N/target_cluster_size",
    )
    p.add_argument(
        "--semdedup-threshold-bp",
        type=int,
        default=9500,
        help="--stage semdedup: within-cell cosine drop threshold (basis points)",
    )
    p.add_argument(
        "--semdedup-iters", type=int, default=2,
        help="--stage semdedup: Lloyd iterations",
    )
    p.add_argument(
        "--media-kind",
        default="image",
        choices=("image", "audio", "video"),
        help="--stage media-dedup signature type: image (PNG/GIF/JPEG "
        "dHash), audio (WAV fingerprint), or video (AVI/MJPEG per-frame "
        "dHash + clip-level frame-hash containment; pairs carry "
        "n_shared/share_bp instead of hamming)",
    )
    p.add_argument(
        "--min-share-bp",
        type=int,
        default=8000,
        help="video containment threshold: 10000 * shared distinct frame "
        "hashes / min clip hash-set size",
    )
    p.add_argument(
        "--docs",
        default=None,
        help="--stage media-dedup: interleaved documents(doc_id, spans) "
        "parquet whose media_refs are rewritten to cluster-canonical ids "
        "(written to {output}/documents)",
    )
    p.add_argument(
        "--incremental-signatures",
        default=None,
        help="--stage media-dedup: path to a prior run's "
        "{output}/signatures (or signatures_merged) parquet — the input "
        "is treated as a NEW crawl increment: every item near-duplicate "
        "of history is written to cross_dups (identity dups via a direct "
        "hash join against one representative per hash; hamming 1+ via "
        "the cross-corpus capped guard) and EXCLUDED from the "
        "within-increment pair/cluster outputs; the canonical map gains "
        "each dropped item's best history match (so --docs rewrites land "
        "on surviving history media); a merged signature table (history "
        "+ surviving increment) is written to signatures_merged for the "
        "next run.  History media is never re-decoded.  Increment "
        "media_ids must be fresh (re-crawled ids fail loudly).",
    )
    p.add_argument("--min-quality", type=int, default=4)
    p.add_argument("--max-shared-window-bp", type=int, default=5000)
    p.add_argument("--minhash-perms", type=int, default=128)
    p.add_argument("--band-size", type=int, default=8)
    p.add_argument("--max-bucket-size", type=int, default=2000)
    p.add_argument("--jaccard-threshold-bp", type=int, default=7000)
    p.add_argument(
        "--dedup-method",
        default="minhash",
        choices=("minhash", "simhash64"),
        help="candidate generator for --stage dedup: MinHash-LSH bands "
        "(shingle near-dups) or 64-bit SimHash pigeonhole blocks "
        "(hamming near-dups; cheaper signatures, no shingle explode)",
    )
    p.add_argument(
        "--max-hamming",
        type=int,
        default=3,
        help="simhash64 verify threshold (pigeonhole-exact for < 4)",
    )
    p.add_argument(
        "--incremental-index",
        default=None,
        help="path to a prior dedup run's {output}/index parquet: the "
        "input is treated as a NEW crawl increment — signature-identical "
        "docs vs the index are dropped without rescanning the historical "
        "corpus, band-collision candidates are written for auditing, and "
        "a MERGED index (prior + this increment's keepers) is written "
        "for the next run.  minhash method only; index and increment "
        "must share --minhash-perms/--band-size.",
    )
    return p.parse_args(argv)


def _run_curate(spark, args) -> dict:
    from .pipelines.curation import curate_corpus, curation_stats

    docs = spark.read.parquet(args.input)
    kept = curate_corpus(
        docs,
        min_quality=args.min_quality,
        max_shared_window_bp=args.max_shared_window_bp,
    )
    kept.write.mode("overwrite").parquet(f"{args.output}/kept")
    stats = curation_stats(spark.read.parquet(f"{args.output}/kept"))
    stats.write.mode("overwrite").parquet(f"{args.output}/stats")
    n_in = docs.count()
    n_kept = spark.read.parquet(f"{args.output}/kept").count()
    return {"stage": "curate", "n_input": n_in, "n_kept": n_kept}


def _run_compact_index(spark, args) -> dict:
    """Merge N per-increment LSH index parquets (comma-separated
    --input) into one deduplicated index at {output}/index."""
    from .pipelines.dedup import compact_minhash_indexes

    paths = [p.strip() for p in args.input.split(",") if p.strip()]
    if len(paths) < 2:
        raise ValueError("--stage compact-index wants >=2 comma-separated index paths")
    indexes = [spark.read.parquet(p) for p in paths]
    n_in = sum(ix.count() for ix in indexes)
    merged = compact_minhash_indexes(indexes)
    merged.write.mode("overwrite").parquet(f"{args.output}/index")
    n_out = spark.read.parquet(f"{args.output}/index").count()
    return {
        "stage": "compact-index",
        "n_inputs": len(paths),
        "n_rows_in": n_in,
        "n_rows_out": n_out,
    }


def _run_media_dedup(spark, args) -> dict:
    """Perceptual media near-dup: one fused decode+signature pass is
    WRITTEN to {output}/signatures — every downstream stage of this run
    (pairs, cross-dups, map) reads the parquet back instead of holding
    pixels in memory or re-decoding; a RE-INVOCATION of the stage
    re-decodes from scratch (unlike the extract stage's per-bucket
    resume — signature runs are single-pass by design).  Then banded
    pairs → connected components → canonical map; with --docs, the
    interleaved documents get their media_refs rewritten to
    cluster-canonical ids at {output}/documents (incremental runs
    extend the map with each dropped item's best history match, so
    spans referencing dropped increment media rewrite to surviving
    HISTORY ids — assumes history was itself canonicalized by its own
    run's map)."""
    from pyspark.sql import functions as F

    from .pipelines.multimodal import (
        afp_near_dup_pairs,
        audio_fingerprint,
        canonical_media_map,
        canonicalize_media_refs,
        dhash_near_dup_pairs,
        image_dhash,
    )

    from .pipelines.multimodal import video_frame_dhash, video_near_dup_pairs

    media = spark.read.parquet(args.input)
    if args.media_kind == "image":
        sign, hex_col = image_dhash, "dhash_hex"
        pair_fn = lambda s: dhash_near_dup_pairs(  # noqa: E731
            s, max_hamming=args.max_hamming, max_bucket_size=args.max_bucket_size
        )
    elif args.media_kind == "audio":
        sign, hex_col = audio_fingerprint, "afp_hex"
        pair_fn = lambda s: afp_near_dup_pairs(  # noqa: E731
            s, max_hamming=args.max_hamming, max_bucket_size=args.max_bucket_size
        )
    else:  # video: per-frame signatures, containment pairs
        sign, hex_col = video_frame_dhash, "dhash_hex"
        pair_fn = lambda s: video_near_dup_pairs(  # noqa: E731
            s, min_share_bp=args.min_share_bp, max_bucket_size=args.max_bucket_size
        )
    sign(media).write.mode("overwrite").parquet(f"{args.output}/signatures")
    sigs = spark.read.parquet(f"{args.output}/signatures")
    n_media = sigs.count()
    n_errors = sigs.filter("error IS NOT NULL").count()
    n_hist_dups = None
    cross = None
    if args.incremental_signatures:
        import os as _os

        from .pipelines.multimodal import incremental_media_near_dups

        if args.media_kind == "video":
            raise ValueError(
                "--incremental-signatures supports image/audio (one 64-bit "
                "hash per item); video clips carry per-frame hash SETS — "
                "run full video dedup per batch, or dedup at the frame "
                "level with --media-kind image over extracted frames"
            )

        for own in ("signatures", "signatures_merged"):
            if _os.path.abspath(args.incremental_signatures) == _os.path.abspath(
                f"{args.output}/{own}"
            ):
                raise ValueError(
                    "--incremental-signatures must not point inside this "
                    f"run's own --output — use a fresh --output per increment"
                )
        hist = spark.read.parquet(args.incremental_signatures)
        if hex_col not in hist.columns:
            raise ValueError(
                f"--incremental-signatures parquet lacks {hex_col} — it was "
                f"not written by a --media-kind {args.media_kind} run"
            )
        # re-crawl guard: an increment media_id already present in history
        # would silently merge two signatures under one id (the cross-pair
        # generator drops same-id pairs, and signatures_merged would carry
        # duplicate ids that fan out every later run) — fail loudly, like
        # the text index's re-crawled-id conflict guard
        n_conflicts = sigs.join(
            hist.select("media_id"), "media_id", "left_semi"
        ).count()
        if n_conflicts:
            raise ValueError(
                f"{n_conflicts} increment media_ids already exist in "
                "--incremental-signatures history — media ids must be "
                "unique per crawl (re-crawled items need fresh ids, or "
                "drop them from the increment)"
            )
        # 1) signature-IDENTITY dups by direct hash join (linear,
        #    cap-independent — every identical item is caught even when
        #    its bucket is capped in the banded path below).  History is
        #    collapsed to ONE representative id per hash first, so a hot
        #    hash (blank thumbnails) yields one audit row per increment
        #    item, never n_inc x n_hist.
        hist_rep = (
            hist.filter(f"{hex_col} IS NOT NULL")
            .groupBy(hex_col)
            .agg(F.min("media_id").alias("hist_id"))
        )
        identity = (
            sigs.filter(f"{hex_col} IS NOT NULL")
            .select("media_id", hex_col)
            .join(hist_rep, hex_col)
            .select("media_id", "hist_id", F.lit(0).alias("hamming"))
        )
        remaining = sigs.join(
            identity.select("media_id").distinct(), "media_id", "left_anti"
        )
        # 2) near-dup (hamming 1..max) via the banded cross-corpus path
        near = incremental_media_near_dups(
            remaining,
            hist,
            hex_col=hex_col,
            max_hamming=args.max_hamming,
            max_bucket_size=args.max_bucket_size,
        )
        identity.unionByName(near).write.mode("overwrite").parquet(
            f"{args.output}/cross_dups"
        )
        cross = spark.read.parquet(f"{args.output}/cross_dups")
        n_hist_dups = cross.select("media_id").distinct().count()
        # within-increment stages run on the SURVIVORS only
        sigs = remaining.join(
            cross.select("media_id").distinct(), "media_id", "left_anti"
        )
        hist.unionByName(sigs).write.mode("overwrite").parquet(
            f"{args.output}/signatures_merged"
        )
    pair_fn(sigs).write.mode("overwrite").parquet(f"{args.output}/pairs")
    pairs = spark.read.parquet(f"{args.output}/pairs")
    cmap_df = canonical_media_map(pairs)
    if cross is not None:
        # incremental: each dropped increment item maps to its BEST
        # history match (lowest hamming, then lowest hist_id) so span
        # rewrites land on surviving history media, never dangling refs
        cross_best = (
            cross.groupBy("media_id")
            .agg(F.min(F.struct("hamming", "hist_id")).alias("_m"))
            .select(
                F.col("media_id").alias("media_ref"),
                F.col("_m.hist_id").alias("canonical_ref"),
            )
        )
        cmap_df = cmap_df.unionByName(cross_best)
    cmap_df.write.mode("overwrite").parquet(f"{args.output}/canonical_map")
    cmap = spark.read.parquet(f"{args.output}/canonical_map")
    summary = {
        "stage": "media-dedup",
        "media_kind": args.media_kind,
        "n_media": n_media,
        "n_errors": n_errors,
        "n_pairs": pairs.count(),
        "n_remapped_media": cmap.count(),
    }
    if n_hist_dups is not None:
        summary["n_hist_dups"] = n_hist_dups
    if args.docs:
        docs = spark.read.parquet(args.docs)
        canonicalize_media_refs(docs, cmap).write.mode("overwrite").parquet(
            f"{args.output}/documents"
        )
        summary["n_docs"] = spark.read.parquet(f"{args.output}/documents").count()
    return summary


def _run_semdedup(spark, args) -> dict:
    """SemDeDup over an embeddings table: k-means cells + within-cell
    cosine prune (pipelines.similarity.semantic_dedup).  The
    --max-bucket-size flag is the degenerate-cell cap (same guard as
    every other bucketed generator)."""
    from .pipelines.similarity import semantic_dedup

    emb = spark.read.parquet(args.input)
    out = semantic_dedup(
        emb,
        n_centroids=args.semdedup_centroids,
        threshold_bp=args.semdedup_threshold_bp,
        n_iter=args.semdedup_iters,
        max_cluster_size=args.max_bucket_size,
    )
    out.write.mode("overwrite").parquet(f"{args.output}/semantic")
    sem = spark.read.parquet(f"{args.output}/semantic")
    n_in = sem.count()
    n_kept = sem.filter("keep = 1").count()
    return {
        "stage": "semdedup",
        "n_input": n_in,
        "n_kept": n_kept,
        "n_dropped": n_in - n_kept,
        "n_centroids": args.semdedup_centroids,
        "threshold_bp": args.semdedup_threshold_bp,
    }


def _run_mix(spark, args) -> dict:
    """Training-mix construction (pipelines.text.mixture_sample): the
    largest subcorpus at exactly the --mix-targets ratios, selected by
    deterministic md5 rank."""
    from pyspark.sql import functions as F

    from .pipelines.text import mixture_sample

    if not args.mix_targets:
        raise ValueError("--stage mix requires --mix-targets src:share_bp,...")
    targets: dict[str, int] = {}
    for part in args.mix_targets.split(","):
        name, _, share = part.strip().rpartition(":")
        if not name or not share.lstrip("-").isdigit():
            raise ValueError(f"--mix-targets entry {part!r} is not source:share_bp")
        if name in targets:
            # a dict would silently keep only the LAST share — a typo'd
            # duplicate must not produce a mis-proportioned mix
            raise ValueError(f"--mix-targets lists source {name!r} twice")
        targets[name] = int(share)
    docs = spark.read.parquet(args.input)
    out = mixture_sample(docs, targets, stratum_col=args.mix_stratum_col)
    out.write.mode("overwrite").parquet(f"{args.output}/mix")
    mix = spark.read.parquet(f"{args.output}/mix")
    per_stratum = {
        r[args.mix_stratum_col]: r["n"]
        for r in mix.groupBy(args.mix_stratum_col).agg(
            F.count("*").alias("n")
        ).collect()
    }
    return {
        "stage": "mix",
        "n_input": docs.count(),
        "n_mix": mix.count(),
        "per_stratum": per_stratum,
        "targets_bp": targets,
    }


def _run_dedup(spark, args) -> dict:
    from pyspark.sql import functions as F

    from .pipelines.dedup import (
        connected_components_star,
        minhash_candidate_pairs_fast,
        minhash_index,
        ngram_jaccard,
        simhash_candidate_pairs64,
    )

    docs = spark.read.parquet(args.input)
    sig_dropped = 0
    prior_index = None
    inc_verified = None
    if args.incremental_index:
        import os as _os

        if args.dedup_method != "minhash":
            raise ValueError("--incremental-index requires --dedup-method minhash")
        if _os.path.abspath(args.incremental_index) == _os.path.abspath(
            f"{args.output}/index"
        ):
            # overwriting the path being read would destroy the only copy
            # of the history index AFTER the expensive run completed
            raise ValueError(
                "--incremental-index must not point at this run's own "
                f"{args.output}/index — use a fresh --output per increment"
            )
        prior_index = spark.read.parquet(args.incremental_index)
        # the banding parameters are part of the persisted contract: a
        # mismatched index yields ZERO collisions (silent no-op dedup),
        # so the index self-describes and the run fails loudly instead
        if "mh_perms" not in prior_index.columns:
            raise ValueError(
                "--incremental-index parquet lacks mh_perms/mh_band_size "
                "metadata columns — not a {output}/index written by this job"
            )
        meta = prior_index.select("mh_perms", "mh_band_size").first()
        if meta and (
            meta["mh_perms"] != args.minhash_perms
            or meta["mh_band_size"] != args.band_size
        ):
            raise ValueError(
                f"index was built with --minhash-perms {meta['mh_perms']} "
                f"--band-size {meta['mh_band_size']}; this run uses "
                f"{args.minhash_perms}/{args.band_size} — band keys would "
                "never collide"
            )
        from .pipelines.candidates import cross_bucket_pairs
        from .pipelines.dedup import candidate_pairs_from_index

        # ONE signature pass over the increment: every downstream join
        # (cross candidates, sig drop, within-increment pairs) reads the
        # materialized index instead of re-deriving signatures from text
        new_buckets = minhash_index(
            docs, num_hashes=args.minhash_perms, band_size=args.band_size, fast=True
        ).localCheckpoint(eager=True)
        dup_ids = (
            new_buckets.select("doc_id", "sig_key")
            .distinct()
            .join(prior_index.select("sig_key").distinct(), "sig_key")
            .select("doc_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig_dropped = dup_ids.count()
        # audit output: band collisions that are NOT already resolved by
        # the signature-identity drop (the index carries no text, so
        # these are what a downstream verifier still needs to look at)
        cross = cross_bucket_pairs(
            prior_index,
            new_buckets,
            ["band_id", "band_key"],
            "doc_id",
            sig_col="sig_key",
            max_bucket_size=args.max_bucket_size,
            out_a="doc_a",
            out_b="doc_b",
        )
        cross.join(
            dup_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_anti"
        ).write.mode("overwrite").parquet(f"{args.output}/cross_candidates")
        docs = docs.join(dup_ids, "doc_id", "left_anti")
        kept_buckets = new_buckets.join(dup_ids, "doc_id", "left_anti")
        inc_pairs = candidate_pairs_from_index(kept_buckets, args.max_bucket_size)
        inc_verified = ngram_jaccard(docs, inc_pairs).filter(
            F.col("jaccard_bp") >= args.jaccard_threshold_bp
        )
    if args.incremental_index:
        verified = inc_verified
    elif args.dedup_method == "simhash64":
        # pigeonhole candidates + integer hamming verify (already in the
        # pair output — no second verify pass needed; the hamming score
        # column is kept in the pairs parquet, mirroring jaccard_bp)
        verified = simhash_candidate_pairs64(
            docs,
            max_hamming=args.max_hamming,
            max_bucket_size=args.max_bucket_size,
        )
    else:
        pairs = minhash_candidate_pairs_fast(
            docs,
            num_hashes=args.minhash_perms,
            band_size=args.band_size,
            max_bucket_size=args.max_bucket_size,
        )
        verified = ngram_jaccard(docs, pairs).filter(
            F.col("jaccard_bp") >= args.jaccard_threshold_bp
        )
    verified.write.mode("overwrite").parquet(f"{args.output}/pairs")
    verified = spark.read.parquet(f"{args.output}/pairs")
    clusters = connected_components_star(verified)
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    clusters = spark.read.parquet(f"{args.output}/clusters")
    keepers = docs.join(
        clusters.filter(~F.col("is_keeper")).select("doc_id"), "doc_id", "left_anti"
    )
    keepers.write.mode("overwrite").parquet(f"{args.output}/keepers")
    if args.dedup_method == "minhash":
        # index of this run's keepers — with --incremental-index, merged
        # with the prior index so the next increment deduplicates against
        # the full history without rescanning it.  The banding params ride
        # as metadata columns so a future run with mismatched parameters
        # fails loudly instead of silently finding zero collisions.
        idx = (
            minhash_index(
                spark.read.parquet(f"{args.output}/keepers"),
                num_hashes=args.minhash_perms,
                band_size=args.band_size,
                fast=True,
            )
            .withColumn("mh_perms", F.lit(args.minhash_perms))
            .withColumn("mh_band_size", F.lit(args.band_size))
        )
        if prior_index is not None:
            idx = prior_index.unionByName(idx)
        idx.write.mode("overwrite").parquet(f"{args.output}/index")
    summary = {
        "stage": "dedup",
        "method": args.dedup_method,
        # with --incremental-index, docs was already filtered: report the
        # pre-drop increment size
        "n_input": (docs.count() + sig_dropped),
        "n_dup_pairs": verified.count(),
        "n_clustered": clusters.count(),
        "n_keepers": spark.read.parquet(f"{args.output}/keepers").count(),
    }
    if args.incremental_index:
        summary["n_sig_dropped_vs_index"] = sig_dropped
    return summary


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from .checkpoint import run_extraction_job
    from .session import get_spark

    spark = get_spark(app_name=f"fes-{args.stage}-{args.run_id}", master=args.master)
    try:
        if args.stage == "curate":
            summary = _run_curate(spark, args)
        elif args.stage == "dedup":
            summary = _run_dedup(spark, args)
        elif args.stage == "compact-index":
            summary = _run_compact_index(spark, args)
        elif args.stage == "media-dedup":
            summary = _run_media_dedup(spark, args)
        elif args.stage == "semdedup":
            summary = _run_semdedup(spark, args)
        elif args.stage == "mix":
            summary = _run_mix(spark, args)
        else:
            if args.input_format == "warc":
                from .warc import read_warc, warc_html_documents

                # Stage the parsed documents to parquet BEFORE the bucket
                # loop: run_extraction_job re-evaluates its input per
                # bucket (filter + isEmpty), and bucket pruning cannot
                # push below mapInPandas — feeding the lazy WARC plan in
                # directly would re-read, re-gunzip and re-parse the whole
                # crawl ~2x per bucket.  The underscore prefix keeps the
                # staging dir invisible to parquet readers of the root.
                staged = f"{args.output.rstrip('/')}/_staged_documents"
                warc_html_documents(read_warc(spark, args.input)).write.mode(
                    "overwrite"
                ).parquet(staged)
                documents = spark.read.parquet(staged)
            else:
                documents = spark.read.parquet(args.input)
            summary = run_extraction_job(
                spark,
                documents,
                root=args.output,
                run_id=args.run_id,
                n_buckets=args.n_buckets,
                num_partitions=args.partitions,
                keep_markdown=args.keep_markdown,
                table_format=args.table_format,
                max_content_length=args.max_content_length,
            )
        print(json.dumps({"run_id": args.run_id, **summary}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
