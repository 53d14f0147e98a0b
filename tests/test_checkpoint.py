"""Checkpoint ledger / resume tests (north_rule: resumable with
per-partition lineage + metrics)."""

import pytest
from pyspark.sql import functions as F

from fetch_engines_spark.checkpoint import (
    completed_buckets,
    run_extraction_job,
    with_bucket,
)
from fetch_engines_spark.extract import INPUT_SCHEMA
from fetch_engines_spark.fixtures import fixture_document_rows


@pytest.fixture()
def documents(spark):
    return spark.createDataFrame(fixture_document_rows(replicas=3), INPUT_SCHEMA)


def test_full_run_writes_outputs_ledger_metrics(spark, documents, tmp_path):
    root = str(tmp_path / "ckpt")
    summary = run_extraction_job(spark, documents, root, run_id="r1", n_buckets=4)
    assert summary["processed_buckets"] == 4
    assert summary["skipped_buckets"] == 0
    out = spark.read.parquet(f"{root}/outputs")
    assert out.count() == documents.count()
    ledger = spark.read.parquet(f"{root}/partition_ledger")
    assert ledger.filter("status = 'done'").count() == 4
    assert ledger.agg(F.sum("doc_count")).collect()[0][0] == documents.count()
    metrics = spark.read.parquet(f"{root}/metrics")
    assert metrics.agg(F.sum("doc_count")).collect()[0][0] == documents.count()
    assert metrics.filter("error_count > 0").count() == 0


def test_resume_skips_completed_buckets(spark, documents, tmp_path):
    root = str(tmp_path / "ckpt")
    # First run: only buckets 0-1 get "done" (simulate by running with the
    # docs filtered to those buckets, which writes their ledger rows).
    docs_b = with_bucket(documents, 4)
    partial = docs_b.filter(F.col("bucket") <= 1).drop("bucket")
    run_extraction_job(spark, partial, root, run_id="r2", n_buckets=4)
    done_before = {r.bucket for r in completed_buckets(spark, root, "r2").collect()}
    assert done_before == {0, 1, 2, 3} - set()  # all 4 buckets ran (over subset)

    # A fresh full run under the same run_id must skip all completed buckets.
    summary = run_extraction_job(spark, documents, root, run_id="r2", n_buckets=4)
    assert summary["processed_buckets"] == 0
    assert summary["skipped_buckets"] == 4


def test_resume_processes_only_missing_buckets(spark, documents, tmp_path):
    root = str(tmp_path / "ckpt")
    import pyspark.sql.functions as SF

    # Pre-mark buckets 0 and 2 as done with a hand-written ledger.
    ledger = spark.createDataFrame(
        [("r3", 0, 4, 0, 0, 0, "done", 0), ("r3", 2, 4, 0, 0, 0, "done", 0)],
        "run_id string, bucket int, n_buckets int, doc_count long, byte_count long, wall_ms long, status string, updated_at long",
    )
    ledger.write.mode("append").parquet(f"{root}/partition_ledger")
    summary = run_extraction_job(spark, documents, root, run_id="r3", n_buckets=4)
    assert summary["processed_buckets"] == 2
    assert summary["skipped_buckets"] == 2
    out = spark.read.parquet(f"{root}/outputs")
    processed_buckets = {r.bucket for r in out.select("bucket").distinct().collect()}
    assert processed_buckets == {1, 3}
    expected = with_bucket(documents, 4).filter(SF.col("bucket").isin(1, 3)).count()
    assert out.count() == expected


def test_different_run_id_does_not_skip(spark, documents, tmp_path):
    root = str(tmp_path / "ckpt")
    run_extraction_job(spark, documents, root, run_id="a", n_buckets=2)
    summary = run_extraction_job(spark, documents, root, run_id="b", n_buckets=2)
    assert summary["processed_buckets"] == 2


def test_crash_between_outputs_and_ledger_does_not_duplicate(spark, documents, tmp_path):
    """Crash-window resume: outputs written but ledger append lost → the
    rerun must REPLACE the bucket's outputs (dynamic partition overwrite),
    not append duplicates."""
    root = str(tmp_path / "ckpt")
    run_extraction_job(spark, documents, root, run_id="crash", n_buckets=2)
    before = spark.read.parquet(f"{root}/outputs").count()

    # simulate the crash window: drop bucket 1's ledger row (outputs remain)
    ledger = spark.read.parquet(f"{root}/partition_ledger")
    kept = ledger.filter(~((F.col("run_id") == "crash") & (F.col("bucket") == 1)))
    kept_rows = kept.collect()
    import shutil

    shutil.rmtree(f"{root}/partition_ledger")
    spark.createDataFrame(kept_rows, ledger.schema).write.parquet(f"{root}/partition_ledger")

    summary = run_extraction_job(spark, documents, root, run_id="crash", n_buckets=2)
    assert summary["processed_buckets"] == 1  # only the "crashed" bucket
    out = spark.read.parquet(f"{root}/outputs")
    assert out.count() == before  # no duplicates
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0
    # metrics lineage must not double-count the reprocessed bucket either:
    # exactly one metrics row per (run_id, bucket, partition_id)
    metrics = spark.read.parquet(f"{root}/metrics")
    dup_metrics = (
        metrics.groupBy("run_id", "bucket", "partition_id").count().filter("count > 1")
    )
    assert dup_metrics.count() == 0
    assert metrics.agg(F.sum("doc_count")).collect()[0][0] == documents.count()


def test_empty_buckets_on_fresh_root_complete(spark, documents, tmp_path):
    """ADVICE repro: a tiny corpus with n_buckets >> docs used to crash with
    UNABLE_TO_INFER_SCHEMA when the first bucket was empty on a fresh root;
    empty buckets must ledger as done with zero counts and the job must
    finish."""
    root = str(tmp_path / "ckpt")
    tiny = documents.limit(3)
    summary = run_extraction_job(spark, tiny, root, run_id="tiny", n_buckets=64)
    assert summary["processed_buckets"] == 64
    ledger = spark.read.parquet(f"{root}/partition_ledger")
    assert ledger.filter("status = 'done'").count() == 64
    assert ledger.agg(F.sum("doc_count")).collect()[0][0] == 3
    # rerun resumes cleanly: everything already done
    summary2 = run_extraction_job(spark, tiny, root, run_id="tiny", n_buckets=64)
    assert summary2["processed_buckets"] == 0
    assert summary2["skipped_buckets"] == 64


def test_resume_with_mismatched_n_buckets_fails_fast(spark, documents, tmp_path):
    root = str(tmp_path / "ckpt")
    run_extraction_job(spark, documents, root, run_id="nb", n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        run_extraction_job(spark, documents, root, run_id="nb", n_buckets=8)
    # a different run_id with a different bucketing is fine
    summary = run_extraction_job(spark, documents, root, run_id="nb2", n_buckets=8)
    assert summary["processed_buckets"] == 8


def test_dedup_stage_cli_both_methods(spark, tmp_path):
    """The --stage dedup CLI with both candidate generators: MinHash-LSH
    (jaccard-verified) and 64-bit SimHash (hamming-verified, pigeonhole
    candidates) must both catch the planted exact duplicates, cluster
    them, and elect keepers."""
    import os

    from fetch_engines_spark import job

    src = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures", "neardup.parquet")
    for method in ("minhash", "simhash64"):
        args = job.parse_args(
            [
                "--input", src,
                "--output", str(tmp_path / method),
                "--run-id", "t",
                "--stage", "dedup",
                "--dedup-method", method,
                "--minhash-perms", "24",
                "--band-size", "2",
            ]
        )
        summary = job._run_dedup(spark, args)
        assert summary["method"] == method
        assert summary["n_dup_pairs"] >= 30  # 30 planted exact pairs
        assert summary["n_keepers"] < summary["n_input"]
        clusters = spark.read.parquet(str(tmp_path / method / "clusters"))
        assert clusters.filter("is_keeper").count() < summary["n_input"]


def test_dedup_stage_incremental_index_roundtrip(spark, tmp_path):
    """Two-run incremental dedup: run 1 writes {output}/index; run 2
    treats a new increment (half exact copies of indexed docs, half
    fresh) as input with --incremental-index — the copies are dropped by
    signature identity WITHOUT rescanning the historical corpus, fresh
    docs survive, and the merged index covers both runs."""
    import os

    from pyspark.sql import functions as F

    from fetch_engines_spark import job

    src = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures", "neardup.parquet")
    base_args = [
        "--output", "", "--run-id", "t", "--stage", "dedup",
        "--minhash-perms", "24", "--band-size", "2",
    ]
    a1 = job.parse_args(["--input", src] + base_args)
    a1.output = str(tmp_path / "run1")
    s1 = job._run_dedup(spark, a1)
    assert os.path.exists(str(tmp_path / "run1" / "index"))

    # increment: 20 exact copies of indexed keepers + 20 fresh docs
    keepers = spark.read.parquet(str(tmp_path / "run1" / "keepers"))
    copies = keepers.limit(20).withColumn(
        "doc_id", F.concat(F.lit("inc-"), F.col("doc_id"))
    )
    fresh = spark.createDataFrame(
        [(f"fresh{i:02d}", f"unique increment document number {i} " + " ".join(f"w{i}x{j}" for j in range(30)))
         for i in range(20)],
        "doc_id string, text string",
    )
    inc_path = str(tmp_path / "increment.parquet")
    copies.select("doc_id", "text").unionByName(fresh).write.parquet(inc_path)

    a2 = job.parse_args(["--input", inc_path] + base_args)
    a2.output = str(tmp_path / "run2")
    a2.incremental_index = str(tmp_path / "run1" / "index")
    s2 = job._run_dedup(spark, a2)
    assert s2["n_input"] == 40
    assert s2["n_sig_dropped_vs_index"] == 20  # every copy killed by the index
    kept2 = {r.doc_id for r in spark.read.parquet(str(tmp_path / "run2" / "keepers")).collect()}
    assert all(d.startswith("fresh") for d in kept2) and len(kept2) == 20
    # merged index covers run-1 keepers AND the increment's keepers
    merged = spark.read.parquet(str(tmp_path / "run2" / "index"))
    ids = {r.doc_id for r in merged.select("doc_id").distinct().collect()}
    assert kept2 <= ids and s1["n_keepers"] == len(ids) - len(kept2)
    # audit output exists
    assert os.path.exists(str(tmp_path / "run2" / "cross_candidates"))


def test_media_dedup_stage_cli(spark, tmp_path):
    """The --stage media-dedup CLI end-to-end for both signature kinds:
    image dHash over the planted image corpus (with --docs rewriting the
    interleaved documents' media_refs to cluster-canonical ids) and the
    audio fingerprint over the planted WAV corpus.  Signatures are
    written BEFORE pair generation (the durable decode checkpoint)."""
    import os

    from fetch_engines_spark import job

    fx = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures")
    out = str(tmp_path / "img")
    args = job.parse_args(
        [
            "--input", os.path.join(fx, "images_neardup.parquet"),
            "--docs", os.path.join(fx, "documents_media.parquet"),
            "--output", out,
            "--run-id", "m1",
            "--stage", "media-dedup",
            "--media-kind", "image",
            "--max-bucket-size", "50",
        ]
    )
    s = job._run_media_dedup(spark, args)
    assert s["n_media"] == 34 and s["n_errors"] == 0
    assert s["n_pairs"] == 28 and s["n_remapped_media"] == 13
    assert s["n_docs"] == 10
    sigs = spark.read.parquet(f"{out}/signatures")
    assert sigs.filter("dhash_hex IS NULL").count() == 0
    docs = {r.doc_id: r for r in spark.read.parquet(f"{out}/documents").collect()}
    assert [sp.media_ref for sp in docs["dm-02"].spans] == [
        "blank-0", "img-002", "blank-0",
    ]
    assert docs["dm-05"].spans == [] and docs["dm-06"].spans is None

    out2 = str(tmp_path / "aud")
    args2 = job.parse_args(
        [
            "--input", os.path.join(fx, "audio_neardup.parquet"),
            "--output", out2,
            "--run-id", "m2",
            "--stage", "media-dedup",
            "--media-kind", "audio",
        ]
    )
    s2 = job._run_media_dedup(spark, args2)
    assert s2["n_media"] == 26 and s2["n_pairs"] == 17
    # silent cluster (5) collapses to 1 canonical + planted dup/near pairs
    assert s2["n_remapped_media"] == 11
    assert "n_docs" not in s2


def test_media_dedup_stage_incremental(spark, tmp_path):
    """Two-run incremental media dedup: run 1 indexes the base images;
    run 2 treats the copies/edits + two history-identical blanks + the
    untouched remainder as a NEW increment with --incremental-signatures
    — every item near-dup of history is dropped (identity via the
    direct hash semi-join even under a tight bucket cap; hamming 1+ via
    the banded cross path) WITHOUT re-decoding history, and
    signatures_merged covers history + survivors for the next run."""
    import os

    from fetch_engines_spark import job

    fx = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures")
    src = os.path.join(fx, "images_neardup.parquet")
    inc_ids = (
        "media_id LIKE '%-copy' OR media_id LIKE '%-near' "
        "OR media_id IN ('blank-5','blank-6','img-003','img-006')"
    )
    base = spark.read.parquet(src)
    out1, out2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    base.filter(f"NOT ({inc_ids})").write.parquet(str(tmp_path / "hist.parquet"))
    base.filter(inc_ids).write.parquet(str(tmp_path / "inc.parquet"))

    s1 = job._run_media_dedup(
        spark,
        job.parse_args(
            ["--input", str(tmp_path / "hist.parquet"), "--output", out1,
             "--run-id", "r1", "--stage", "media-dedup", "--max-bucket-size", "50"]
        ),
    )
    assert "n_hist_dups" not in s1

    s2 = job._run_media_dedup(
        spark,
        job.parse_args(
            ["--input", str(tmp_path / "inc.parquet"), "--output", out2,
             "--run-id", "r2", "--stage", "media-dedup",
             "--incremental-signatures", f"{out1}/signatures",
             "--docs", os.path.join(fx, "documents_media.parquet"),
             "--max-bucket-size", "4"]
        ),
    )
    # 7 copies/edits + 2 blanks match history; img-003 / img-006 are the
    # genuinely-new survivors (base images not referenced by any dup)
    assert s2["n_media"] == 11 and s2["n_hist_dups"] == 9
    # audit completeness: EVERY dropped item appears in cross_dups with
    # the history item it matched (identity rows included, hamming 0
    # against the per-hash history representative)
    cross = {
        r.media_id: (r.hist_id, r.hamming)
        for r in spark.read.parquet(f"{out2}/cross_dups").collect()
    }
    assert set(cross) == {
        "img-000-copy", "img-002-near", "img-005-copy", "img-007-near",
        "img-010-copy", "img-012-near", "img-015-copy", "blank-5", "blank-6",
    }
    assert cross["img-000-copy"] == ("img-000", 0)
    assert cross["blank-5"] == ("blank-0", 0)  # per-hash history rep
    assert cross["img-012-near"] == ("img-012", 1)  # banded near path
    # --docs with incremental: spans referencing DROPPED increment media
    # rewrite to the surviving history id, never dangling
    docs = {r.doc_id: r for r in spark.read.parquet(f"{out2}/documents").collect()}
    assert [sp.media_ref for sp in docs["dm-01"].spans] == [None, "img-000", None]
    # blank-5 (dropped increment) -> its history match; img-002-near
    # (banded near-dup) -> its history match; blank-2 is a HISTORY ref —
    # untouched here, by contract history refs were canonicalized by
    # run 1's own map
    assert [sp.media_ref for sp in docs["dm-02"].spans] == [
        "blank-0", "img-002", "blank-2",
    ]
    merged = spark.read.parquet(f"{out2}/signatures_merged")
    assert merged.count() == s1["n_media"] + 2
    surv = {
        r.media_id
        for r in merged.join(
            spark.read.parquet(f"{out1}/signatures"), "media_id", "left_anti"
        ).collect()
    }
    assert surv == {"img-003", "img-006"}
    # self-overwrite guard
    with pytest.raises(ValueError, match="own"):
        job._run_media_dedup(
            spark,
            job.parse_args(
                ["--input", str(tmp_path / "inc.parquet"), "--output", out2,
                 "--run-id", "r3", "--stage", "media-dedup",
                 "--incremental-signatures", f"{out2}/signatures"]
            ),
        )
    # re-crawl guard: an increment reusing a history media_id fails
    # loudly instead of merging two signatures under one id
    with pytest.raises(ValueError, match="already exist"):
        job._run_media_dedup(
            spark,
            job.parse_args(
                ["--input", str(tmp_path / "hist.parquet"),
                 "--output", str(tmp_path / "run3"),
                 "--run-id", "r4", "--stage", "media-dedup",
                 "--incremental-signatures", f"{out1}/signatures"]
            ),
        )


def test_media_dedup_stage_video(spark, tmp_path):
    """--stage media-dedup --media-kind video: per-frame dHash signatures,
    containment pairs, and a canonical map clustering the copy/reorder/
    trim family and the black-frame family; incremental mode rejects
    video with an actionable error."""
    import os

    from fetch_engines_spark import job

    fx = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures")
    out = str(tmp_path / "vid")
    s = job._run_media_dedup(
        spark,
        job.parse_args(
            ["--input", os.path.join(fx, "avi_neardup.parquet"),
             "--output", out, "--run-id", "v1", "--stage", "media-dedup",
             "--media-kind", "video"]
        ),
    )
    assert s["n_media"] == 54  # per-frame signature rows
    assert s["n_pairs"] == 12
    cmap = {
        r.media_ref: r.canonical_ref
        for r in spark.read.parquet(f"{out}/canonical_map").collect()
    }
    assert cmap["vid-a-copy"] == "vid-a" and cmap["vid-a-trimmed"] == "vid-a"
    assert cmap["vid-black-1"] == "vid-black-0" and cmap["vid-c"] == "vid-black-0"
    with pytest.raises(ValueError, match="image/audio"):
        job._run_media_dedup(
            spark,
            job.parse_args(
                ["--input", os.path.join(fx, "avi_neardup.parquet"),
                 "--output", str(tmp_path / "vid2"), "--run-id", "v2",
                 "--stage", "media-dedup", "--media-kind", "video",
                 "--incremental-signatures", f"{out}/signatures"]
            ),
        )


def test_semdedup_stage_cli(spark, tmp_path):
    """The --stage semdedup CLI over the planted embedding corpus: every
    family base survives, family members co-celled with an earlier
    member drop, and the summary accounts exactly."""
    import os

    from fetch_engines_spark import job

    src = os.path.join(
        os.path.dirname(__file__), "..", "data", "fixtures", "neardup_embeddings.parquet"
    )
    args = job.parse_args(
        [
            "--input", src,
            "--output", str(tmp_path / "sem"),
            "--run-id", "t",
            "--stage", "semdedup",
            "--semdedup-centroids", "8",
            "--semdedup-threshold-bp", "9500",
        ]
    )
    summary = job._run_semdedup(spark, args)
    assert summary["n_input"] == 240
    assert summary["n_kept"] == 161  # matches test_semantic_dedup_planted_families
    assert summary["n_dropped"] == 79
    sem = spark.read.parquet(str(tmp_path / "sem" / "semantic"))
    assert sem.filter("keep = 0 and n_close = 0").count() == 0


def test_mix_stage_cli(spark, tmp_path):
    """The --stage mix CLI: parses source:share_bp targets, writes mix/,
    and the summary's per-stratum counts hit the exact ratios."""
    from fetch_engines_spark import job

    args = job.parse_args(
        [
            "--input", "/root/testdata/sf0.01/documents.parquet",
            "--output", str(tmp_path / "m"),
            "--run-id", "t",
            "--stage", "mix",
            "--mix-targets", "src0:5000,src1:3000,src2:2000",
        ]
    )
    summary = job._run_mix(spark, args)
    assert summary["n_mix"] == 50
    assert summary["per_stratum"] == {"src0": 25, "src1": 15, "src2": 10}
    import pytest as _pytest

    bad = job.parse_args(
        ["--input", "x", "--output", "y", "--run-id", "t",
         "--stage", "mix", "--mix-targets", "src0-5000"]
    )
    with _pytest.raises(ValueError, match="not source:share_bp"):
        job._run_mix(spark, bad)
