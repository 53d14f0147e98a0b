"""Golden-change guard (ADVICE): the committed extraction goldens are
produced by the same converter under test, so the driver oracle alone
verifies stability, not absolute correctness.  This guard fails whenever
the golden content changes, forcing the change through the containment /
differential test layer and a conscious re-pin
(scripts/update_golden_hashes.py) instead of a silent regeneration.
"""

import json
import os

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures")


def test_goldens_match_pinned_hashes():
    from scripts.update_golden_hashes import content_hash

    pinned = json.load(open(os.path.join(FIXTURES, "GOLDEN_HASHES.json")))
    for name, expected in pinned.items():
        actual = content_hash(os.path.join(FIXTURES, f"{name}.parquet"))
        assert actual == expected, (
            f"golden {name}.parquet content changed. If this is an intended "
            "converter-behavior change: (1) update/verify the containment "
            "assertions in fetch_engines_spark/fixtures.py and "
            "tests/test_converter_fixtures.py, then (2) re-pin with "
            "python scripts/update_golden_hashes.py"
        )


def test_goldens_regenerate_deterministically(tmp_path):
    """build_fixture_data's expected outputs are a pure function of the
    fixture corpus: regenerating into a temp dir yields the same content
    hash as the committed goldens."""
    import scripts.build_fixture_data as bfd
    from scripts.update_golden_hashes import content_hash

    orig_out = bfd.OUT
    try:
        bfd.OUT = str(tmp_path)
        bfd.build_expected()
    finally:
        bfd.OUT = orig_out
    for name in ("expected_spans", "expected_markdown"):
        assert content_hash(str(tmp_path / f"{name}.parquet")) == content_hash(
            os.path.join(FIXTURES, f"{name}.parquet")
        )


def test_truncated_golden_obeys_m13_rules():
    """Structural (converter-independent) checks of the M13 truncation
    golden: bounded length, the literal suffix, and the sentence-boundary
    midpoint rule against the untruncated golden."""
    import pyarrow.parquet as pq

    full = {
        r["doc_id"]: r["markdown"]
        for r in pq.read_table(os.path.join(FIXTURES, "expected_markdown.parquet")).to_pylist()
    }
    trunc = {
        r["doc_id"]: r["markdown"]
        for r in pq.read_table(
            os.path.join(FIXTURES, "expected_markdown_truncated.parquet")
        ).to_pylist()
    }
    limit = 400
    suffix = "... (truncated)"
    truncated_docs = 0
    for doc_id, t in trunc.items():
        f = full[doc_id]
        if len(f) <= limit:
            assert t == f
            continue
        truncated_docs += 1
        assert t.endswith(suffix), doc_id
        body = t[: -len(suffix)]
        assert len(body) <= limit, (doc_id, len(body))
        # the sentence-boundary rule: if the cut is past the midpoint it
        # lands right after a period, else it's the hard limit
        assert body.endswith(".") or len(body) == limit, doc_id
        # prefix property: the truncated body is a prefix of the full text
        assert f.startswith(body.rstrip(".") [:10])
    assert truncated_docs >= 5  # fixture corpus genuinely exercises M13


def test_driver_window_covers_every_operator_family():
    """The driver verifies only the FIRST 50 queries() entries
    (CORRECTNESS window, round-3 verdict item 1): every operator family
    must keep a representative inside that window, and every registered
    query must carry an oracle twin.  Fails when a future edit pushes a
    family representative past the window or registers an oracle-less
    query."""
    import __spark_entry__ as e

    q = list(e.queries())
    window = set(q[:50])
    # round-5 rotation: the six round-4 operators (incremental dedup,
    # fuzzy decontamination, CMS, resize, containment, IVF-PQ) moved IN;
    # six near-variants whose families stay represented moved past the
    # window (simhash_capped/embedding_topk_pq/streaming_interval_join/
    # events_kmv_distinct/vocab_topk/sample_by_hash — each carries a
    # round-4 driver verdict).  Late-round-5 rotation: the round-5
    # operators warc_ingest / media_gif_frames / media_dhash /
    # media_neardup_pairs moved IN; jsonl_ingest (ingestion family →
    # warc_ingest), streaming_windowed_counts (family →
    # streaming_extract), dedup_ngram_jaccard (family → containment) and
    # media_metadata moved past the window — each green in all four
    # prior driver windows.  Final round-5 rotation: the north-rule
    # composite media_span_canonicalize and the video-decode stack
    # media_video_frames moved IN; events_range_join (temporal-join
    # family → events_asof_attribution) and doc_winnowing (fingerprint
    # family → doc_tfidf_topk) moved past the window — each green in
    # multiple prior driver windows.  Late round-5 swap: the new
    # operators spans_boilerplate_strip (corpus-level boilerplate on
    # the span payload) and mixture_sample (sampling-family rep,
    # superseding source_cap's semantics) moved IN; text_repetition
    # (family → text_quality/lm_surprisal) and source_cap (same family
    # as mixture_sample) moved past the window.
    required = {
        # extraction / classification / routing
        "extract_spans_fixture", "extract_markdown_fixture",
        "classifier_assessment", "routing_decisions", "mime_split",
        "pdf_extract",
        # sources / checkpoint / streaming / structured (ingestion family
        # represented by WARC — the Common Crawl landing format)
        "warc_ingest", "resume_anti_join",
        "streaming_extract", "structured_validation",
        # relational / events (plain-groupBy family: pricing_summary +
        # events_rollup; events_daily moved past the window in round 5
        # for pii_redact — it carries a round-4 driver verdict)
        "pricing_summary", "events_user_sessions",
        "events_asof_attribution", "events_rollup",
        # join-strategy family: salted_join in-window; bucketed_join moved
        # past the window in round 5 for lm_surprisal (it carries a
        # round-4 driver verdict and its zero-Exchange plan gate stays in
        # tests/test_plans.py)
        "salted_join", "url_canonicalize",
        # S5 blocking (corpus-side analog, added round 5)
        "resource_blocking",
        # text analysis (sampling family: source_cap; sketch: vocab_cms;
        # LM-quality family: lm_surprisal, added round 5)
        "lang_id", "text_quality",
        "doc_tfidf_topk", "doc_hashed_embedding", "doc_chunks",
        "mixture_sample", "vocab_cms", "lm_surprisal",
        "spans_boilerplate_strip",
        # PII scrub family, added round 5
        "pii_redact",
        # dedup (capped-join family represented by embedding_capped;
        # minhash_capped moved past the window for resource_blocking —
        # it carries a round-4 driver verdict)
        "dedup_exact", "dedup_minhash_prod",
        "dedup_ngram_containment", "dedup_simhash",
        "dedup_substring", "dedup_incremental", "decontaminate",
        "decontaminate_fuzzy", "dedup_clusters", "dedup_embedding_capped",
        # ANN (PQ family represented via IVF-PQ)
        "embedding_topk", "embedding_topk_lsh", "embedding_topk_ivf",
        "embedding_topk_ivfpq",
        # multimodal (single-frame decode, audio, fused resize, animated
        # GIF multi-frame, perceptual hash, image near-dup) + composite
        "media_pixel_stats", "media_audio_stats",
        "media_resize", "media_gif_frames", "media_dhash",
        "media_neardup_pairs", "training_pipeline_full",
        # round-5 north-rule composite + video decode
        "media_span_canonicalize", "media_video_frames",
    }
    assert len(required) == 50
    missing = required - window
    assert not missing, f"family representatives outside the driver window: {missing}"
    oracles = e.oracle_sql()
    assert all(n in oracles for n in q), [n for n in q if n not in oracles]
