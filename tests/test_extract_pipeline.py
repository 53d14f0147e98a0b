"""End-to-end Spark tests: documents(spans) → extraction UDF → span arrays.

This is the span-sequence-equality layer (BASELINE.json invariant:
(kind, text, media_ref, order) per document vs the reference fixtures).
"""

import pytest
from pyspark.sql import functions as F

from fetch_engines_spark.convert import MarkdownConverter
from fetch_engines_spark.extract import (
    INPUT_SCHEMA,
    extract_spans,
    markdown_to_spans,
    span_equality_report,
    spans_to_markdown,
)
from fetch_engines_spark.fixtures import (
    EXTRACTION_FIXTURE_IDS,
    FIXTURES_BY_ID,
    assemble_html,
    fixture_document_rows,
)


@pytest.fixture(scope="module")
def documents_df(spark):
    return spark.createDataFrame(fixture_document_rows(), INPUT_SCHEMA)


@pytest.fixture(scope="module")
def extracted(spark, documents_df):
    df = extract_spans(documents_df, num_partitions=4).cache()
    df.count()
    return df


def test_input_synthesis_roundtrip():
    for fid in EXTRACTION_FIXTURE_IDS:
        f = FIXTURES_BY_ID[fid]
        rows = [r for r in fixture_document_rows() if r["doc_id"] == fid]
        assert len(rows) == 1
        assert assemble_html(rows[0]["spans"]) == f.html


def test_all_docs_extracted_no_errors(extracted):
    from fetch_engines_spark.fixtures import FIXTURES

    rows = extracted.collect()
    assert len(rows) == len(FIXTURES)
    errs = [r for r in rows if r.error is not None]
    assert errs == [], errs


def test_span_markdown_roundtrip(extracted):
    for r in extracted.collect():
        spans = [s.asDict() for s in r.spans]
        assert spans_to_markdown(spans) == r.markdown
        # offsets are dense and ordered
        assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_spark_output_matches_local_converter(extracted):
    """The distributed result must equal the single-threaded reference-parity
    converter run per document (the engine's own oracle)."""
    conv = MarkdownConverter()
    by_id = {r.doc_id: r for r in extracted.collect()}
    for fid in EXTRACTION_FIXTURE_IDS:
        f = FIXTURES_BY_ID[fid]
        expected_md = conv.convert(f.html, base_url=f.base_url)
        assert by_id[fid].markdown == expected_md, fid


def test_fixture_containment_through_spark(extracted):
    by_id = {r.doc_id: r.markdown for r in extracted.collect()}
    for fid in EXTRACTION_FIXTURE_IDS:
        f = FIXTURES_BY_ID[fid]
        md = by_id[fid]
        for expected in f.must_contain:
            assert expected in md, (fid, expected)
        for banned in f.must_not_contain:
            assert banned not in md, (fid, banned)


def test_span_equality_report_all_equal(spark, extracted):
    produced = extracted.select("doc_id", "spans")
    report = span_equality_report(produced, produced)
    assert report.filter(~F.col("equal")).count() == 0
    assert report.count() == extracted.count()


def test_span_equality_report_detects_mismatch(spark, extracted):
    produced = extracted.select("doc_id", "spans")
    # perturb one doc: drop its last span
    tampered = produced.withColumn(
        "spans",
        F.when(
            F.col("doc_id") == "F01", F.slice("spans", 1, F.greatest(F.size("spans") - 1, F.lit(0)))
        ).otherwise(F.col("spans")),
    )
    report = span_equality_report(tampered, produced)
    bad = {r.doc_id for r in report.filter(~F.col("equal")).collect()}
    assert bad == {"F01"}


def test_media_refs_carried_through(extracted):
    """north_rule: media spans carried through by media_ref."""
    f04 = extracted.filter(F.col("doc_id") == "F04").collect()[0]
    images = [s for s in f04.spans if s.kind == "image"]
    assert any(s.media_ref == "https://rebuilt.eco/images/product.png" for s in images)


def test_markdown_to_spans_block_kinds():
    md = (
        "# Title\n\nSource: https://x.example/\n\nA paragraph.\n\n- item one\n- item two\n\n"
        "| a | b |\n| --- | --- |\n| 1 | 2 |\n\n```\ncode here\n```\n\n![alt](http://img/x.png)"
    )
    spans = markdown_to_spans(md)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["heading", "source", "text", "list", "table", "code", "image"]
    assert spans[-1]["media_ref"] == "http://img/x.png"
    assert spans_to_markdown(spans) == md


def test_giant_document_skew_row(spark):
    """A multi-MB doc (body×200) must still extract without error."""
    rows = [
        r
        for r in fixture_document_rows(replicas=1, skew_ids={"F08": 200})
        if r["doc_id"] == "F08"
    ]
    df = spark.createDataFrame(rows, INPUT_SCHEMA)
    out = extract_spans(df, num_partitions=2).collect()
    assert len(out) == 1
    assert out[0].error is None
    assert out[0].in_bytes > 200_000  # the giant input really went through
    # content selection picks the single best-scoring subtree, so the
    # output stays compact even when the input is replicated 200×
    assert len(out[0].spans) > 0


def test_source_url_column_injects_source_span(spark):
    """M14: a source_url column yields a 'Source: <url>' span after the H1."""
    rows = [
        {
            "doc_id": "s1",
            "base_url": None,
            "canonical_url": None,
            "source_url": "https://example.com/origin",
            "spans": [
                {
                    "kind": "html",
                    "text": "<body><main><h1>Titled</h1><p>Body text long enough to be selected as main content here.</p></main></body>",
                    "media_ref": None,
                    "offset": 0,
                }
            ],
        }
    ]
    schema = INPUT_SCHEMA.add("source_url", "string")
    # build with the right field order: doc_id, base_url, canonical_url, spans, source_url
    df = spark.createDataFrame(rows, schema)
    out = extract_spans(df, keep_markdown=True).collect()[0]
    kinds = [s.kind for s in out.spans]
    assert kinds[0] == "heading" and kinds[1] == "source"
    assert out.spans[1].text == "Source: https://example.com/origin"


def test_salted_repartition_spreads_hot_doc_id(spark):
    """The salt must be row-unique: 64 rows sharing one doc_id land in
    multiple partitions (a doc_id-derived salt would pin them to one)."""
    from pyspark.sql import functions as F

    from fetch_engines_spark.extract import salted_repartition

    df = spark.range(64).select(F.lit("hot-doc").alias("doc_id"), F.col("id"))
    parts = (
        salted_repartition(df, num_partitions=8, salt_buckets=8)
        .withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .count()
    )
    assert parts > 1


def test_jsonl_ingest_routes_rejects(spark):
    """JSONL source: valid docs equal the parquet rows; the 2 planted
    corrupt lines (malformed JSON, record without doc_id) land in rejects."""
    import os

    from fetch_engines_spark.sources import read_documents_jsonl

    fixtures = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures")
    docs, rejects = read_documents_jsonl(
        spark, os.path.join(fixtures, "documents_spans.jsonl")
    )
    pq = spark.read.parquet(os.path.join(fixtures, "documents_spans.parquet"))
    assert docs.count() == pq.count()
    bad = rejects.collect()
    assert len(bad) == 2
    assert any("oops" in r.raw_line for r in bad)
    # spans survive the JSON round-trip exactly
    j = {r.doc_id: r.spans for r in docs.collect()}
    p = {r.doc_id: r.spans for r in pq.collect()}
    assert j == p


def test_csv_ingest_routes_rejects(spark):
    """CSV source: 60 valid rows pass; the 2 planted corrupt lines (bad
    numeric in a required field, truncated row) land in rejects with the
    raw line preserved."""
    import os

    from fetch_engines_spark.sources import read_events_csv

    fixtures = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures")
    events, rejects = read_events_csv(spark, os.path.join(fixtures, "events_dump.csv"))
    assert events.count() == 60
    assert events.filter("event_id IS NULL OR ts IS NULL").count() == 0
    bad = sorted(r.raw_line for r in rejects.collect())
    assert len(bad) == 2
    assert bad[0] == "9999"
    assert bad[1].startswith("not-a-number")


def test_csv_schema_ddl_with_parameterized_types(spark, tmp_path):
    """DDL column-name parsing must survive commas inside type params."""
    from fetch_engines_spark.sources import read_events_csv

    p = tmp_path / "d.csv"
    p.write_text("1,10.25,x\n2,3.50,y\nbad,1.00,z\n")
    rows, rejects = read_events_csv(
        spark, str(p), schema_ddl="id BIGINT, amount DECIMAL(18,2), tag STRING"
    )
    got = {r.id: (str(r.amount), r.tag) for r in rows.collect()}
    assert got == {1: ("10.25", "x"), 2: ("3.50", "y")}
    assert rejects.count() == 1


def test_jvm_assembly_matches_python_assembly(spark):
    """The native span→html assembly projection must produce byte-identical
    extraction output to the in-Python assembly, including the edge shapes:
    null spans, empty arrays, media-only docs, empty-text html spans,
    out-of-order offsets, and null offsets (which order last, stably, in
    both paths rather than raising in one and tying in the other)."""
    from fetch_engines_spark.extract import INPUT_SCHEMA, extract_spans
    from fetch_engines_spark.fixtures import fixture_document_rows

    rows = fixture_document_rows() + [
        {"doc_id": "x-null", "base_url": None, "canonical_url": None, "spans": None},
        {"doc_id": "x-empty", "base_url": None, "canonical_url": None, "spans": []},
        {
            "doc_id": "x-media-only",
            "base_url": None,
            "canonical_url": None,
            "spans": [{"kind": "image", "text": None, "media_ref": "m1", "offset": 0}],
        },
        {
            "doc_id": "x-out-of-order",
            "base_url": "https://e.com/",
            "canonical_url": None,
            "spans": [
                {"kind": "html", "text": "</p>", "media_ref": None, "offset": 2},
                {"kind": "html", "text": "", "media_ref": None, "offset": 1},
                {"kind": "html", "text": "<p>hello world", "media_ref": None, "offset": 0},
            ],
        },
        {
            "doc_id": "x-null-offset",
            "base_url": "https://e.com/",
            "canonical_url": None,
            "spans": [
                {"kind": "html", "text": " tail</p>", "media_ref": None, "offset": None},
                {"kind": "html", "text": "<p>head", "media_ref": None, "offset": 0},
            ],
        },
    ]
    docs = spark.createDataFrame(rows, INPUT_SCHEMA)
    a = {
        r.doc_id: (r.title, [tuple(s) for s in (r.spans or [])], r.error)
        for r in extract_spans(docs, assemble_in_jvm=True).collect()
    }
    b = {
        r.doc_id: (r.title, [tuple(s) for s in (r.spans or [])], r.error)
        for r in extract_spans(docs, assemble_in_jvm=False).collect()
    }
    # the mapInPandas adapter (fixtures.assemble_html) must agree too —
    # including on null offsets, which once raised TypeError in its sort
    c = {
        r.doc_id: (r.title, [tuple(s) for s in (r.spans or [])], r.error)
        for r in extract_spans(docs, use_arrow=False).collect()
    }
    assert a == b
    assert a == c
    assert a["x-out-of-order"][1]  # content extracted from reordered spans
    assert a["x-null-offset"][2] is None  # tolerated, not an ERR_EXTRACTION row
    assert "head" in " ".join(s[1] or "" for s in a["x-null-offset"][1])


def test_span_equality_report_joins_on_position(spark):
    """Identical span sequences must report equal even when offsets are
    duplicated or null (the report keys on array position, not the span's
    own offset field — an offset-keyed join fans out on duplicates and
    never matches nulls, reporting mismatches between identical sides)."""
    from fetch_engines_spark.extract import span_equality_report

    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    rows = [
        # duplicate offsets, byte-identical sides
        ("dup", [("text", "X", None, 5), ("text", "Y", None, 5)]),
        # null offsets, byte-identical sides
        ("nul", [("text", "A", None, None), ("image", None, "m1", None)]),
        ("empty", []),
    ]
    df = spark.createDataFrame(rows, schema)
    report = {r.doc_id: r.equal for r in span_equality_report(df, df).collect()}
    assert report == {"dup": True, "nul": True, "empty": True}

    # order is part of the invariant: same multiset, different sequence
    swapped = spark.createDataFrame(
        [("dup", [("text", "Y", None, 5), ("text", "X", None, 5)])], schema
    )
    bad = span_equality_report(df.filter(F.col("doc_id") == "dup"), swapped).collect()
    assert bad[0].equal is False and bad[0].n_mismatched == 2
