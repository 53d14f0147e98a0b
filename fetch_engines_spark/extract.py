"""The vectorized extraction stage: documents → ordered Markdown span arrays.

One Arrow-batched ``mapInPandas`` stage carries the whole per-document chain
(P1…C-H from the converter, M1 serialization, M2–M14 postprocess) —
exactly one Python/JVM round-trip per the north_rule's "vectorized
pandas/Arrow UDFs only" constraint.  Never throws: per-document failures land
in the ``error`` column (mirrors the reference's error taxonomy,
reference: src/errors.ts:1-31, and the converter's fallback-to-cleaned-HTML,
markdown-converter.ts:249-253).

Skew handling (north_rule): callers salt-repartition on ``doc_id`` before
this stage via :func:`salted_repartition`; Arrow batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (session.py).
"""

from __future__ import annotations

import re
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("base_url", StringType()),
        StructField("canonical_url", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("title", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("markdown", StringType()),
        StructField("error", StringType()),
        StructField("in_bytes", LongType()),
        StructField("out_bytes", LongType()),
        StructField("wall_us", LongType()),
    ]
)

# --- span segmentation of the final Markdown --------------------------------

_IMAGE_BLOCK = re.compile(r"^!\[[^\]]*\]\(([^)]+)\)$")
_HEADING_BLOCK = re.compile(r"^#{1,6}\s")
_LIST_BLOCK = re.compile(r"^([*\-+]|\d+\.|>)\s")


def classify_block(block: str) -> tuple[str, str | None]:
    """Return (kind, media_ref) for one markdown block."""
    if _HEADING_BLOCK.match(block):
        return "heading", None
    if block.startswith("```"):
        return "code", None
    if block.startswith("|"):
        return "table", None
    m = _IMAGE_BLOCK.match(block)
    if m:
        return "image", m.group(1)
    if _LIST_BLOCK.match(block):
        return "list", None
    if block.startswith("Source: "):
        return "source", None
    if block == "---":
        return "rule", None
    return "text", None


def markdown_to_spans(markdown: str) -> list[dict]:
    """Segment postprocessed Markdown into ordered output spans.

    Invariant: ``"\\n\\n".join(s["text"] for s in spans) == markdown``
    (postprocess guarantees max 2 consecutive newlines, so blocks are
    exactly the ``\\n\\n``-separated units — except fenced code blocks,
    which may contain blank lines and are kept whole).
    """
    if not markdown:
        return []
    spans: list[dict] = []
    blocks: list[str] = []
    in_code = False
    current: list[str] = []
    for chunk in markdown.split("\n\n"):
        if in_code:
            current.append(chunk)
            if chunk.rstrip().endswith("```"):
                blocks.append("\n\n".join(current))
                current, in_code = [], False
            continue
        if chunk.startswith("```") and not chunk.rstrip().endswith("```") or (
            chunk.startswith("```") and chunk.rstrip() == "```"
        ):
            current = [chunk]
            in_code = True
            continue
        blocks.append(chunk)
    if current:
        blocks.append("\n\n".join(current))

    for i, block in enumerate(blocks):
        kind, media_ref = classify_block(block)
        spans.append({"kind": kind, "text": block, "media_ref": media_ref, "offset": i})
    return spans


def spans_to_markdown(spans: list[dict]) -> str:
    return "\n\n".join(s["text"] for s in sorted(spans, key=lambda s: s["offset"]))


# --- the UDF ----------------------------------------------------------------


def _convert_document(converter, assemble, base_url, source_url, max_content_length):
    """The per-document conversion chain shared by both batch adapters
    (mapInPandas and mapInArrow): assemble → preprocess → to_markdown (with
    the cleanup fallback, parity FetchEngine.ts:138-141) → postprocess →
    source-url injection → markdown_to_spans, with the per-doc error
    taxonomy.  ``assemble`` is a zero-arg callable returning the html
    string so each adapter keeps its own assembly strategy while the
    conversion+fallback logic exists exactly once.

    Returns ``(title, markdown, error, out_spans, in_bytes)``.
    """
    from .convert.converter import inject_source_url, postprocess_markdown
    from .convert.serialize import to_markdown

    error = None
    title = ""
    markdown = ""
    in_bytes = 0
    try:
        html = assemble() or ""
        in_bytes = len(html.encode("utf-8", "ignore"))
        content, title = converter.preprocess(html, base_url)
        if isinstance(content, str):
            markdown = content
            error = "ERR_PREPROCESS_FALLBACK"
        else:
            try:
                markdown = to_markdown(content)
            except Exception:
                # serialization fallback = cleaned raw input
                # (parity: FetchEngine.ts:138-141)
                from .convert.converter import cleanup_content_html, cleanup_html

                markdown = cleanup_content_html(cleanup_html(html))
                error = "ERR_MARKDOWN_CONVERSION_FALLBACK"
        markdown = postprocess_markdown(markdown, max_content_length)
        if source_url:
            markdown = inject_source_url(markdown, source_url)
        out_spans = markdown_to_spans(markdown) if markdown else []
    except Exception as exc:  # never fail the stage on one bad doc
        error = f"ERR_EXTRACTION: {type(exc).__name__}: {exc}"[:500]
        out_spans = []
        markdown = ""
    return title, markdown, error, out_spans, in_bytes


def _extract_batches(
    batches: Iterator[pd.DataFrame], max_content_length: int | None = None
) -> Iterator[pd.DataFrame]:
    # Import inside the worker so the zipped --py-files package resolves.
    from .convert.converter import MarkdownConverter
    from .fixtures import assemble_html

    converter = MarkdownConverter()

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in OUTPUT_SCHEMA.names}
        has_base = "base_url" in pdf.columns
        has_source = "source_url" in pdf.columns
        for row in pdf.itertuples(index=False):
            t0 = time.perf_counter()
            doc_id = row.doc_id
            spans_in = row.spans if row.spans is not None else []
            base_url = getattr(row, "base_url", None) if has_base else None
            source_url = getattr(row, "source_url", None) if has_source else None
            # Arrow delivers struct elements as dicts; accept Rows too.
            title, markdown, error, out_spans, in_bytes = _convert_document(
                converter,
                lambda: assemble_html(
                    [s if isinstance(s, dict) else s.asDict() for s in spans_in]
                ),
                base_url,
                source_url,
                max_content_length,
            )
            wall_us = int((time.perf_counter() - t0) * 1_000_000)
            out["doc_id"].append(doc_id)
            out["title"].append(title)
            out["spans"].append(out_spans)
            out["markdown"].append(markdown)
            out["error"].append(error)
            out["in_bytes"].append(in_bytes)
            out["out_bytes"].append(len(markdown.encode("utf-8", "ignore")))
            out["wall_us"].append(wall_us)
        yield pd.DataFrame(out)


def _extract_arrow_batches(
    batches, emit_markdown: bool = True, max_content_length: int | None = None
):
    """Arrow-native variant of the extraction stage (mapInArrow): consumes
    pyarrow RecordBatches and builds the output arrays directly, skipping
    the pandas materialization on both sides of the boundary.

    With ``emit_markdown=False`` the markdown column is emitted as nulls —
    it never crosses the Arrow boundary (the span array already carries
    the content; at corpus scale this halves the stage's output bytes)."""
    import pyarrow as pa

    from .convert.converter import MarkdownConverter

    converter = MarkdownConverter()
    span_type = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("title", pa.string()),
            ("spans", pa.list_(span_type)),
            ("markdown", pa.string()),
            ("error", pa.string()),
            ("in_bytes", pa.int64()),
            ("out_bytes", pa.int64()),
            ("wall_us", pa.int64()),
        ]
    )

    for batch in batches:
        cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
        doc_ids = cols["doc_id"].to_pylist()
        # html pre-assembled JVM-side (assemble_in_jvm): only the joined
        # string crosses Arrow — the span structs never materialize as
        # Python objects.  Fallback: assemble here from the spans column.
        htmls = cols["html"].to_pylist() if "html" in cols else None
        spans_col = cols["spans"].to_pylist() if htmls is None else None
        base_urls = cols["base_url"].to_pylist() if "base_url" in cols else [None] * len(doc_ids)
        source_urls = (
            cols["source_url"].to_pylist() if "source_url" in cols else [None] * len(doc_ids)
        )
        o_title, o_spans, o_md, o_err, o_in, o_out, o_wall = [], [], [], [], [], [], []

        def assemble(i):
            if htmls is not None:
                return htmls[i] or ""
            spans_in = spans_col[i] or []
            # null offsets order last, stable — the same explicit
            # rule as html_assembly_expr's JVM comparator
            return "".join(
                s["text"]
                for s in sorted(
                    spans_in,
                    key=lambda s: (s["offset"] is None, s["offset"] or 0),
                )
                if s["kind"] == "html" and s["text"]
            )

        for i, doc_id in enumerate(doc_ids):
            t0 = time.perf_counter()
            title, markdown, error, out_spans, in_bytes = _convert_document(
                converter,
                lambda: assemble(i),
                base_urls[i],
                source_urls[i],
                max_content_length,
            )
            o_title.append(title)
            o_spans.append(out_spans)
            o_md.append(markdown if emit_markdown else None)
            o_err.append(error)
            o_in.append(in_bytes)
            o_out.append(len(markdown.encode("utf-8", "ignore")))
            o_wall.append(int((time.perf_counter() - t0) * 1_000_000))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(doc_ids, pa.string()),
                pa.array(o_title, pa.string()),
                pa.array(o_spans, pa.list_(span_type)),
                pa.array(o_md, pa.string()),
                pa.array(o_err, pa.string()),
                pa.array(o_in, pa.int64()),
                pa.array(o_out, pa.int64()),
                pa.array(o_wall, pa.int64()),
            ],
            schema=out_schema,
        )


def salted_repartition(df: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Salted repartition on doc_id (north_rule skew handling).

    The salt must be row-unique, not a function of doc_id (a doc_id-derived
    salt has the identical key distribution to doc_id alone and mitigates
    nothing), so rows sharing a hot doc_id — re-crawls, sharded documents —
    spread across ``salt_buckets`` partitions instead of hash-pinning one.
    The salt only affects row placement, so monotonically_increasing_id's
    nondeterminism across task retries is safe here.  Single-giant-ROW skew
    cannot be split by any repartition; it is bounded instead by
    spark.sql.execution.arrow.maxRecordsPerBatch (see extract_spans).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    return salted.repartition(num_partitions, "doc_id", "_salt").drop("_salt")


def html_assembly_expr(spans_col: str = "spans"):
    """JVM-side document assembly: html-kind span texts joined in offset
    order, entirely in native expressions.  Offsets are the span-order key
    and unique per document by the data-model contract (TESTDATA/
    FIXTURES); ties would fall back to engine sort order.  Keeping this
    projection JVM-side means the list<struct> span column never crosses
    the Arrow boundary — only the one joined string per document does
    (kind/media_ref/offset bytes and per-span Python dicts are never
    shipped or built).

    Null offsets (contract-violating but tolerated) order LAST, stable
    among themselves — the same explicit rule as the Python fallback
    assembly, so assemble_in_jvm=True/False agree on every input."""
    filtered = F.filter(
        F.col(spans_col),
        lambda s: (s["kind"] == "html") & s["text"].isNotNull() & (s["text"] != ""),
    )
    ordered = F.array_sort(
        filtered,
        lambda l, r: F.when(l["offset"].isNull() & r["offset"].isNull(), 0)
        .when(l["offset"].isNull(), 1)
        .when(r["offset"].isNull(), -1)
        .when(l["offset"] < r["offset"], -1)
        .when(l["offset"] > r["offset"], 1)
        .otherwise(0),
    )
    return F.array_join(F.transform(ordered, lambda s: s["text"]), "")


def extract_spans(
    documents: DataFrame,
    num_partitions: int | None = None,
    keep_markdown: bool = True,
    use_arrow: bool = True,
    max_content_length: int | None = None,
    assemble_in_jvm: bool = True,
) -> DataFrame:
    """documents(doc_id, spans[, base_url, canonical_url, source_url]) →
    outputs(doc_id, title, spans, markdown, error, metrics cols).

    Defaults to the Arrow-native ``mapInArrow`` stage (measured ~15% faster
    than mapInPandas on this workload — no pandas materialization);
    ``use_arrow=False`` selects the mapInPandas variant.
    ``assemble_in_jvm`` (default) performs the span→html document assembly
    as a native projection so the span structs never cross into Python.
    """
    df = documents
    if num_partitions:
        df = salted_repartition(df, num_partitions)
    # canonical_url is part of the documents contract but unused by the
    # conversion chain — excluding it here keeps it off the Arrow boundary
    cols = [c for c in ("doc_id", "base_url", "source_url", "spans") if c in df.columns]
    sel = df.select(*cols)
    if use_arrow and assemble_in_jvm and hasattr(sel, "mapInArrow"):
        sel = sel.withColumn("html", html_assembly_expr("spans")).drop("spans")
    if use_arrow and hasattr(sel, "mapInArrow"):
        import functools

        fn = functools.partial(
            _extract_arrow_batches,
            emit_markdown=keep_markdown,
            max_content_length=max_content_length,
        )
        out = sel.mapInArrow(fn, schema=OUTPUT_SCHEMA)
    else:
        import functools

        out = sel.mapInPandas(
            functools.partial(_extract_batches, max_content_length=max_content_length),
            schema=OUTPUT_SCHEMA,
        )
    if not keep_markdown:
        out = out.drop("markdown")
    return out


# --- span-sequence equality verification (SURVEY.md Phase 4) ----------------


def span_equality_report(produced: DataFrame, expected: DataFrame) -> DataFrame:
    """Per-doc span-sequence equality on (kind, text, media_ref, order).

    posexplode both sides, full-outer join on (doc_id, pos) — the array
    POSITION, which is what "order" means in the north-rule invariant —
    any mismatch on (kind, text, media_ref) fails the doc.  Returns
    ``(doc_id, n_mismatched, equal)``.

    Joining on position (not the span's own offset field) keeps the report
    correct for contract-violating inputs: a null or duplicated offset
    would null-out or fan-out an offset-keyed join and report mismatches
    between identical sequences.  Callers must therefore hand in arrays in
    span order (extraction output already is; golden fixtures sort by
    offset at assembly).
    """

    def explode(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            "doc_id", F.posexplode_outer("spans").alias("pos", "span")
        ).select(
            "doc_id",
            "pos",
            F.col("span.kind").alias(f"{prefix}_kind"),
            F.col("span.text").alias(f"{prefix}_text"),
            F.col("span.media_ref").alias(f"{prefix}_media_ref"),
        )

    p = explode(produced, "p")
    e = explode(expected, "e")
    joined = p.join(e, ["doc_id", "pos"], "full_outer")
    mismatch = (
        (~F.col("p_kind").eqNullSafe(F.col("e_kind")))
        | (~F.col("p_text").eqNullSafe(F.col("e_text")))
        | (~F.col("p_media_ref").eqNullSafe(F.col("e_media_ref")))
    )
    return (
        joined.withColumn("is_mismatch", mismatch.cast("int"))
        .groupBy("doc_id")
        .agg(F.sum("is_mismatch").alias("n_mismatched"))
        .withColumn("equal", F.col("n_mismatched") == 0)
    )
