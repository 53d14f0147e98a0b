"""PII detection and redaction over document corpora.

The standard pre-training scrub (Dolma, RedPajama, FineWeb all ship a
variant): find emails / IPv4 addresses / US-style ID and phone numbers
with conservative regexes and replace them with typed mask tokens,
reporting per-document match counts so downstream filters can drop
PII-dense documents entirely.

Engine shape (10^12 docs): every stage is a native `regexp_count` /
`regexp_replace` column expression riding the scan — no shuffle, no
Python, whole-stage-codegen end to end.  The DuckDB twin is generated
from the SAME pattern table (:data:`PII_PATTERNS`), so the two engines
cannot drift; patterns deliberately use only syntax with identical
semantics in Java regex and RE2 (no lookaround, no backrefs, ASCII
classes — `\\b`/`\\d` are Unicode-aware in Java but all patterns anchor
on ASCII-only token chars, where the dialects agree).

Categories are applied IN ORDER, each on the output of the previous
redaction (mask tokens contain no digits or ``@``, so a later pattern
can never match inside an earlier mask): email first (it may contain
dots and digits an IP/phone pattern would chew on), then IPv4, then SSN
(its ddd-dd-dddd shape is a phone-pattern near-miss), then phone.

No reference analog: fetch-engines extracts content and never scrubs it
(the closest surface is the X4 quality gate in
``src/render-detection.ts``); this operator exists for the
training-data pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (category, regex, mask) — order is the application order.  Regexes are
# valid and semantically identical under Java regex (Spark) and RE2
# (DuckDB): leftmost-first alternation, greedy quantifiers, no
# lookaround/backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<ID>",
    ),
    (
        # +CC and (area) prefixes optional; groups REQUIRE a separator so
        # bare digit runs (ids, years) never match
        "phone",
        r"(?:\+\d{1,2}[ -]?)?\(?\d{3}\)?[ -.]\d{3}[ -.]\d{4}\b",
        "<PHONE>",
    ),
]


def _redaction_chain(text: Column) -> tuple[Column, dict[str, Column]]:
    """Apply the pattern table in order; return (redacted, counts).

    Counts are taken on the text as it stood when that category ran
    (i.e. post earlier redactions) — identical to what the sequential
    scrub actually removed, and what the SQL twin counts."""
    counts: dict[str, Column] = {}
    cur = text
    for cat, rx, mask in PII_PATTERNS:
        counts[f"n_{cat}"] = F.regexp_count(cur, F.lit(rx))
        cur = F.regexp_replace(cur, rx, mask)
    return cur, counts


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Add ``out_col`` (scrubbed text) and int ``n_email`` / ``n_ip`` /
    ``n_ssn`` / ``n_phone`` count columns.  Pure stateless column
    expressions — safe at any scale, composes with every other stage."""
    redacted, counts = _redaction_chain(F.col(text_col))
    out = df.withColumn(out_col, redacted)
    for name, col in counts.items():
        out = out.withColumn(name, col.cast("long"))
    return out


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ip, n_ssn, n_phone, redacted_md5) — the
    counts plus an md5 of the scrubbed text (md5, not hash(): engine
    hash functions differ; md5 is the cross-engine fingerprint)."""
    redacted, counts = _redaction_chain(F.col(text_col))
    return df.select(
        "doc_id",
        *[col.cast("long").alias(name) for name, col in counts.items()],
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )


def pii_oracle_sql(source: str = "documents", text_expr: str = "text") -> str:
    """DuckDB twin of :func:`pii_features`, generated from the SAME
    pattern table: sequential redaction CTE chain, count-before-redact
    per category, md5 of the final text."""
    lines = [f"WITH s0 AS (SELECT doc_id, {text_expr} AS t0 FROM {source})"]
    prev = "s0"
    count_exprs = []
    for i, (cat, rx, mask) in enumerate(PII_PATTERNS):
        rx_sql = rx.replace("'", "''")
        nxt = f"s{i + 1}"
        lines.append(
            f", {nxt} AS (SELECT doc_id, "
            f"CAST(len(regexp_extract_all(t{i}, '{rx_sql}')) AS BIGINT)"
            f" AS n_{cat}, "
            f"regexp_replace(t{i}, '{rx_sql}', '{mask}', 'g') AS t{i + 1}"
            + (
                ""
                if i == 0
                else ", " + ", ".join(f"n_{c}" for c, _, _ in PII_PATTERNS[:i])
            )
            + f" FROM {prev})"
        )
        prev = nxt
        count_exprs.append(f"n_{cat}")
    n = len(PII_PATTERNS)
    lines.append(
        f"SELECT doc_id, {', '.join(count_exprs)}, md5(t{n}) AS redacted_md5"
        f" FROM {prev}"
    )
    return "\n".join(lines)
