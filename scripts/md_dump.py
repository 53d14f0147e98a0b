"""Dump per-document Markdown files from extraction output (the analog of
the reference's scripts/hybrid-md-dump.mjs, reference:
scripts/hybrid-md-dump.mjs:18-40 — per-URL .md files under output/<host>/).

Usage: python scripts/md_dump.py <input documents parquet> <output dir> [limit]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_SAFE = re.compile(r"[^A-Za-z0-9._#-]+")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    input_path, out_dir = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    from fetch_engines_spark.extract import extract_spans
    from fetch_engines_spark.session import get_spark

    spark = get_spark(app_name="md-dump")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(input_path).limit(limit)
    rows = extract_spans(docs, keep_markdown=True).select("doc_id", "markdown", "error").collect()
    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for r in rows:
        if not r.markdown:
            continue
        name = _SAFE.sub("_", r.doc_id)[:120] or "doc"
        with open(os.path.join(out_dir, f"{name}.md"), "w") as f:
            f.write(r.markdown + "\n")
        written += 1
    spark.stop()
    print(f"wrote {written} markdown files to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
