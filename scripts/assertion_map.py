"""Regenerate the FIXTURES.md §assertion-map table: a 1:1 audit of every
markdown assertion in the reference's MarkdownConverter test suite against
the fixture corpus (enforced live by tests/test_assertion_parity.py).

Run: python scripts/assertion_map.py   (prints the markdown table)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fetch_engines_spark.fixtures import FIXTURES

REF_TEST = "/root/reference/test/MarkdownConverter.test.ts"

IT_RX = re.compile(r'it\("([^"]+)"')
ASSERT_RX = re.compile(r"expect\(markdown\)(\.not)?\.toContain\(\s*([`\"'])(.*?)\2\s*\)", re.S)


def main() -> None:
    src = open(REF_TEST).read()
    lines = src.split("\n")
    # map line number -> current it() title
    blocks: list[tuple[int, str]] = []
    for i, line in enumerate(lines, 1):
        m = IT_RX.search(line)
        if m:
            blocks.append((i, m.group(1)))

    def block_for(lineno: int) -> tuple[int, str]:
        cur = (0, "?")
        for start, title in blocks:
            if start <= lineno:
                cur = (start, title)
        return cur

    pos = {s: f.id for f in FIXTURES for s in f.must_contain}
    neg = {s: f.id for f in FIXTURES for s in f.must_not_contain}

    print("| ref line | test case | assertion | kind | fixture | pinned |")
    print("|---|---|---|---|---|---|")
    for m in ASSERT_RX.finditer(src):
        lineno = src[: m.start()].count("\n") + 1
        is_neg = bool(m.group(1))
        s = m.group(3)
        start, title = block_for(lineno)
        table = neg if is_neg else pos
        fid = table.get(s, "—")
        ok = "yes" if s in table else "**MISSING**"
        short = s if len(s) <= 58 else s[:55] + "..."
        kind = "not.toContain" if is_neg else "toContain"
        print(f"| {lineno} | {title[:40]} | `{short}` | {kind} | {fid} | {ok} |")
    print()
    print(
        "| scripts/test-table.mjs | 3-row headerless table | promoted GFM header "
        "+ both data rows + no raw `<table>` | toContain/not | F25 | yes |"
    )


if __name__ == "__main__":
    main()
