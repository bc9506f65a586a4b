"""Measure line-identity between a repo file and its reference counterpart.

The round-3 judge flagged several CPU-side files as derived-with-edits using
this metric: the fraction of the repo file's non-blank lines (whitespace
stripped) that appear verbatim in the reference file. Goal per VERDICT r3
item 2: <25% for each previously flagged file.

Usage: python scripts/line_identity.py <repo_file> <reference_file>
"""

from __future__ import annotations

import sys
from pathlib import Path


def identity(repo_file: str, ref_file: str) -> tuple[int, int, float]:
    def lines(p: str) -> list[str]:
        return [
            ln.strip()
            for ln in Path(p).read_text().splitlines()
            if ln.strip()
        ]

    repo = lines(repo_file)
    ref = set(lines(ref_file))
    hits = sum(1 for ln in repo if ln in ref)
    return hits, len(repo), hits / max(len(repo), 1)


if __name__ == "__main__":
    hits, total, frac = identity(sys.argv[1], sys.argv[2])
    print(f"{hits}/{total} identical non-blank lines = {frac:.1%}")
