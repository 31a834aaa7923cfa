#!/usr/bin/env python3
"""Cite-checker (r16 verdict item 7): every ``file.py:line`` cite in the
blueprint docs must resolve to a real file with at least that many lines.

Repo-side cites resolve against the repo tree; reference-side cites
(etl_pipeline.py, app.py, app_simple.py, main.py, test_server.py,
console_test.html, index.html, README.md inside a reference-context
line) resolve against /root/reference.  Exit nonzero listing every
stale cite so the round checklist keeps the docs navigable.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
DOCS = ["SURVEY.md", "README.md", "SCALING.md"]
REF_FILES = {
    "etl_pipeline.py",
    "app.py",
    "app_simple.py",
    "main.py",
    "test_server.py",
    "console_test.html",
    "index.html",
    "README.md",  # the reference's README when cited as README.md:NNN
    "TEST_DEMO.py",
    "diagnostic.html",
    "console_test.html",
    "JURY_PRESENTATION_CARD.md",
    "CLEANUP_SUMMARY.md",
}
CITE = re.compile(r"([A-Za-z_0-9./-]+\.(?:py|html|md)):(\d+)")

_line_counts: dict[str, int] = {}


def _lines(path: str) -> int:
    if path not in _line_counts:
        try:
            with open(path, "rb") as fh:
                _line_counts[path] = sum(1 for _ in fh)
        except OSError:
            _line_counts[path] = -1
    return _line_counts[path]


def _resolve(fname: str) -> "list[str]":
    base = os.path.basename(fname)
    # Reference-side names resolve in /root/reference (README.md is the
    # one collision: prefer the repo's own README for bare cites, the
    # reference's for section-range cites — both exist, so either way
    # the cite "resolves"; check the repo copy first).
    candidates = [
        os.path.join(REPO, fname),
        os.path.join(REPO, "etl_pipeline2_0_spark", fname),
    ]
    if "/" not in fname:
        for sub in ("etl_pipeline2_0_spark", "tests", "tools"):
            root = os.path.join(REPO, sub)
            for dirpath, _dirs, files in os.walk(root):
                if base in files:
                    candidates.append(os.path.join(dirpath, base))
    if base in REF_FILES:
        candidates.append(os.path.join(REFERENCE, base))
    return [c for c in candidates if os.path.isfile(c)]


def main() -> int:
    stale: list[str] = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.isfile(path):
            continue
        text = open(path, encoding="utf-8").read()
        for lineno, line in enumerate(text.splitlines(), 1):
            for m in CITE.finditer(line):
                fname, cited_line = m.group(1), int(m.group(2))
                targets = _resolve(fname)
                if not targets:
                    stale.append(
                        f"{doc}:{lineno}: cite {fname}:{cited_line} — file not found"
                    )
                elif all(_lines(t) < cited_line for t in targets):
                    best = max(targets, key=_lines)
                    stale.append(
                        f"{doc}:{lineno}: cite {fname}:{cited_line} — "
                        f"{os.path.relpath(best, REPO)} has only "
                        f"{_lines(best)} lines"
                    )
    if stale:
        print(f"{len(stale)} stale cites:")
        for s in stale:
            print(" ", s)
        return 1
    print("all doc cites resolve")
    return 0


if __name__ == "__main__":
    sys.exit(main())
