#!/usr/bin/env python3
"""Verify COVERAGE.md's file:line anchors against the source tree.

Rules, from strongest to weakest:

1. An anchor of the form `…/path.scala:N` (`Symbol`) — the symbol-annotated
   form every §2.1 row uses — must cite the EXACT line where `Symbol` is
   defined (`case class|class|object|def|val Symbol`). If the file grew and
   the definition moved, this fails and prints the actual line so the
   refresh is a one-number edit.
2. A bare anchor `…/path.scala:N` (no symbol) must at least cite a line
   inside the file whose ±3-line window contains a definition keyword —
   the gross-drift catch for rows nobody annotated yet.

`…/` abbreviates `src/main/scala/graft/` (the COVERAGE.md convention).

Run from the repo root (the snapshot gate does): exits non-zero on any
stale anchor.
"""
import re
import sys
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
PREFIX = ROOT / "src" / "main" / "scala" / "graft"
DEF_RE = r"(?:case class|abstract class|class|object|def|val)"

def definition_line(path, symbol):
    """1-based line numbers where `symbol` is defined in `path`."""
    hits = []
    pat = re.compile(rf"\b{DEF_RE}\s+{re.escape(symbol)}\b")
    for i, line in enumerate(path.read_text().split("\n"), start=1):
        if pat.search(line):
            hits.append(i)
    return hits

def main():
    text = (ROOT / "COVERAGE.md").read_text()
    failures = []
    checked = 0

    # Form 1: `…/file.scala:N` (`Symbol`)
    for m in re.finditer(r"`…/([\w/.]+\.scala):(\d+)`\s+\(`(\w+)`\)", text):
        rel, cited, symbol = m.group(1), int(m.group(2)), m.group(3)
        path = PREFIX / rel
        checked += 1
        if not path.exists():
            failures.append(f"{rel}: file missing (anchor for {symbol})")
            continue
        hits = definition_line(path, symbol)
        if cited not in hits:
            failures.append(
                f"{rel}:{cited} claims `{symbol}` but its definition is at "
                f"{hits if hits else 'NOWHERE in the file'}")

    # Form 2: bare `…/file.scala:N` without a symbol annotation
    for m in re.finditer(r"`…/([\w/.]+\.scala):(\d+)`(?!\s+\(`)", text):
        rel, cited = m.group(1), int(m.group(2))
        path = PREFIX / rel
        checked += 1
        if not path.exists():
            failures.append(f"{rel}: file missing")
            continue
        lines = path.read_text().split("\n")
        if cited > len(lines):
            failures.append(f"{rel}:{cited} beyond end of file ({len(lines)} lines)")
            continue
        window = "\n".join(lines[max(0, cited - 4):cited + 3])
        if not re.search(DEF_RE, window):
            failures.append(
                f"{rel}:{cited} has no definition within ±3 lines — likely drifted")

    if failures:
        print(f"check_coverage_anchors: {len(failures)} stale of {checked} anchors")
        for f in failures:
            print("  STALE  " + f)
        sys.exit(1)
    print(f"check_coverage_anchors: {checked} anchors verified")

if __name__ == "__main__":
    main()
