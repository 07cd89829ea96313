#!/usr/bin/env python
"""Round every float in a text stream to N significant figures.

Counterpart of the reference's perl/roundfloats.pl (used by its golden
tests to compare outputs at 4-10 sig figs).  Usage:
    python tools/roundfloats.py N [file...]
"""

from __future__ import annotations

import re
import sys

FLOAT_RE = re.compile(r"-?\d+\.?\d*(?:[eE][-+]?\d+)?")


def round_line(line: str, sig: int) -> str:
    def repl(m: re.Match) -> str:
        tok = m.group(0)
        try:
            val = float(tok)
        except ValueError:
            return tok
        if tok.isdigit() or (tok.startswith("-") and tok[1:].isdigit()):
            return tok  # leave integers untouched
        return f"%.{sig}g" % val

    return FLOAT_RE.sub(repl, line)


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        sys.exit("usage: roundfloats.py <sig-figs> [file...]")
    sig = int(sys.argv[1])
    paths = sys.argv[2:] or ["/dev/stdin"]
    for path in paths:
        with open(path) as f:
            for line in f:
                sys.stdout.write(round_line(line.rstrip("\n"), sig) + "\n")


if __name__ == "__main__":
    main()
