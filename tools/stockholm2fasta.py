#!/usr/bin/env python
"""Stockholm -> gapped FASTA converter.

Counterpart of the reference's perl/stockholm2fasta.pl: reads one or
more Stockholm alignments (file args or stdin) and writes gapped FASTA.
-g strips gaps (ungapped output); -c WIDTH wraps sequence lines.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from historian_tpu.core.stockholm import Stockholm


def main() -> None:
    args = sys.argv[1:]
    degap = "-g" in args
    width = 0
    if "-c" in args:
        i = args.index("-c")
        width = int(args[i + 1])
        del args[i : i + 2]
    args = [a for a in args if a != "-g"]
    paths = args or ["/dev/stdin"]
    for path in paths:
        for stock in Stockholm.read_all(path):
            for seq in stock.gapped:
                s = seq.seq
                if degap:
                    s = s.replace("-", "").replace(".", "")
                print(f">{seq.name}")
                if width:
                    for k in range(0, len(s), width):
                        print(s[k : k + width])
                else:
                    print(s)


if __name__ == "__main__":
    main()
