#!/usr/bin/env python
"""Run every alignment/sequence file in a directory through `recon` and
report tracebacks (robustness sweep; clean one-line errors pass).

Usage: python tools/smoke_corpus.py [-timeout S] <dir-or-files...>
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    timeout = 420
    if "-timeout" in args:
        i = args.index("-timeout")
        timeout = int(args[i + 1])
        del args[i : i + 2]
    files: list[str] = []
    for a in args:
        if os.path.isdir(a):
            for ext in ("*.fa", "*.stock", "*.nex"):
                files += glob.glob(os.path.join(a, ext))
        else:
            files.append(a)
    fails = 0
    for path in sorted(files):
        cmd = [sys.executable, "-m", "historian_tpu", "recon", "-platform", "cpu",
               "-fast", "-norefine", "-output", "fasta", path]
        try:
            p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT\t{path}")
            fails += 1
            continue
        if "Traceback" in p.stderr:
            last = [l for l in p.stderr.splitlines() if l.strip()][-1]
            print(f"TRACEBACK\t{path}\t{last[:140]}")
            fails += 1
        elif p.returncode != 0:
            last = [l for l in p.stderr.splitlines() if l.strip()][-1] if p.stderr.strip() else "?"
            print(f"clean-error\t{os.path.basename(path)}\t{last[:110]}")
        else:
            print(f"ok\t{os.path.basename(path)}")
    print(f"tracebacks/timeouts: {fails} / {len(files)}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
