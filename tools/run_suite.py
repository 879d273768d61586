"""Suite supervisor: run pytest and enforce BOTH a zero exit code and a
visible final summary line.

Born from the round-4 review's "unclean exit" scare: `addopts = "-q"`
stacked with the documented `pytest tests/ -q` into `-qq`, which by
design suppresses the "N passed in Xs" line — a green run then looked
like a process that died before flushing. This wrapper would have
flagged the missing summary immediately (and a genuinely dirty exit
code ever after).

    python tools/run_suite.py [extra pytest args]
"""
from __future__ import annotations

import re
import subprocess
import sys

REPO = __file__.rsplit("/", 2)[0]


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q", *args]
    print("$", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr[-4000:])

    summary = None
    for line in reversed(proc.stdout.splitlines()):
        if re.search(r"\d+ (passed|failed|error)", line):
            summary = line.strip()
            break
    ok = proc.returncode == 0 and summary is not None and \
        "failed" not in summary and "error" not in summary
    print(f"\nsupervisor: rc={proc.returncode} summary={summary!r} "
          f"-> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
