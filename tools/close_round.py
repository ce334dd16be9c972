"""Session-close ritual: full correctness sweep + record.

The driver samples ~50 queries per round, so between rounds most of the
inventory is only covered by THIS sweep: every ``queries()`` entry vs its
DuckDB oracle at sf0.01 through ``tools/check_correctness.py`` with a
driver-style plain session. Run it as the LAST step of a working session
(after the final query/operator edit), then commit the record.

Writes ``CLOSING_r{N}.json`` ({round, pass, weak, fail, failed: [...]})
and appends a one-line JSON record to ``PROGRESS.jsonl`` so the round's
closing state is part of the repo history the judge reads.

Run: ``python tools/close_round.py <round-number>``. Exit 0 only if no
query fails.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: python tools/close_round.py <round-number>")
        return 2
    rnd = int(sys.argv[1])
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "tools/check_correctness.py", "--plain-session", SF_DIR],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    out = proc.stdout
    statuses = {"PASS": [], "WEAK": [], "FAIL": []}
    for m in re.finditer(r"^(PASS|WEAK|FAIL) (\S+?):", out, re.M):
        statuses[m.group(1)].append(m.group(2))
    record = {
        "event": "closing_correctness_sweep",
        "round": rnd,
        "sf_dir": SF_DIR,
        "pass": len(statuses["PASS"]),
        "weak": len(statuses["WEAK"]),
        "fail": len(statuses["FAIL"]),
        "failed": sorted(statuses["FAIL"]),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(f"/root/repo/CLOSING_r{rnd:02d}.json", "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    with open("/root/repo/PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    if proc.returncode != 0 and not statuses["FAIL"]:
        print("check_correctness exited nonzero without FAIL lines — inspect:")
        print(out[-2000:])
        return 1
    return 1 if statuses["FAIL"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
