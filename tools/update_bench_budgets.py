"""Regenerate per-key heavy-lane budgets for bench.py.

VERDICT r7 item 5: ``heavy_total`` grows every round as queries are added,
so a per-query regression can hide inside the growing total. Budgets make
regressions key-local: budget = trailing median of the key's recorded
medians × 1.5 (the box's documented ±35% noise band plus headroom), and
bench.py flags any median above its budget in the bench JSON.

Sources, newest last: pass any mix of BENCH_DETAIL.json files and driver
BENCH_r*.json records (whose ``tail`` text embeds the detail line). A key
keeps its last known budget until it has at least one recorded median.

    python tools/update_bench_budgets.py BENCH_r06.json BENCH_r07.json \
        [BENCH_DETAIL.json ...]

Writes BENCH_BUDGETS.json {key: budget_sec} — commit it; bench.py reads it.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADROOM = 1.5

# Hand-tightened ceilings (VERDICT r10 item 5): the suite's most expensive
# keys get budgets BELOW median×HEADROOM so drift surfaces as a breach
# instead of hiding inside the generous band. A pin caps the computed
# budget; it never raises one.
PINS = {
    "emb_ivfpq_recall_report": 8.0,
}


def heavy_medians(path: str) -> dict[str, float]:
    data = json.load(open(path))
    if "heavy" in data:  # BENCH_DETAIL.json shape
        return dict(data["heavy"])
    m = re.search(r'"heavy": \{(.*?)\}', data.get("tail", ""))
    return json.loads("{" + m.group(1) + "}") if m else {}


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    series: dict[str, list[float]] = {}
    for path in sys.argv[1:]:
        for key, med in heavy_medians(path).items():
            series.setdefault(key, []).append(med)
    out_path = os.path.join(REPO, "BENCH_BUDGETS.json")
    budgets: dict[str, float] = {}
    if os.path.exists(out_path):
        budgets = json.load(open(out_path))  # keys with no new data persist
    for key, meds in series.items():
        budgets[key] = round(statistics.median(meds) * HEADROOM, 3)
    for key, cap in PINS.items():
        if key in budgets:
            budgets[key] = min(budgets[key], cap)
    with open(out_path, "w") as fh:
        json.dump(dict(sorted(budgets.items())), fh, indent=1)
        fh.write("\n")
    print(f"wrote {out_path}: {len(budgets)} budgets "
          f"(median-of-{max(len(v) for v in series.values())} max series × {HEADROOM})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
