"""Single source of truth for performance numbers (VERDICT round 2 item 4:
"no two documents disagree about any metric").

``docs/results.json`` holds one entry per metric: value, unit, workload,
date, and the command that produced it.  This script regenerates the
performance tables in README.md and docs/BENCH_NOTES.md between marker
comments from that file — numbers are never hand-edited in the documents.

Usage:
    python benchmarks/render_results.py                  # re-render tables
    python benchmarks/render_results.py --set KEY FIELD VALUE
"""

import json
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)
RESULTS = os.path.join(ROOT, "docs", "results.json")

BEGIN = "<!-- BEGIN GENERATED RESULTS (benchmarks/render_results.py) -->"
END = "<!-- END GENERATED RESULTS -->"


def load():
    with open(RESULTS) as f:
        return json.load(f)


def table(results, keys):
    rows = ["| Metric | Result | Workload / notes | Measured |",
            "|---|---|---|---|"]
    for k in keys:
        r = results[k]
        rows.append(f"| {r['metric']} | **{r['value']}** | {r['workload']} "
                    f"| {r['date']} (`{r['source']}`) |")
    return "\n".join(rows)


def splice(path, text):
    with open(path) as f:
        doc = f.read()
    pattern = re.compile(re.escape(BEGIN) + ".*?" + re.escape(END),
                         re.DOTALL)
    if not pattern.search(doc):
        raise SystemExit(f"{path}: markers not found")
    doc = pattern.sub(BEGIN + "\n" + text + "\n" + END, doc)
    with open(path, "w") as f:
        f.write(doc)
    print(f"rendered {path}")


def render():
    """Regenerate the README / BENCH_NOTES tables from results.json
    (called by bench.py after it records a run)."""
    results = load()
    order = [k for k in results]
    text = table(results, order)
    splice(os.path.join(ROOT, "README.md"), text)
    splice(os.path.join(ROOT, "docs", "BENCH_NOTES.md"), text)


def main():
    if len(sys.argv) >= 5 and sys.argv[1] == "--set":
        key, field, value = sys.argv[2], sys.argv[3], " ".join(sys.argv[4:])
        results = load()
        results.setdefault(key, {})[field] = value
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=2)
    render()


if __name__ == "__main__":
    main()
