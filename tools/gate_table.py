"""Regenerate BASELINE.md's full per-query gate table from a
check_oracle.py log (VERDICT r02 ask #9: the judge cross-checks the
half the driver didn't sample). Usage: python tools/gate_table.py <log>."""

import re
import sys

log = open(sys.argv[1]).read()
rows = []
for m in re.finditer(r"^PASS  (\S+): (\d+) rows", log, re.M):
    rows.append((m.group(1), "pass", m.group(2)))
for m in re.finditer(r"^FAIL  (\S+):", log, re.M):
    rows.append((m.group(1), "**FAIL**", "-"))
for m in re.finditer(r"^ROWS  (\S+): (\d+) rows", log, re.M):
    rows.append((m.group(1), "rows-only", m.group(2)))
rows.sort()
table = "| query | gate | rows |\n|---|---|---|\n" + "\n".join(
    f"| {q} | {g} | {r} |" for q, g, r in rows
)
n_pass = sum(1 for r in rows if r[1] == "pass")
n_fail = sum(1 for r in rows if r[1] == "**FAIL**")
n_ro = sum(1 for r in rows if r[1] == "rows-only")
summary = f"{n_pass} pass, {n_ro} rows-only, {n_fail} fail."

p = "BASELINE.md"
s = open(p).read()
start = s.index("| query | gate | rows |")
# the summary line may carry a trailing annotation — replace only the
# counts themselves, keep anything after the period
end = re.search(r"^\d+ pass, \d+ rows-only, \d+ fail\.", s[start:], re.M)
assert end, "summary line not found after table"
stop = start + end.end()
open(p, "w").write(s[:start] + table + "\n\n" + summary + s[stop:])
print(f"wrote {len(rows)} rows; {summary}")
