"""A/B evidence for the bounded retain_log=False re-read (BENCH.md).

The replayable-source mode re-reads the changelog source every micro-batch
to adjudicate reverts. Leg A (bounded, the shipped code) scans only the
retained batches' files; leg B forces the full-dir fallback by disabling
the per-trigger file metadata — the pre-fix behavior, O(delivered history)
per trigger. JSONL source on purpose: a text scan has no footer stats, so
the fallback re-parses every delivered line per trigger (the pathological
case the fix exists for).

Each leg runs in a fresh JVM (subprocess), drains the SAME pre-written
changelog, verifies final-state row count + checksum equality with the
other leg, and reports total wall plus mean per-batch wall for the first
and last 8 triggers (per-batch metrics come from the pipeline's own
metrics files). Prints one JSON line; paste into BENCH.md.

Run: python tools/reread_ab.py [n_events] [n_files]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

LEG_CODE = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from gnarly_spark.session import get_spark
from gnarly_spark.streaming.pipeline import CdcIngestPipeline
import pyspark.sql.functions as F

bounded = {bounded}
spark = get_spark(app_name="reread_ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
if not bounded:
    # force the pre-fix behavior: no per-trigger file metadata -> the
    # adjudication read falls back to scanning the whole source dir
    CdcIngestPipeline._trigger_files = lambda self, batch_id: None

p = CdcIngestPipeline(spark, {work!r}, retain_log=False, retention_blocks=20)
t0 = time.monotonic()
q = p.start({src!r}, available_now=True, max_files_per_trigger=1, source_format="jsonl")
q.awaitTermination()
wall = time.monotonic() - t0
ms = p.metrics()
walls = [m["wall_s"] for m in ms]
final = p.pages().agg(
    F.count(F.lit(1)).alias("rows"),
    F.sum(F.xxhash64("url", "text").cast("decimal(38,0)")).alias("chk"),
).collect()[0]
print("LEG_RESULT " + json.dumps({{
    "bounded": bounded, "wall_s": round(wall, 1), "n_batches": len(ms),
    "first8_mean_s": round(sum(walls[:8]) / 8, 2),
    "last8_mean_s": round(sum(walls[-8:]) / 8, 2),
    "rows": final.rows, "chk": str(final.chk),
}}))
spark.stop()
"""


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 320_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    base = tempfile.mkdtemp(prefix="reread_ab_")
    src = os.path.join(base, "changelog")

    gen = f"""
import os, sys
sys.path.insert(0, {REPO!r})
from gnarly_spark.session import get_spark
from gnarly_spark.datagen import gen_changelog_spark
import pyspark.sql.functions as F
spark = get_spark(app_name="gen", cpus=8)
df = gen_changelog_spark(spark, {n_events}, revert_every_blocks=25).orderBy("op_seq")
rows_per = ({n_events} + {n_files} - 1) // {n_files}
j = df.select(F.to_json(F.struct("*"), {{"timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"}}).alias("value"),
              (F.col("op_seq") / (rows_per + 1)).cast("long").alias("_f"))
import time
for i in range({n_files}):  # sequential writes: file mtime order == op_seq order
    j.where(F.col("_f") == i).select("value").coalesce(1).write.mode("overwrite").text(
        os.path.join({src!r}, f"c={{i:04d}}"))
    time.sleep(0.05)
spark.stop()
"""
    subprocess.run([sys.executable, "-c", gen], check=True, cwd=REPO)

    results = []
    for bounded in (True, False):
        code = LEG_CODE.format(
            repo=REPO, bounded=bounded, src=src,
            work=os.path.join(base, f"work_{bounded}"),
        )
        out = subprocess.run(
            [sys.executable, "-c", code], check=True, cwd=REPO,
            capture_output=True, text=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("LEG_RESULT ")][0]
        results.append(json.loads(line[len("LEG_RESULT "):]))
        print(line, file=sys.stderr)

    a, b = results
    assert a["rows"] == b["rows"] and a["chk"] == b["chk"], "legs disagree!"
    print(json.dumps({
        "n_events": n_events, "n_files": n_files,
        "bounded": a, "full_dir": b,
        "tail_speedup": round(b["last8_mean_s"] / max(a["last8_mean_s"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
