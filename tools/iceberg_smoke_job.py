"""Iceberg production-sink smoke sequence — run via tools/iceberg_smoke.sh.

Exercises the exact surface ParquetLakeTable's contract tests pin but that
only a real Iceberg runtime can execute (tests/test_lake.py:
test_iceberg_merge_source_contract / test_iceberg_merge_sql_contract check
the generated MERGE SQL and source schema jar-free; THIS runs them):

  1. create a hadoop-catalog Iceberg table and MERGE 1,000 rows (batch 0)
  2. refire batch 0 with different values  -> must be a no-op (idempotence)
  3. MERGE batch 1: 100 updates + 50 deletes + 10 inserts in ONE commit
  4. schema evolution: batch 2 adds a column mid-stream (Iceberg schema
     merge widens the table; old rows read NULL)
  5. time travel: the pre-delete snapshot still shows the deleted keys
  6. expire_snapshots keeps the table queryable

Prints one `SMOKE <step> PASS|FAIL <detail>` line per step and exits
non-zero on the first failure; iceberg_smoke.sh diffs the PASS lines
against the expected block embedded there.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gnarly_spark.sinks.lake import IcebergLakeTable

TABLE = "lake.db.smoke_pages"


def step(name: str, ok: bool, detail: str = "") -> None:
    print(f"SMOKE {name} {'PASS' if ok else 'FAIL'} {detail}".rstrip(), flush=True)
    if not ok:
        sys.exit(1)


def main() -> None:
    spark = SparkSession.builder.appName("iceberg-smoke").getOrCreate()
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    spark.sql(
        f"CREATE TABLE {TABLE} (url string, v bigint, _batch_id bigint) "
        "USING iceberg"
    )
    t = IcebergLakeTable(spark, TABLE, key="url")

    rows = spark.range(1000).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("url"),
        F.col("id").alias("v"),
    )
    t.merge(rows, batch_id=0)
    step("initial_merge", t.read().count() == 1000)

    # refire: same batch_id, different values -> no-op
    refired = t.merge(rows.withColumn("v", F.col("v") + 777), batch_id=0)
    unchanged = t.read().agg(F.sum("v")).collect()[0][0] == 999 * 1000 // 2
    step("refire_noop", refired is False and unchanged)

    v_before = t.current_version()
    ups = rows.where("v < 100").withColumn("v", F.col("v") + 100000).unionByName(
        spark.range(10).select(
            F.concat(F.lit("https://ex.com/new/"), F.col("id")).alias("url"),
            (F.col("id") + 5000).alias("v"),
        )
    )
    dels = rows.where("v >= 950").select("url")
    t.merge(ups, delete_keys=dels, batch_id=1)
    got = t.read()
    step(
        "merge_update_delete_insert",
        got.count() == 1000 - 50 + 10
        and got.where("v >= 100000").count() == 100
        and got.where("url like '%/new/%'").count() == 10,
    )

    # schema evolution: a column added mid-stream widens the table
    spark.sql(f"ALTER TABLE {TABLE} ADD COLUMN lang string")
    t.merge(
        spark.createDataFrame(
            [("https://ex.com/p/0", 1, "en")], "url string, v bigint, lang string"
        ),
        batch_id=2,
    )
    evolved = t.read()
    step(
        "schema_evolution",
        "lang" in evolved.columns
        and evolved.where("lang = 'en'").count() == 1
        and evolved.where("lang IS NULL").count() == evolved.count() - 1,
    )

    # time travel: the snapshot before batch 1 still holds deleted keys
    old = spark.read.option("snapshot-id", v_before).table(TABLE)
    step("time_travel", old.count() == 1000 and old.where("v >= 950").count() == 50)

    t.expire_snapshots(keep_last=2)
    step("expire_snapshots", t.read().count() == 960)

    step("all", True, f"final_rows={t.read().count()}")
    spark.stop()


if __name__ == "__main__":
    main()
