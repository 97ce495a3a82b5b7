"""gnarly_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Capabilities modeled on XLNT/gnarly (the "ourbit" optimistic-state-machine
ETL: changelog tail -> reducers -> steady-state store + audit log + reorg
rollback + crash resume), re-expressed in idiomatic Spark:

- the changelog is a table / stream, not an RPC tail;
- state lives in a lake table, not in process memory;
- reorg rollback is data (revert events + last-writer-wins), not control flow;
- reducers are the three canonical shapes the reference ships
  (append-only, LWW upsert, abelian fold), applied per micro-batch in
  ``foreachBatch`` with an idempotent keyed MERGE.

See /root/repo/SURVEY.md for the full capability map with reference
citations (file:line into /root/reference).
"""

__version__ = "0.1.0"
