"""Regenerate the committed language-ID model artifact.

    PYTHONPATH=/root/repo python tools/train_langid.py

Deterministic function of gnarly_spark.functions.langid.SEED_TEXT; the
committed parquet is the single source of truth both engines read (the
Spark scorer and the DuckDB oracle), so retraining is an explicit,
reviewable step — tests pin the committed artifact against a fresh
train_model() run."""

from __future__ import annotations

import sys

from gnarly_spark.functions.langid import model_path, write_model


def main() -> int:
    path = write_model()
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
