"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship document-intake pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline operators); each callable is (spark, sf_dir) → DF.
``oracle_sql()`` — DuckDB-runnable ANSI SQL twin for every query (the few
non-SQL-expressible ops are rows-only entries without an oracle).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from crawlspark.queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: document-intake pipeline (tokens × quality × lang-guess ×
    dedup signature) over /root/testdata/sf0.001 — the per-document analysis
    stage a crawl feeds at scale."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    qs = SPARK_QUERIES
    tok = qs["token_count"](spark, sf_dir)
    qual = qs["quality_score"](spark, sf_dir).select(
        "doc_id", "stop_ratio", "quality"
    )
    lang = qs["lang_id"](spark, sf_dir).select("doc_id", "lang", "guess")
    fp = qs["doc_fingerprint"](spark, sf_dir).select("doc_id", "short_id")
    return (
        tok.join(qual, "doc_id")
        .join(lang, "doc_id")
        .join(fp, "doc_id")
        .select(
            "doc_id", "lang", "guess", "quality", "n_ws_tokens",
            "n_bpe_tokens", "stop_ratio", "short_id",
        )
        .orderBy(F.asc("doc_id"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
