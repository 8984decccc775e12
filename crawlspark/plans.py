"""Plan-shaping utilities.

``materialize_once`` — evaluate expensive Column expressions exactly once
per row, as a codegen-friendly optimizer barrier.

Why it exists: Catalyst's predicate pushdown substitutes a Project alias
into any filter above it, so a predicate that references a derived column
several times (the URL skip filter consumes the canonical URL ~7×: empty
check, three rlikes, exact blocklist, host→domain allowlist) re-inlines
the defining expression per reference.  For the 30-deep fix_url
regexp_replace chain (reference covid_news_spider.py:832-878) that builds
a single generated method past janino's 64 KB limit — whole-stage codegen
fails and the hottest filter in the engine silently runs on the
interpreted expression path (observed: InternalCompilerException stack,
then fallback).

The barrier: project the expression as the field of a one-element
``explode(array(struct(...)))``.  Generator OUTPUT attributes cannot be
substituted into predicates below the Generate (pushdown only crosses a
Generate for predicates on its INPUT), so the expression is evaluated
exactly once, inside whole-stage codegen, and every downstream reference
is a plain attribute read.  Row multiplicity is unchanged (the array
always has exactly one element) and everything stays JVM-side — no
shuffle, no Python, no caching.

Verified: with spark.sql.codegen.fallback=false the canonicalize+skip
pipeline compiles (one chain copy in the plan) where the naive form
throws InternalCompilerException (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAT = "__materialized"


def spread_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin-spread a narrow scan across the cluster's cores — ONLY
    when the scan itself cannot provide the parallelism.

    Guide §2.5 ("input skew: one huge unsplittable file … otherwise
    repartition immediately after the read"): a small parquet input written
    as a single row group scans as ONE task no matter how many cores exist,
    which serializes every fused row-local stage above it (md5/shingle/
    cosine work observed running 1-of-32 cores).  The repartition is
    scale-adaptive, not a local-mode constant: the target is the session's
    default parallelism (driven by ``SPARK_GRAFT_CPUS`` / cluster conf) and
    it is skipped entirely when the scan already has at least that many
    splits — at production scale (many files / row groups) this is a no-op
    and no shuffle is added.  Column pruning and predicate pushdown pass
    through the exchange, so the scan is unaffected.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def materialize_once(df: DataFrame, **cols: Column) -> DataFrame:
    """Append ``cols`` to ``df``, each evaluated exactly once per row.

    Equivalent to ``df.withColumns(cols)`` except Catalyst cannot inline
    the expressions into downstream predicates/projections, so an
    expensive expression referenced N times downstream is still computed
    once (and the generated code for each expression stays in its own
    method, under the JIT/janino size limits).
    """
    if not cols:
        return df
    packed = F.explode(
        F.array(F.struct(*[c.alias(n) for n, c in cols.items()]))
    ).alias(_MAT)
    keep = [F.col(c) for c in df.columns]
    return df.select(*keep, packed).select(
        *[F.col(c) for c in df.columns],
        *[F.col(f"{_MAT}.{n}").alias(n) for n in cols],
    )
