"""Adaptive recrawl scheduling (freshness policy).

The reference recrawls on a fixed cache window (HTTPCACHE_EXPIRATION_SECS,
settings.py:85 — the same global constant for every URL).  A production
crawler sizes each URL's refetch interval from its observed change rate:
pages that never change get exponentially longer intervals, pages that
just changed get the base interval again.  This module computes that
policy from the engine's own fetch history log:

    freshness_state(history)  : (url, snap_id, body_hash) fetch history →
        per-url (last_snap, last_change_snap, unchanged_streak,
        interval_snaps, next_due_snap)
    due_for_refetch(state, n) : the URLs whose next_due_snap <= n — the
        recrawl frontier for snapshot n.

Interval policy: ``base_snaps * 2^min(unchanged_streak, max_doublings)``
— the standard exponential backoff on "no change observed", capped so a
page can never fall more than ``base << max_doublings`` snapshots behind.
The clock is the engine's snapshot id (the global monotone commit clock
the cache-staleness filter already uses, crawl.py fetch_cache_max_age_
snaps), so the policy composes with the existing recrawl machinery.

Scale shape: ONE shuffle on url (the lag window and the per-url aggregate
share the partitioning; AQE reuses the exchange).  Nothing is
driver-resident, no per-row Python — at a 10^10-URL history this is a
single keyed pass over the fetch log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def freshness_state(
    history: DataFrame,
    base_snaps: int = 2,
    max_doublings: int = 5,
) -> DataFrame:
    """Per-URL adaptive refetch state from a (url, snap_id, body_hash)
    fetch history.  A fetch counts as a CHANGE when its body hash differs
    from the previous fetch's (the first fetch is a change by definition);
    the unchanged streak is the number of fetches since the last change.
    """
    w = Window.partitionBy("url").orderBy("snap_id")
    w_all = Window.partitionBy("url")
    changed = (
        F.lag("body_hash").over(w).isNull()
        | (F.col("body_hash") != F.lag("body_hash").over(w))
    )
    h = history.withColumn("changed", changed).withColumn(
        "last_change_snap",
        F.max(F.when(F.col("changed"), F.col("snap_id"))).over(w_all),
    )
    g = h.groupBy("url").agg(
        F.max("snap_id").alias("last_snap"),
        F.first("last_change_snap").alias("last_change_snap"),
        F.sum(
            (F.col("snap_id") > F.col("last_change_snap")).cast("long")
        ).alias("unchanged_streak"),
    )
    # shiftleft with a COLUMN bit count needs the SQL form (the Python
    # wrapper only takes a literal int)
    interval = F.expr(
        f"{int(base_snaps)} * shiftleft(1, least(unchanged_streak,"
        f" {int(max_doublings)}))"
    )
    return g.select(
        "url", "last_snap", "last_change_snap",
        F.col("unchanged_streak").cast("long").alias("unchanged_streak"),
        interval.cast("long").alias("interval_snaps"),
        (F.col("last_snap") + interval).cast("long").alias("next_due_snap"),
    )


def due_for_refetch(state: DataFrame, current_snap: int) -> DataFrame:
    """The recrawl frontier at ``current_snap``: URLs whose adaptive
    interval has elapsed.  A pure filter over the state table — feed the
    result into the standard seed-union + anti-join intake."""
    return state.filter(F.col("next_due_snap") <= F.lit(current_snap)).select(
        "url", "next_due_snap"
    )
