"""Adaptive recrawl policy (operators/freshness.py): streak derivation,
exponential backoff with cap, reset-on-change, and the due frontier."""

from crawlspark.operators.freshness import due_for_refetch, freshness_state


def _state(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "url string, snap_id long, body_hash string"
    )
    return {r["url"]: r for r in freshness_state(df, **kw).collect()}


def test_streaks_intervals_and_caps(spark):
    rows = [
        # u_hot: changes every fetch -> streak 0, base interval
        ("u_hot", 1, "a"), ("u_hot", 2, "b"), ("u_hot", 3, "c"),
        # u_cold: never changes after first fetch -> streak 4, capped at 3
        ("u_cold", 1, "x"), ("u_cold", 2, "x"), ("u_cold", 3, "x"),
        ("u_cold", 4, "x"), ("u_cold", 5, "x"),
        # u_reset: long unchanged run, then a change -> streak back to 0
        ("u_reset", 1, "p"), ("u_reset", 2, "p"), ("u_reset", 3, "p"),
        ("u_reset", 4, "q"),
        # u_once: single fetch -> change by definition, streak 0
        ("u_once", 7, "z"),
    ]
    st = _state(spark, rows, base_snaps=2, max_doublings=3)

    assert st["u_hot"]["unchanged_streak"] == 0
    assert st["u_hot"]["last_change_snap"] == 3
    assert st["u_hot"]["interval_snaps"] == 2          # base * 2^0
    assert st["u_hot"]["next_due_snap"] == 5

    assert st["u_cold"]["unchanged_streak"] == 4
    assert st["u_cold"]["interval_snaps"] == 16        # base * 2^min(4,3)
    assert st["u_cold"]["next_due_snap"] == 21

    assert st["u_reset"]["unchanged_streak"] == 0
    assert st["u_reset"]["last_change_snap"] == 4
    assert st["u_reset"]["next_due_snap"] == 6

    assert st["u_once"]["unchanged_streak"] == 0
    assert st["u_once"]["last_snap"] == 7
    assert st["u_once"]["next_due_snap"] == 9


def test_due_frontier_filter(spark):
    rows = [
        ("u1", 1, "a"), ("u1", 2, "a"),            # next_due 2 + 2*2 = 6
        ("u2", 1, "a"), ("u2", 2, "b"),            # next_due 2 + 2 = 4
    ]
    df = spark.createDataFrame(
        rows, "url string, snap_id long, body_hash string"
    )
    st = freshness_state(df, base_snaps=2, max_doublings=3)
    assert {r["url"] for r in due_for_refetch(st, 4).collect()} == {"u2"}
    assert {r["url"] for r in due_for_refetch(st, 6).collect()} == {"u1", "u2"}


def test_snap_gaps_do_not_inflate_streak(spark):
    """The streak counts FETCHES since the last change, not snapshots —
    sparse snap ids (fetches skip epochs under the adaptive policy) must
    not over-back-off."""
    rows = [("u", 1, "a"), ("u", 5, "a"), ("u", 9, "a")]
    st = _state(spark, rows, base_snaps=2, max_doublings=5)
    assert st["u"]["unchanged_streak"] == 2
    assert st["u"]["interval_snaps"] == 8              # 2 * 2^2
    assert st["u"]["next_due_snap"] == 17
