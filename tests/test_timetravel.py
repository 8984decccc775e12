"""Time-travel: snapshot listing, manifest_at reads, and rollback-resume.

The snapshot catalog retains every manifest until expire_snapshots; a
rollback mints a NEW manifest referencing an old snapshot's exact file
set, so `run_crawl(resume_from_snapshot=S)` replays the crawl from the
state committed at S — and, because the engine is deterministic, lands
on the same final state as the straight run it abandoned (the
operational 'bad rule shipped at batch k: rewind and re-run' lever)."""

from crawlspark import synthetic
from crawlspark.crawl import CrawlConfig, run_crawl
from crawlspark.tables import SnapshotCatalog

SCALE = 0.05
BUDGET = 12


def _cfg(wh, max_batches):
    return CrawlConfig(warehouse=wh, spec=synthetic.WebSpec(scale=SCALE),
                       max_batches=max_batches, budget_override=BUDGET)


def _final_state(spark, wh):
    cat = SnapshotCatalog(spark, wh)
    m = cat.latest()
    seen = {r["url"] for r in cat.read("urlseen", m).collect()}
    prog = {(r["url"], r["batch_id"], r["attempt"], r["outcome"])
            for r in cat.read("progress", m).collect()}
    docs = {r["doc_id"] for r in cat.read("documents", m).collect()}
    return seen, prog, docs


def test_rollback_resume_equals_straight_run(spark, tmp_path):
    wh = str(tmp_path / "wh_tt")
    run_crawl(spark, _cfg(wh, max_batches=6))
    cat = SnapshotCatalog(spark, wh)
    straight = _final_state(spark, wh)
    snaps = cat.snapshots()
    assert snaps == sorted(snaps) and len(snaps) >= 4

    # pick the snapshot committed at batch 3 and time-travel-read it:
    # strictly less state than the final snapshot
    mid = next(s for s in snaps if cat.manifest_at(s)["batch_id"] == 3)
    mid_seen = {r["url"] for r in
                cat.read("urlseen", cat.manifest_at(mid)).collect()}
    assert mid_seen < straight[0]

    # rollback + resume: the replay of batches 4.. must land on exactly
    # the straight run's final seen set, per-batch crawl order, and docs
    out = run_crawl(spark, _cfg(wh, max_batches=6), resume=True,
                    resume_from_snapshot=mid)
    assert out["batches"] == 6
    assert _final_state(spark, wh) == straight

    # the rollback minted a FRESH id (append-only history: the abandoned
    # snapshots still exist, nothing was overwritten) and recorded its
    # provenance
    snaps2 = cat.snapshots()
    assert set(snaps) < set(snaps2)
    rb = next(s for s in snaps2 if
              (cat.manifest_at(s).get("lineage") or {}).get("rollback_of"))
    assert cat.manifest_at(rb)["lineage"]["rollback_of"] == mid
    assert cat.manifest_at(rb)["tables"] == cat.manifest_at(mid)["tables"]


def test_rollback_to_missing_snapshot_raises(spark, tmp_path):
    import pytest

    wh = str(tmp_path / "wh_tt2")
    run_crawl(spark, _cfg(wh, max_batches=2))
    cat = SnapshotCatalog(spark, wh)
    with pytest.raises(FileNotFoundError):
        cat.rollback(999)


def test_expire_keeps_rollback_referenced_files(spark, tmp_path):
    """After a rollback, expire_snapshots must keep every file the
    rollback manifest references even when the ORIGINAL manifest that
    introduced them is expired — reference-counted GC, not age-based
    file deletion."""
    wh = str(tmp_path / "wh_tt3")
    run_crawl(spark, _cfg(wh, max_batches=4))
    cat = SnapshotCatalog(spark, wh)
    mid = next(s for s in cat.snapshots()
               if cat.manifest_at(s)["batch_id"] == 2)
    mid_state = {r["url"] for r in
                 cat.read("urlseen", cat.manifest_at(mid)).collect()}
    cat.rollback(mid)
    cat.expire_snapshots(keep_last=1)  # drops everything but the rollback
    assert cat.snapshots() == [cat.latest()["snapshot_id"]]
    # the old files the rollback references survived the GC and still read
    assert {r["url"] for r in
            cat.read("urlseen", cat.latest()).collect()} == mid_state
