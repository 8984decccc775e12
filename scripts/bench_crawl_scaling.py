"""Full-crawl-machinery scaling evidence (north rule: pages/sec scaling
efficiency >= 0.8 from N to 4N executors).

BENCH/BASELINE.md's emulation rows cover the frontier-dedup job and the
fused fetch+parse stage; this script runs the ENTIRE per-batch machinery —
politeness schedule → fused fetch+parse+clean → link canonicalize + skip
filter → Bloom/exact dedup → docs filter tail → metrics → atomic snapshot
commit (benchlib.bench_crawl_batch, one wide politeness-free batch) — as W
independent executor-shaped JVMs (local[4], 8g), each over its own
warehouse and an identically-sized shard of synthetic web (how a cluster
splits a many-host frontier), barrier-started, at W=1 and W=4.

Single-JVM local[N] vs local[4N] under-reports Python-stage scaling
(Arrow transfer serializes per JVM — measured in BENCH/BASELINE.md), so
executor emulation is the faithful N → 4N model.

Usage: python scripts/bench_crawl_scaling.py [scale_per_worker]
"""

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from crawlspark.session import get_spark
from crawlspark import benchlib

cores = int(sys.argv[1]); widx = int(sys.argv[2]); scale = float(sys.argv[3])
ready_dir = sys.argv[4]
spark = get_spark(f"crawlscale{widx}", master=f"local[{cores}]",
                  shuffle_partitions=cores * 2,
                  extra_conf={"spark.driver.memory": "8g"})
benchlib.bench_fetch_parse(spark, n_pages=2000)  # warm JVM + python pool
open(os.path.join(ready_dir, f"ready-{widx}"), "w").close()
while not os.path.exists(os.path.join(ready_dir, "go")):
    time.sleep(0.05)
wh = tempfile.mkdtemp(prefix=f"crawlscale{widx}-")
try:
    r = benchlib.bench_crawl_batch(spark, wh, scale=scale)
finally:
    shutil.rmtree(wh, ignore_errors=True)
print("RESULT " + json.dumps({"widx": widx, "sec": r["sec"],
                              "n_fetched": r["n_fetched"], "n_docs": r["n_docs"]}))
spark.stop()
"""


def run_emulation(n_workers: int, scale: float, cores_each: int = 2) -> dict:
    ready_dir = tempfile.mkdtemp(prefix="crawlscale-rdy-")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": str(REPO)},
             str(cores_each), str(i), str(scale), ready_dir],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=dict(os.environ, SPARK_GRAFT_CPUS=str(cores_each)),
        )
        for i in range(n_workers)
    ]
    deadline = time.time() + 900
    while time.time() < deadline:
        if sum(os.path.exists(os.path.join(ready_dir, f"ready-{i}"))
               for i in range(n_workers)) == n_workers:
            break
        time.sleep(0.2)
    open(os.path.join(ready_dir, "go"), "w").close()
    res = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        for line in out.splitlines():
            if line.startswith("RESULT "):
                res.append(json.loads(line[len("RESULT "):]))
    assert len(res) == n_workers, f"workers failed: {len(res)}/{n_workers}"
    wall = max(r["sec"] for r in res)
    pages = sum(r["n_fetched"] for r in res)
    return {"workers": n_workers, "wall_sec": wall, "pages": pages,
            "pages_per_sec": pages / wall}


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    e1 = min((run_emulation(1, scale) for _ in range(2)),
             key=lambda r: r["wall_sec"])
    e4 = min((run_emulation(4, scale) for _ in range(2)),
             key=lambda r: r["wall_sec"])
    eff = e4["pages_per_sec"] / e1["pages_per_sec"] / 4
    print(json.dumps({
        "workload": "full crawl batch machinery (schedule->fetch->parse->dedup->docs->commit)",
        "scale_per_worker": scale,
        "w1": {k: round(v, 3) if isinstance(v, float) else v for k, v in e1.items()},
        "w4": {k: round(v, 3) if isinstance(v, float) else v for k, v in e4.items()},
        "efficiency_1_to_4": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
