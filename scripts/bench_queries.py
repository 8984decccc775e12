"""Per-query noop-sink isolation bench (guide §1.4): times each sample-pack
query alone, prints per-run seconds, and optionally dumps
.explain('formatted') to plans/r06/.  Does NOT replace bench.py (frozen);
cite these numbers in OPTIMIZATION_r06.md.

Usage: python scripts/bench_queries.py [sf_dir] [repeats] [query ...]
       PLANS_OUT=plans/r06 SUFFIX=_before python scripts/bench_queries.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from crawlspark.queries import SPARK_QUERIES  # noqa: E402
from crawlspark.session import get_spark  # noqa: E402

DEFAULT = [
    "tpch_pricing_summary", "revenue_by_nation", "dedup_minhash_lsh",
    "embed_cosine_topk", "events_sessionize", "url_skip_filter",
    "paragraph_boilerplate", "ann_ivf_topk",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or DEFAULT
    plans_out = os.environ.get("PLANS_OUT")
    suffix = os.environ.get("SUFFIX", "_before")
    spark = get_spark("bench-queries")
    # warmup: JVM codegen + python worker pool
    SPARK_QUERIES["url_skip_filter"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        if plans_out:
            p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            Path(plans_out).mkdir(parents=True, exist_ok=True)
            (Path(plans_out) / f"{name}{suffix}.txt").write_text(p)
        runs = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench {name}")
            t0 = time.time()
            SPARK_QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        print(name, runs, "min", min(runs), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "runs": out, "load": os.getloadavg()[0]}))
    spark.stop()


if __name__ == "__main__":
    main()
