"""N -> 4N scaling-efficiency evidence (BASELINE.json north rule).

No real cluster in this sandbox, so the same job runs at two local
parallelism levels — local[8] vs local[32] (cores as executor-slot
proxy, 4x ratio) — each in its OWN subprocess/JVM, on the identical
deterministic input. Reports throughput at both, efficiency =
(T8/T32)/4, and writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--pages 60000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
import os
os.environ["SPARK_GRAFT_MASTER"] = "local[{cores}]"
from refimage_spark.session import get_spark
from refimage_spark.sources.pages import generate_pages
from refimage_spark.index.build import build_index
from refimage_spark.index.query import search_index

spark = get_spark("scaling-{cores}", shuffle_partitions={cores} * 2)
spark.sparkContext.setLogLevel("ERROR")
# materialize the input table first — the job under test reads an
# EXISTING pages table (BASELINE input_hint), not a generator
pages_path = tempfile.mkdtemp(prefix="scale_pages_") + "/pages"
generate_pages(spark, {n_pages}, seed=42, partitions={cores}).write.parquet(pages_path)
pages = spark.read.parquet(pages_path)
idx = tempfile.mkdtemp(prefix="scale_idx_")
t0 = time.perf_counter()
m = build_index(spark, pages, idx, num_parts={num_parts})
build_sec = time.perf_counter() - t0
queries = ["red car", "beach sunset NOT person", "red car OR blue house",
           "luxury car^0.8", "car", "fast car #en"]
search_index(spark, idx, queries[0], k=10).collect()  # warm
lats = []
for q in queries * 2:
    t0 = time.perf_counter()
    search_index(spark, idx, q, k=10).collect()
    lats.append(time.perf_counter() - t0)
lats.sort()
print("RESULT " + json.dumps({{
    "cores": {cores}, "build_sec": round(build_sec, 3),
    "docs_per_sec": round(m["n_docs"] / build_sec, 1),
    "postings_per_sec": round(m["n_postings"] / build_sec, 1),
    "n_docs": m["n_docs"], "n_postings": m["n_postings"],
    "query_p50": round(lats[len(lats)//2], 4),
    "query_p95": round(lats[int(len(lats)*0.95) - 1], 4),
}}))
shutil.rmtree(idx)
spark.stop()
"""


def run_level(cores: int, n_pages: int, num_parts: int) -> dict:
    code = WORKER.format(
        repo=REPO, cores=cores, n_pages=n_pages, num_parts=num_parts
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--num-parts", type=int, default=32)
    args = ap.parse_args()

    results: dict[int, list[dict]] = {8: [], 32: []}
    for r in range(args.runs):
        for cores in (8, 32):
            res = run_level(cores, args.pages, args.num_parts)
            results[cores].append(res)
            print(f"run {r} local[{cores}]: {res}")

    med = {
        c: {
            k: statistics.median(x[k] for x in runs)
            for k in ("build_sec", "docs_per_sec", "postings_per_sec",
                      "query_p50", "query_p95")
        }
        for c, runs in results.items()
    }
    eff = (med[32]["docs_per_sec"] / med[8]["docs_per_sec"]) / 4.0
    n_docs = results[8][0]["n_docs"]
    n_post = results[8][0]["n_postings"]

    md = f"""# BENCH/BASELINE — N -> 4N scaling evidence

Protocol per /root/repo/BASELINE.md: identical build+query job, identical
deterministic input ({args.pages} synthetic pages -> {n_docs} docs,
{n_post} postings after dedup), run at local[8] vs local[32]
(executor-slot proxy, 4x), {args.runs} runs, median reported. Separate
JVM per run.

| metric | local[8] | local[32] | ratio |
|---|---|---|---|
| index build (sec) | {med[8]['build_sec']:.2f} | {med[32]['build_sec']:.2f} | {med[8]['build_sec']/med[32]['build_sec']:.2f}x |
| build docs/sec | {med[8]['docs_per_sec']:.0f} | {med[32]['docs_per_sec']:.0f} | {med[32]['docs_per_sec']/med[8]['docs_per_sec']:.2f}x |
| build postings/sec | {med[8]['postings_per_sec']:.0f} | {med[32]['postings_per_sec']:.0f} | {med[32]['postings_per_sec']/med[8]['postings_per_sec']:.2f}x |
| BM25 top-10 p50 (sec) | {med[8]['query_p50']:.3f} | {med[32]['query_p50']:.3f} | — |
| BM25 top-10 p95 (sec) | {med[8]['query_p95']:.3f} | {med[32]['query_p95']:.3f} | — |

**Scaling efficiency (docs/sec, 8 -> 32 cores) = {eff:.3f}**
(target >= 0.8 per BASELINE.json; 1.0 = perfect linear scaling)

Raw runs:
```json
{json.dumps(results, indent=1)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
