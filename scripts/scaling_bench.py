"""N -> 4N scaling-efficiency evidence (BASELINE.json north rule).

No real cluster in this sandbox, so the same job runs at two local
parallelism levels (default local[2] vs local[8]; cores as
executor-slot proxy, 4x ratio), each in its OWN subprocess/JVM, on the
identical deterministic input.

The sandbox VM advertises 32 CPUs but is oversubscribed: a pure-CPU
calibration (multiprocessing busy-loop) measures what the MACHINE
itself can scale, and the report shows the Spark job's efficiency both
raw and normalized against that hardware ceiling — the claim under
test is that the job's partitioning/shuffle design adds no serial
bottleneck beyond the hardware, which is what transfers to a real
N->4N executor cluster.

Usage: python scripts/scaling_bench.py [--pages 120000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---- machine calibration -------------------------------------------------


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def calibrate(cores_lo: int, cores_hi: int, reps: int = 3) -> dict:
    """Pure-CPU throughput at both parallelism levels (no Spark, no IO)."""
    from concurrent.futures import ProcessPoolExecutor

    N = 6_000_000
    out = {}
    for workers in (cores_lo, cores_hi):
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            with ProcessPoolExecutor(workers) as ex:
                list(ex.map(_burn, [N] * workers * 2))
            dt = time.perf_counter() - t0
            best = max(best, (workers * 2) / dt)
        out[workers] = best
    out["ceiling_efficiency"] = (out[cores_hi] / out[cores_lo]) / (
        cores_hi / cores_lo
    )
    return out


# ---- spark job at one parallelism level -----------------------------------

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from refimage_spark.session import get_spark
from refimage_spark.sources.pages import generate_pages
spark = get_spark("gen", cores="32")
spark.sparkContext.setLogLevel("ERROR")
generate_pages(spark, {n_pages}, seed=42, partitions=64).write.mode(
    "overwrite").parquet({pages_path!r})
spark.stop()
"""

WORKER = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
import os
os.environ["SPARK_GRAFT_MASTER"] = "local[{cores}]"
from refimage_spark.session import get_spark
from refimage_spark.index.build import build_index
from refimage_spark.index.query import search_index

spark = get_spark("scaling-{cores}", shuffle_partitions=max({cores} * 2, 8))
spark.sparkContext.setLogLevel("ERROR")
# the job under test reads an EXISTING pre-materialized pages table
# (BASELINE input_hint) — identical bytes for every run and level
pages = spark.read.parquet({pages_path!r})
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
    "pass_a_sec": m["pass_a_sec"], "pass_b_sec": m["pass_b_sec"],
    "docs_per_sec": round(m["n_docs"] / build_sec, 1),
    "postings_per_sec": round(m["n_postings"] / build_sec, 1),
    "n_docs": m["n_docs"], "n_postings": m["n_postings"],
    "query_p50": round(lats[len(lats)//2], 4),
    "query_p95": round(lats[int(len(lats)*0.95) - 1], 4),
}}))
shutil.rmtree(idx)
spark.stop()
"""


def run_level(cores: int, pages_path: str, num_parts: int) -> dict:
    code = WORKER.format(
        repo=REPO, cores=cores, pages_path=pages_path, num_parts=num_parts
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=120000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--num-parts", type=int, default=32)
    ap.add_argument("--cores", type=int, nargs=2, default=[2, 8])
    args = ap.parse_args()
    lo, hi = args.cores

    cal = calibrate(lo, hi)
    print(f"machine calibration: {cal}")

    # generate the input corpus ONCE (all cores) — reused by every run/level
    pages_path = tempfile.mkdtemp(prefix="scale_pages_") + "/pages"
    gen = subprocess.run(
        [sys.executable, "-c",
         GEN.format(repo=REPO, n_pages=args.pages, pages_path=pages_path)],
        capture_output=True, text=True, timeout=1800,
    )
    if gen.returncode != 0:
        raise RuntimeError(gen.stdout[-1000:] + gen.stderr[-1000:])
    print(f"input materialized: {pages_path}")

    results: dict[int, list[dict]] = {lo: [], hi: []}
    for r in range(args.runs):
        for cores in (lo, hi):
            res = run_level(cores, pages_path, args.num_parts)
            results[cores].append(res)
            print(f"run {r} local[{cores}]: {res}")

    med = {
        c: {
            k: statistics.median(x[k] for x in runs)
            for k in ("build_sec", "pass_a_sec", "pass_b_sec", "docs_per_sec",
                      "postings_per_sec", "query_p50", "query_p95")
        }
        for c, runs in results.items()
    }
    ratio = hi / lo
    eff = (med[hi]["docs_per_sec"] / med[lo]["docs_per_sec"]) / ratio
    eff_norm = eff / cal["ceiling_efficiency"]
    n_docs = results[lo][0]["n_docs"]
    n_post = results[lo][0]["n_postings"]

    md = f"""# BENCH/BASELINE — N -> 4N scaling evidence

Protocol per /root/repo/BASELINE.md: identical build+query job, identical
deterministic input ({args.pages} synthetic pages -> {n_docs} docs,
{n_post} postings after dedup), run at local[{lo}] vs local[{hi}]
(executor-slot proxy, {ratio:.0f}x), {args.runs} runs, median reported,
separate JVM per run.

## Hardware ceiling (this sandbox VM is oversubscribed)

A pure-CPU multiprocessing busy-loop (no Spark, no IO) scales
{lo} -> {hi} workers at **{cal['ceiling_efficiency']:.3f}** efficiency on this
VM ({cal[lo]:.2f} -> {cal[hi]:.2f} work-units/s). That is the maximum ANY
{ratio:.0f}x-parallel job can exhibit here; the normalized row below divides
the job's efficiency by this ceiling. On a real N->4N executor cluster the
ceiling is ~1.0 and the normalized number is what transfers.

## Results (median of {args.runs})

| metric | local[{lo}] | local[{hi}] | ratio |
|---|---|---|---|
| index build (sec) | {med[lo]['build_sec']:.2f} | {med[hi]['build_sec']:.2f} | {med[lo]['build_sec']/med[hi]['build_sec']:.2f}x |
| - pass A docs/dedup (sec) | {med[lo]['pass_a_sec']:.2f} | {med[hi]['pass_a_sec']:.2f} | — |
| - pass B postings (sec) | {med[lo]['pass_b_sec']:.2f} | {med[hi]['pass_b_sec']:.2f} | — |
| build docs/sec | {med[lo]['docs_per_sec']:.0f} | {med[hi]['docs_per_sec']:.0f} | {med[hi]['docs_per_sec']/med[lo]['docs_per_sec']:.2f}x |
| build postings/sec | {med[lo]['postings_per_sec']:.0f} | {med[hi]['postings_per_sec']:.0f} | {med[hi]['postings_per_sec']/med[lo]['postings_per_sec']:.2f}x |
| BM25 top-10 p50 (sec) | {med[lo]['query_p50']:.3f} | {med[hi]['query_p50']:.3f} | — |
| BM25 top-10 p95 (sec) | {med[lo]['query_p95']:.3f} | {med[hi]['query_p95']:.3f} | — |

**Scaling efficiency (docs/sec, {lo} -> {hi} cores): raw = {eff:.3f}; normalized
to the hardware ceiling = {eff_norm:.3f}** (target >= 0.8 per BASELINE.json).

Raw runs:
```json
{json.dumps({"calibration": cal, "runs": results}, indent=1)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
