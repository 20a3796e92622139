"""spark-submit entrypoint: query an index.

Usage:
  spark-submit --py-files refimage_spark.zip scripts/query_cli.py \
      --index-dir /path/to/index --query "red car OR blue house" [-k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refimage_spark.index.query import search_index
from refimage_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", required=True, action="append")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--threshold", type=float, default=0.0)
    args = ap.parse_args()
    spark = get_spark("refimage-query")
    spark.sparkContext.setLogLevel("WARN")
    for q in args.query:
        t0 = time.perf_counter()
        rows = search_index(
            spark, args.index_dir, q, k=args.k, threshold=args.threshold
        ).collect()
        print(
            json.dumps(
                {
                    "query": q,
                    "sec": round(time.perf_counter() - t0, 4),
                    "hits": [
                        {"doc_id": r.doc_id, "score": round(r.score, 6)}
                        for r in rows
                    ],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
