"""spark-submit entrypoint: build (or resume) an index.

Usage:
  spark-submit --py-files refimage_spark.zip scripts/build_index_cli.py \
      --pages /path/to/pages_parquet --index-dir /path/to/index \
      [--num-parts 256] [--synthetic N]

Packaging: `make zip` (or `zip -r refimage_spark.zip refimage_spark`)
produces the --py-files artifact; nothing else is needed on executors
(numpy/pyarrow ship with the cluster's python env).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refimage_spark.index.build import build_index
from refimage_spark.session import get_spark
from refimage_spark.sources.pages import generate_pages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="parquet path of the pages table")
    ap.add_argument("--synthetic", type=int, help="generate N synthetic pages")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--num-parts", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    spark = get_spark("refimage-build")
    spark.sparkContext.setLogLevel("WARN")
    if args.synthetic:
        pages = generate_pages(spark, args.synthetic, seed=args.seed)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        ap.error("one of --pages / --synthetic required")
    metrics = build_index(spark, pages, args.index_dir, num_parts=args.num_parts)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
