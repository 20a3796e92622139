"""spark-submit-free admin entrypoint: verify index integrity.

Usage:
  python scripts/fsck_cli.py --index-dir /path/to/index [--fast]

Exit code 0 = every manifest claim verified; 1 = problems found
(listed on stdout as JSON). Pure file reads — no Spark session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refimage_spark.index.admin import fsck_index


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument(
        "--fast", action="store_true",
        help="skip full-file checksums (size/structure checks only)",
    )
    args = ap.parse_args()
    out = fsck_index(args.index_dir, deep=not args.fast)
    print(json.dumps(out, indent=1))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
