"""Offline index integrity check (fsck).

Segments carry a sha256 of their posting blob in the manifest
(index/segment.py SegmentStats.checksum) — written at every commit,
but nothing re-verified it until now. At 10^12 docs an index lives for
months on shared storage; bit-rot, torn copies and partial restores are
operational realities, and an fsck that can certify "every byte this
manifest claims is present and intact" is what lets a maintenance
window end with confidence. The reference has no equivalent (its whole
index is one opaque pickle+binary, /root/reference/src/refimage/search/
__init__.py:322-396 — corruption there surfaces as a crash at load).

Checks (per segment, plus cross-segment invariants):
- stats.json / manifest rows parse and carry the supported
  format_version;
- the three segment files exist; the posting file's size matches the
  manifest's ``bytes``;
- deep mode: sha256 of the posting file equals the manifest checksum;
- the docs sidecar loads, its doc_ids are strictly sorted (the binary-
  search/dense-lookup precondition) with non-negative dl;
- the dictionary's posting counts sum to the manifest's n_postings;
- across segments: doc ids are disjoint, and their total equals
  stats.json's n_docs (every maintenance op preserves this — append
  and compact both recompute stats from the docs table the segments
  mirror).

Pure reads — safe to run concurrently with serving; take the
maintenance lock only if you need a quiescent point-in-time view.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow.parquet as pq

from refimage_spark.index.segment import (
    FORMAT_VERSION,
    read_manifest,
    seg_paths,
)


def fsck_index(index_dir: str, deep: bool = True) -> dict:
    """Returns {"ok": bool, "errors": [...], "segments": n, "n_docs": n}.
    ``deep=False`` skips the full-file sha256 (size checks only) for a
    fast sweep over very large indexes."""
    errors: list[str] = []

    def err(msg: str) -> None:
        errors.append(msg)

    stats = None
    try:
        stats = json.load(open(os.path.join(index_dir, "stats.json")))
        if stats.get("format_version") != FORMAT_VERSION:
            err(
                f"stats.json format_version {stats.get('format_version')} "
                f"!= supported {FORMAT_VERSION}"
            )
    except (OSError, ValueError) as e:
        err(f"stats.json unreadable: {e}")

    try:
        rows = read_manifest(index_dir)
    except Exception as e:  # noqa: BLE001 — fsck must report, not die
        return {
            "ok": False,
            "errors": errors + [f"manifest unreadable: {e}"],
            "segments": 0,
            "n_docs": 0,
        }

    total_docs = 0
    all_ids: list[np.ndarray] = []
    for r in rows:
        pid = r["partition_id"]
        tag = f"seg-{pid:05d}"
        post_p, dict_p, docs_p = seg_paths(index_dir, pid)
        missing = [p for p in (post_p, dict_p, docs_p) if not os.path.exists(p)]
        if missing:
            err(f"{tag}: missing files {sorted(os.path.basename(m) for m in missing)}")
            continue
        size = os.path.getsize(post_p)
        if size != r["bytes"]:
            err(f"{tag}: posting file is {size} bytes, manifest says {r['bytes']}")
            continue
        if deep:
            h = hashlib.sha256()
            with open(post_p, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            if h.hexdigest() != r["checksum"]:
                err(f"{tag}: posting checksum mismatch (bit rot or torn copy)")
                continue
        try:
            d = pq.read_table(docs_p)
            ids = d["doc_id"].to_numpy()
            dls = d["dl"].to_numpy()
        except Exception as e:  # noqa: BLE001
            err(f"{tag}: docs sidecar unreadable: {e}")
            continue
        if ids.size != r["n_docs"]:
            err(f"{tag}: sidecar has {ids.size} docs, manifest says {r['n_docs']}")
        if ids.size > 1 and not np.all(np.diff(ids) > 0):
            err(f"{tag}: doc_ids not strictly sorted (lookup precondition)")
        if dls.size and int(dls.min()) < 0:
            err(f"{tag}: negative dl")
        try:
            t = pq.read_table(dict_p, columns=["n"])
            n_post = int(t["n"].to_numpy().sum()) if t.num_rows else 0
            if n_post != r["n_postings"]:
                err(
                    f"{tag}: dictionary posting counts sum to {n_post}, "
                    f"manifest says {r['n_postings']}"
                )
        except Exception as e:  # noqa: BLE001
            err(f"{tag}: dictionary unreadable: {e}")
        total_docs += int(ids.size)
        all_ids.append(ids)

    if all_ids:
        union = np.concatenate(all_ids)
        if np.unique(union).size != union.size:
            err("doc ids are not disjoint across segments (double-serve)")
    # the segments-vs-stats doc-count check runs UNCONDITIONALLY when
    # stats parsed: an empty manifest against a stats.json claiming
    # documents is the signature of a lost/partial restore and must fail
    # (an earlier gate of `total_docs and not errors` certified total
    # segment loss as ok and let any per-segment error mask this check)
    if stats is not None and stats.get("n_docs") is not None:
        if total_docs != stats["n_docs"]:
            err(
                f"segments hold {total_docs} docs, stats.json says "
                f"{stats['n_docs']}"
            )
    return {
        "ok": not errors,
        "errors": errors,
        "segments": len(rows),
        "n_docs": total_docs,
    }
