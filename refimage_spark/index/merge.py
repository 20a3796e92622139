"""Log-structured maintenance: incremental append, tombstone delete,
segment merge/compaction, size-tiered merge policy.

The reference handles deletes by REBUILDING the whole index
(/root/reference/src/refimage/search/__init__.py:268-320, O(N) per
delete) and growth by in-memory append with a monolithic save. Here:

- ``append_pages``  : new docs become NEW segments (ids continue after
  the current max); global stats/df are updated — O(new docs), the
  existing segments are untouched (log-structured append).
- ``delete_docs``   : tombstone rows only; queries mask them (O(1)).
- ``compact``       : physically drops tombstoned docs and merges each
  segment in place, distributed one task per segment; the manifest is
  swapped atomically at the end. Posting arrays of disjoint doc sets
  merge by sorted interleave — exactness is preserved because scores
  depend only on (tf, dl, global stats).
- ``merge_segments``: combine small segments into one. The COMMIT POINT
  is the merged row's atomic manifest write: it carries ``merged_from``
  and ``read_manifest`` drops superseded rows, so a crash between the
  commit and the source-file cleanup never double-serves a doc.
- ``plan_merges``/``run_merge_policy``: size-tiered policy — streaming
  appends create many small segments; once a size tier accumulates
  ``min_merge`` of them they merge into the next tier (cascading), so
  segment count stays O(log corpus) under continuous ingest.

Scale notes: compaction and policy merges run as Spark jobs with one
task per OUTPUT segment (embarrassingly parallel — doc-partitioned
segments never interact). Posting rebuild is 3 vectorized passes over
the whole segment (``SegmentReader.read_all_postings``) and the writer
consumes pre-aggregated (term, doc, tf) rows — no per-term Python loop,
no np.repeat re-expansion of tf runs.
"""

from __future__ import annotations

import contextlib
import glob as _glob
import json
import os
import shutil
import socket
import threading
import time
import uuid
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from refimage_spark.index.build import STATS_FILE, prepare_docs
from refimage_spark.index.segment import (
    SegmentReader,
    SegmentWriter,
    read_manifest,
    seg_paths,
    write_manifest_row,
)

TOMBSTONES = "tombstones.parquet"
MAINT_LOCK = ".maintenance.lock"
# 120s, not 30: NFS client attribute caching (acregmax, commonly up to
# 60s) can serve a remote contender an mtime up to a minute stale even
# while the holder heartbeats — a 30s lease let a LIVE lock be judged
# stale and stolen (ADVICE r5). The lease must sit comfortably above
# the attr-cache bound; _owner_alive additionally fstat()s an open fd,
# which forces revalidation on NFS close-to-open-consistent mounts.
LOCK_LEASE_SEC = 120.0


def _lock_owner(path: str) -> dict | None:
    """Owner record {host, pid, acquired} or None if unreadable (the
    file vanished mid-read, or predates the lease format)."""
    try:
        with open(path) as f:
            rec = json.load(f)
        return rec if isinstance(rec, dict) else None
    except (OSError, ValueError):
        return None


def _owner_alive(owner: dict | None, path: str, lease_sec: float) -> bool:
    """Liveness judged safely for SHARED STORAGE:

    - same host + DEAD pid: authoritative — steal immediately, no lease
      wait (the common crashed-holder case);
    - everything else — same-host pid that exists (which may be an
      UNRELATED process after pid recycling, e.g. post-reboot), a
      foreign-uid pid, a remote host, an unreadable record — defers to
      LEASE EXPIRY: a real holder's heartbeat keeps the mtime fresh; a
      recycled pid does not, so the lease ages out and the lock is
      stealable. (An earlier form returned 'alive' on any existing
      same-host pid, which made a crashed holder's lock permanently
      unstealable whenever its pid got recycled.)"""
    if owner is not None and owner.get("host") == socket.gethostname():
        pid = int(owner.get("pid", 0) or 0)
        if pid > 0:
            try:
                os.kill(pid, 0)  # 0 = existence probe, no signal sent
            except ProcessLookupError:
                return False  # owner died mid-maintenance
            except PermissionError:
                pass  # exists under another uid: lease decides below
    try:
        # fstat an OPEN fd, not os.path.getmtime: opening the file forces
        # NFS attribute revalidation (close-to-open consistency), so a
        # live holder's heartbeat mtime is never judged through a stale
        # client attribute cache (ADVICE r5)
        with open(path, "rb") as f:
            mtime = os.fstat(f.fileno()).st_mtime
        return (time.time() - mtime) < lease_sec
    except OSError:
        return False  # vanished under us: nobody holds it


@contextlib.contextmanager
def maintenance_lock(
    index_dir: str,
    lease_sec: float = LOCK_LEASE_SEC,
    blocking: bool = False,
    timeout: float = 600.0,
):
    """SINGLE-MAINTENANCE-WRITER guard shared by delete_docs / compact /
    merge / update_doc_tags / append. Readers are always safe (atomic
    renames + mtime-keyed caches), but maintenance ops are not
    transactional with respect to EACH OTHER: a compact's sidecar
    rewrite racing a tag update's would silently drop one of them.

    LEASE PROTOCOL (correct on shared storage across hosts):
    - ACQUIRE is one atomic ``os.link(tmp, lock)`` with the owner record
      {host, pid, acquired} already written to ``tmp`` — exactly one
      contender's link succeeds, and no contender ever observes an
      empty/partial lock file (the O_EXCL-create-then-write scheme had
      that window).
    - While held, a daemon heartbeat touches the lock every lease/3; the
      mtime IS the lease. A long compaction never looks stale.
    - STALENESS: a same-host owner whose pid is DEAD is stolen
      immediately; everything else (existing pid — possibly recycled —,
      foreign uid, remote host) waits for lease expiry.
    - RELEASE and heartbeat verify the lock still carries OUR owner
      record first: a holder that lost its lease to a legitimate stealer
      must not touch the stealer's lock.
    - STEAL renames the stale lock to a unique name FIRST — only one
      renamer wins (the losers get FileNotFoundError and re-race the
      link), so two contenders can never both "remove then create".

    ``blocking=False`` (default) raises RuntimeError on live contention
    — a serving-tier caller should retry, not block behind a long
    compaction. ``blocking=True`` retries with backoff up to ``timeout``
    seconds (streaming ingest uses this: a micro-batch append must wait
    out a concurrent merge, not kill the stream).

    Each judge/steal/link attempt runs under a same-host ``flock`` guard
    (``.maintenance.guard``) — two local contenders can therefore never
    interleave "judge stale → rename" against each other's fresh lock.
    Cross-host stealers can't share the flock; they are protected by the
    INODE CHECK below: a rename that turns out to have grabbed a
    different inode than the one judged stale is undone. The residual
    window (three hosts steal-colliding within the same few µs after a
    ≥lease_sec expiry, defeating the restore) is accepted: maintenance
    ops are themselves crash-safe and idempotent (supersession commits),
    so a duplicated writer degrades to wasted work, not corruption — an
    Iceberg/catalog conditional commit would close even that."""
    import fcntl

    path = os.path.join(index_dir, MAINT_LOCK)
    guard_path = f"{path}.guard"
    me = {
        "host": socket.gethostname(),
        "pid": os.getpid(),
        "acquired": time.time(),
    }
    tmp = f"{path}.acq-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(me, f)
        f.flush()
        os.fsync(f.fileno())
    deadline = time.monotonic() + timeout
    backoff = 0.05

    def attempt_once() -> bool:
        """One guarded judge/steal/link attempt. True = lock acquired;
        False = retry; raises on live contention (non-blocking mode
        decides what to do with it above)."""
        # freshen the owner file's mtime BEFORE linking: link() shares
        # the tmp inode, so after a long blocking wait the new lock
        # would otherwise be born with an already-expired lease and be
        # instantly stealable until the first heartbeat (review finding)
        os.utime(tmp)
        try:
            os.link(tmp, path)  # atomic acquire, owner info in place
            return True
        except FileExistsError:
            pass
        try:
            judged_ino = os.stat(path).st_ino
        except FileNotFoundError:
            return False  # released under us: re-race the link
        owner = _lock_owner(path)
        if _owner_alive(owner, path, lease_sec):
            raise RuntimeError(
                f"index maintenance already running ({owner}, "
                f"{path}); retry after it finishes"
            )
        stale = f"{path}.stale-{uuid.uuid4().hex}"
        try:
            os.rename(path, stale)  # exactly one stealer wins
        except FileNotFoundError:
            return False  # released or stolen under us: re-race
        if os.stat(stale).st_ino != judged_ino:
            # a cross-host contender replaced the stale lock between our
            # judgment and our rename — we just grabbed a FRESH lock.
            # Put the exact inode back (link restores it at the path);
            # if a third party linked meanwhile, drop our copy and
            # re-race — their lock stands.
            with contextlib.suppress(FileExistsError):
                os.link(stale, path)
        with contextlib.suppress(FileNotFoundError):
            os.remove(stale)
        return False

    guard = open(guard_path, "a")  # held open for the lock's lifetime
    try:
        try:
            while True:
                fcntl.flock(guard, fcntl.LOCK_EX)
                try:
                    if attempt_once():
                        break
                except RuntimeError:
                    if not (blocking and time.monotonic() < deadline):
                        raise
                finally:
                    fcntl.flock(guard, fcntl.LOCK_UN)
                time.sleep(backoff)
                backoff = min(backoff * 2, 2.0)
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.remove(tmp)  # the lock path keeps the inode alive
    except BaseException:
        guard.close()
        raise
    stop = threading.Event()

    def _still_mine() -> bool:
        """Ownership = the lock file still carries OUR owner record
        (host + pid + acquire timestamp — never collides). If our lease
        expired (VM pause, NFS hang) and another contender legitimately
        stole the lock, we must neither refresh nor remove THEIR lock —
        heartbeat and release both check first. (An earlier form removed
        unconditionally, which let a resumed stale holder delete the
        stealer's live lock and re-open the two-writer race; an
        inode-only check was defeated by filesystem inode recycling.)"""
        return _lock_owner(path) == me

    def _heartbeat() -> None:
        # the check+touch runs under the same flock GUARD the judge/steal
        # attempts take, so it can never interleave with a same-host
        # contender's rename of our (stale-judged) lock. Same-OFD flock
        # from our own threads is reentrant-by-sharing — benign, since
        # our threads only ever touch OUR OWN lock.
        while not stop.wait(lease_sec / 3.0):
            fcntl.flock(guard, fcntl.LOCK_EX)
            try:
                if _still_mine():
                    with contextlib.suppress(OSError):
                        os.utime(path)
            finally:
                fcntl.flock(guard, fcntl.LOCK_UN)

    beat = threading.Thread(
        target=_heartbeat, name="maint-lock-heartbeat", daemon=True
    )
    beat.start()
    try:
        yield
    finally:
        stop.set()
        beat.join(timeout=2.0)
        fcntl.flock(guard, fcntl.LOCK_EX)
        try:
            owner = _lock_owner(path)
            if owner is None and os.path.exists(path):
                # transient read failure (NFS hiccup) must not strand our
                # own lock until lease expiry — retry before deciding
                for _ in range(3):
                    time.sleep(0.02)
                    owner = _lock_owner(path)
                    if owner is not None:
                        break
            if owner == me or (owner is None and os.path.exists(path)):
                # ours, or unreadable-after-retries: a stealer's lock is
                # always complete (linked with content in place), so an
                # unreadable file is a corrupt leftover — remove either way
                with contextlib.suppress(FileNotFoundError):
                    os.remove(path)
        finally:
            fcntl.flock(guard, fcntl.LOCK_UN)
            guard.close()


def delete_docs(index_dir: str, doc_ids: list[int]) -> None:
    """Tombstone-only delete; takes effect at query time immediately.
    Takes the maintenance lock: the tombstone read-merge-write must not
    race another delete or compact's final tombstone swap."""
    with maintenance_lock(index_dir):
        path = os.path.join(index_dir, TOMBSTONES)
        old = (
            pq.read_table(path)["doc_id"].to_numpy()
            if os.path.exists(path)
            else np.empty(0, np.int64)
        )
        merged = np.unique(
            np.concatenate([old, np.asarray(doc_ids, np.int64)])
        )
        pq.write_table(pa.table({"doc_id": merged}), path + ".tmp")
        os.replace(path + ".tmp", path)


def _recompute_global_stats(spark: SparkSession, index_dir: str) -> None:
    """N/avgdl from the docs table; df by re-aggregating segment dicts.
    Must run AFTER segments reflect the new corpus."""
    from refimage_spark.index.build import write_term_stats

    docs = spark.read.parquet(os.path.join(index_dir, "docs.parquet"))
    st = docs.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")).head()
    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    stats.update({"n_docs": st["n"], "avgdl": float(st["avgdl"])})
    tmp = os.path.join(index_dir, STATS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(index_dir, STATS_FILE))
    write_term_stats(spark, index_dir)


def _rewrite_segment_filtered(
    src_dir: str,
    dst_dir: str,
    pid: int,
    drop_ids: np.ndarray,
    avgdl: float,
    new_pid: int | None = None,
) -> "SegmentWriter":
    """Rewrite one segment without ``drop_ids`` — fully vectorized:
    decode all postings in 3 passes, boolean-mask, feed the writer
    pre-aggregated (term, doc, tf) rows (one Arrow take for the terms).
    ``new_pid`` writes the output under a different pid (compact's
    supersession commit)."""
    reader = SegmentReader(src_dir, pid)
    ids, dls, tags = reader.norms()
    keep_mask = ~np.isin(ids, drop_ids)
    writer = SegmentWriter(dst_dir, pid if new_pid is None else new_pid, avgdl)
    writer.set_norms(
        ids[keep_mask],
        dls[keep_mask],
        tags.take(pa.array(np.flatnonzero(keep_mask))),
    )
    terms, term_codes, docs_a, tfs_a = reader.read_all_postings()
    if docs_a.size:
        pm = ~np.isin(docs_a, drop_ids)
        writer.add_raw(
            terms.take(pa.array(term_codes[pm])), docs_a[pm], tfs_a[pm]
        )
    return writer


def compact(spark: SparkSession, index_dir: str) -> dict:
    """Drop tombstoned docs physically; rewrite segments + stats.

    Holds the maintenance lock end-to-end, which is what makes the
    final unconditional tombstone removal correct: no delete_docs can
    land between the tombstone read at the top and that removal.

    NOTE: removing docs changes N/avgdl/df, hence every BM25 score —
    that's inherent to the scoring model, exactly as the reference's
    delete-rebuild changes its index (SURVEY.md §2.3 K4).
    """
    with maintenance_lock(index_dir):
        return _compact_locked(spark, index_dir)


def _compact_locked(spark: SparkSession, index_dir: str) -> dict:
    sweep_orphans(index_dir)  # reclaim leftovers of any crashed prior run
    tomb_path = os.path.join(index_dir, TOMBSTONES)
    if not os.path.exists(tomb_path):
        return {"compacted": 0}
    tomb = pq.read_table(tomb_path)["doc_id"].to_numpy()
    if tomb.size == 0:
        os.remove(tomb_path)
        return {"compacted": 0}

    # 1. shrink the docs table (source of truth for stats) — ANTI-JOIN
    # against the tombstone table, never an IN-list literal in the plan
    # (millions of tombstones would otherwise be embedded in the query)
    docs_path = os.path.join(index_dir, "docs.parquet")
    docs = spark.read.parquet(docs_path)
    tomb_df = spark.read.parquet(tomb_path)
    kept = docs.join(F.broadcast(tomb_df), "doc_id", "left_anti")
    tmp_docs = docs_path + ".compact"
    kept.write.mode("overwrite").partitionBy("part").parquet(tmp_docs)
    shutil.rmtree(docs_path)
    os.replace(tmp_docs, docs_path)
    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    avgdl = stats["avgdl"]  # manifest lineage only; refreshed below

    # 2. rewrite each segment without the tombstoned docs (1 task/segment),
    # committed per segment via the merge SUPERSESSION protocol: the
    # output lands under a NEW pid whose atomic manifest row carries
    # merged_from=[old_pid]. A concurrent search therefore always reads
    # a complete generation of every segment (old files until the row
    # flips, new files after — never a half-swapped directory, which is
    # what the previous whole-dir rmtree+rename swap exposed), and a
    # crash mid-compact leaves a correct, re-runnable index.
    manifest = read_manifest(index_dir)
    pids = sorted(r["partition_id"] for r in manifest)
    base = max(pids) + 1
    idx = index_dir
    # the tombstone set ships as a PATH, not a closure-captured array:
    # each task side-reads tombstones.parquet once (shared storage at
    # cluster scale) — millions of tombstones would otherwise be pickled
    # into every task closure
    tomb_path_b = tomb_path

    def rewrite(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        drop = pq.read_table(tomb_path_b)["doc_id"].to_numpy()
        for rb in batches:
            for pid, npid in zip(
                rb.column("pid").to_pylist(), rb.column("new_pid").to_pylist()
            ):
                writer = _rewrite_segment_filtered(
                    idx, idx, int(pid), drop, avgdl, new_pid=int(npid)
                )
                st = writer.finish()
                write_manifest_row(
                    idx, st, {"avgdl": avgdl, "merged_from": [int(pid)]}
                )
                yield pa.record_batch(
                    [pa.array([int(pid)], pa.int32())], names=["pid"]
                )

    rows_in = [(int(p), base + i) for i, p in enumerate(pids)]
    pid_df = spark.createDataFrame(
        rows_in, "pid int, new_pid int"
    ).repartition(min(len(rows_in), 64))
    done = pid_df.mapInArrow(rewrite, schema="pid int").collect()
    assert len(done) == len(pids)

    # 3. drop superseded sources; tombstones go LAST — they keep masking
    # the deleted docs in any old-generation segment a concurrent query
    # may still be reading during the flip window
    _cleanup_merged_sources(index_dir, pids)
    os.remove(tomb_path)
    _recompute_global_stats(spark, index_dir)  # AFTER segments reflect removal
    return {"compacted": int(tomb.size), "segments": len(pids)}


def sweep_orphans(index_dir: str) -> int:
    """Garbage-collect superseded segment rows/files a crash left behind.

    compact and run_merge_policy DEFER source cleanup to the end of the
    run (one reader-visible flip window per run); a crash after the
    per-group commits but before that cleanup therefore leaks the
    superseded rows/files permanently — ``read_manifest`` filters them
    so correctness holds, but no later path would ever delete them
    (merge's idempotency cleanup only fires for an identical re-planned
    pid set, which the filtered manifest never produces again). This
    sweep runs at the START of every compact/policy run, under the
    maintenance lock: any pid appearing in a committed row's
    ``merged_from`` is garbage by definition. Returns the number of
    orphaned manifest rows removed."""
    mdir = os.path.join(index_dir, "manifest")
    if not os.path.isdir(mdir):
        return 0
    rows = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    rows.append(json.load(f))
            except (OSError, ValueError):
                continue
    superseded: set[int] = set()
    for r in rows:
        superseded.update(int(p) for p in (r.get("merged_from") or []))
    n_orphan_rows = sum(1 for r in rows if r["partition_id"] in superseded)
    if superseded:
        _cleanup_merged_sources(index_dir, sorted(superseded))
    return n_orphan_rows


def _cleanup_merged_sources(index_dir: str, pids: list[int]) -> None:
    """Remove superseded source rows/files; tolerant of a concurrent or
    prior attempt having already removed any of them."""
    for p in pids:
        try:
            os.remove(os.path.join(index_dir, "manifest", f"part-{p:05d}.json"))
        except FileNotFoundError:
            pass
        for f in _glob.glob(os.path.join(index_dir, "segments", f"seg-{p:05d}.*")):
            try:
                os.remove(f)
            except FileNotFoundError:
                pass


def merge_segments(
    index_dir: str,
    pids: list[int],
    new_pid: int | None = None,
    lock: bool = True,
    cleanup: bool = True,
) -> dict:
    """Log-structured merge: combine several (small) segments into one.

    ``lock=False`` is for callers already holding the maintenance lock
    (run_merge_policy runs disjoint merge groups as Spark tasks under
    its own driver-held lock).

    Doc sets are disjoint, so per-term posting lists merge by doc-id
    sort; global stats/df are unchanged — queries return identical
    results before and after (asserted in tests).

    COMMIT PROTOCOL: the new segment's files land first (fsync+rename),
    then ITS manifest row (carrying ``merged_from``) lands atomically —
    that row is the single commit point. ``read_manifest`` treats any
    pid listed in a ``merged_from`` as superseded, so a crash after the
    commit but before the source rows/files are removed leaves a
    correct, query-identical index (stale files are garbage, not data).

    Posting rebuild is vectorized: each input decodes in 3 passes
    (read_all_postings), term strings map to a sorted union vocabulary
    via searchsorted, and one global lexsort by (term_code, doc_id)
    orders the combined stream for the writer.
    """
    if lock:
        with maintenance_lock(index_dir):
            return merge_segments(
                index_dir, pids, new_pid, lock=False, cleanup=cleanup
            )
    assert len(pids) >= 2
    rows = read_manifest(index_dir)
    # IDEMPOTENCY: a Spark task retry (or a crash-then-rerun) whose prior
    # attempt already committed the merged row finds its sources
    # superseded — detect its own commit (merged_from == pids) and skip
    # straight to cleanup instead of dying on the missing-source assert.
    pid_set = {int(p) for p in pids}
    for r in rows:
        if set(r.get("merged_from") or []) == pid_set:
            if cleanup:
                _cleanup_merged_sources(index_dir, pids)
            return {
                "merged": pids,
                "new_pid": r["partition_id"],
                "n_docs": r["n_docs"],
                "n_postings": r["n_postings"],
            }
    manifest = {r["partition_id"]: r for r in rows}
    for p in pids:
        assert p in manifest, f"segment {p} not in manifest"
    if new_pid is None:
        new_pid = max(manifest) + 1
    readers = [SegmentReader(index_dir, p) for p in pids]
    avgdl = manifest[pids[0]].get("avgdl", 0.0)
    writer = SegmentWriter(index_dir, new_pid, avgdl)
    # merged norms (doc-id sorted; ids are disjoint across segments)
    nid, ndl, ntags = [], [], []
    for rd in readers:
        ids, dls, tags = rd.norms()
        nid.append(ids)
        ndl.append(dls)
        ntags.append(tags)
    nid_all = np.concatenate(nid)
    order = np.argsort(nid_all)
    tags_all = pa.concat_arrays(
        [t.cast(pa.list_(pa.string())) for t in ntags]
    ).take(pa.array(order))
    writer.set_norms(nid_all[order], np.concatenate(ndl)[order], tags_all)
    # vectorized k-way posting merge via a union vocabulary
    import pyarrow.compute as pc

    parts = [rd.read_all_postings() for rd in readers]
    vocab = sorted(
        set().union(*[set(p[0].to_pylist()) for p in parts])
    )  # vocab-sized python, not posting-sized
    vocab_pa = pa.array(vocab, pa.string())
    code_l, doc_l, tf_l = [], [], []
    for terms, term_codes, docs_a, tfs_a in parts:
        if docs_a.size == 0:
            continue
        local_to_union = pc.index_in(terms, value_set=vocab_pa).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        code_l.append(local_to_union[term_codes])
        doc_l.append(docs_a)
        tf_l.append(tfs_a)
    if code_l:
        codes = np.concatenate(code_l)
        docs_a = np.concatenate(doc_l)
        tfs_a = np.concatenate(tf_l)
        o = np.lexsort((docs_a, codes))
        writer.add_raw(vocab_pa.take(pa.array(codes[o])), docs_a[o], tfs_a[o])
    st = writer.finish()
    # COMMIT: one atomic manifest-row write supersedes the sources
    write_manifest_row(
        index_dir, st, {"avgdl": avgdl, "merged_from": [int(p) for p in pids]}
    )
    # cleanup (safe to crash anywhere in here — sources are superseded);
    # run_merge_policy defers it to the end of the whole policy run so
    # concurrent queries see at most ONE flip window per run
    if cleanup:
        _cleanup_merged_sources(index_dir, pids)
    return {
        "merged": pids,
        "new_pid": new_pid,
        "n_docs": st.n_docs,
        "n_postings": st.n_postings,
    }


def plan_merges(
    index_dir: str,
    tier_factor: float = 4.0,
    min_merge: int = 4,
    max_merge: int = 16,
    floor_bytes: int = 1 << 16,
) -> list[list[int]]:
    """Size-tiered merge plan: segments land in tiers by
    log_{tier_factor}(bytes); any tier holding >= min_merge segments
    yields one merge of its smallest <= max_merge members. Disjoint
    groups — safe to execute in parallel (one task per output segment)."""
    rows = read_manifest(index_dir)
    tiers: dict[int, list[dict]] = {}
    for r in rows:
        t = int(np.log(max(r["bytes"], floor_bytes)) / np.log(tier_factor))
        tiers.setdefault(t, []).append(r)
    plans = []
    for t in sorted(tiers):
        group = sorted(tiers[t], key=lambda r: r["bytes"])
        if len(group) >= min_merge:
            plans.append([r["partition_id"] for r in group[:max_merge]])
    return plans


def run_merge_policy(
    index_dir: str,
    spark: SparkSession | None = None,
    tier_factor: float = 4.0,
    min_merge: int = 4,
    max_merge: int = 16,
    max_rounds: int = 10,
) -> dict:
    """Apply the size-tiered policy until no tier overflows (merged
    outputs may cascade into a higher tier that then overflows).

    With ``spark``, each round's (disjoint) merge groups run as one
    Spark job, one task per output segment; without, they run serially
    on the driver. Query results are identical before/after (stats and
    df never change under merge). Holds the maintenance lock for the
    whole policy run (merge groups within a round are disjoint and run
    in parallel as Spark tasks UNDER that one driver-held lock)."""
    with maintenance_lock(index_dir):
        return _run_merge_policy_locked(
            index_dir, spark, tier_factor, min_merge, max_merge, max_rounds
        )


def _run_merge_policy_locked(
    index_dir: str,
    spark: SparkSession | None,
    tier_factor: float,
    min_merge: int,
    max_merge: int,
    max_rounds: int,
) -> dict:
    sweep_orphans(index_dir)  # reclaim leftovers of any crashed prior run
    merged_total: list[list[int]] = []
    n_rounds = 0
    for _ in range(max_rounds):
        plans = plan_merges(index_dir, tier_factor, min_merge, max_merge)
        if not plans:
            break
        n_rounds += 1
        if spark is not None and len(plans) > 1:
            idx = index_dir
            plan_json = [json.dumps(p) for p in plans]

            def do_merge(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
                for rb in batches:
                    for blob, npid in zip(
                        rb.column("plan").to_pylist(),
                        rb.column("new_pid").to_pylist(),
                    ):
                        merge_segments(
                            idx,
                            json.loads(blob),
                            new_pid=int(npid),
                            lock=False,
                            cleanup=False,
                        )
                        yield pa.record_batch(
                            [pa.array([blob], pa.string())], names=["plan"]
                        )

            # pre-assign output pids on the driver (executors must not race
            # on max(manifest)+1)
            base = max(r["partition_id"] for r in read_manifest(idx)) + 1
            rows = [(pj, base + i) for i, pj in enumerate(plan_json)]
            df = spark.createDataFrame(rows, "plan string, new_pid int")
            df.repartition(len(rows)).mapInArrow(
                do_merge, schema="plan string"
            ).collect()
        else:
            for p in plans:
                merge_segments(index_dir, p, lock=False, cleanup=False)
        merged_total.extend(plans)
    # DEFERRED source cleanup: superseded rows/files stay on disk while
    # the policy cascades (read_manifest filters them, so queries and
    # later rounds only see live segments) and are removed ONCE here —
    # concurrent searches face a single flip window per policy run
    # instead of one per merge group, and the serving retry covers it.
    if merged_total:
        _cleanup_merged_sources(
            index_dir, sorted({p for grp in merged_total for p in grp})
        )
    return {"rounds": n_rounds, "merged_groups": merged_total}


def update_doc_tags(
    spark: SparkSession, index_dir: str, updates: dict[int, list[str]]
) -> dict:
    """Attribute-only UPDATE (reference update_metadata,
    src/refimage/storage.py:439-508, endpoint api.py:738-773): replace the
    tag array of the given docs in the docs table AND the affected
    segments' docs sidecar. Postings, stats and df are untouched (tags
    never participate in scoring), so the cost is O(affected partitions)
    — unlike the reference, whose only mutation path for indexed fields
    is a full rebuild.

    - segments FIRST: one task per segment; each side-reads the updates
      parquet, checks membership against its sorted doc ids, and
      rewrites ONLY its docs sidecar (atomic tmp+rename). The posting
      file is never opened.
    - docs table second: the affected parts' rows are rewritten via
      dynamic partition overwrite (untouched part dirs keep their files).

    CRASH SAFETY: runs under the maintenance lock (a concurrent compact
    rewriting sidecars would silently drop a just-applied tag update).
    Both phases set tags to their TARGET value, so the whole operation
    is idempotent — a crash between the sidecar rewrites and the docs
    overwrite is repaired by re-running the same update. The scratch
    tag_updates.parquet is removed in a ``finally`` (never leaks), and
    sidecars go first so serving — which reads sidecars — never trails
    a docs table the stats paths already see.
    """
    if not updates:
        return {"updated_docs": 0, "segments_rewritten": 0}
    with maintenance_lock(index_dir):
        return _update_doc_tags_locked(spark, index_dir, updates)


def _update_doc_tags_locked(
    spark: SparkSession, index_dir: str, updates: dict[int, list[str]]
) -> dict:
    up_ids = np.sort(np.fromiter(updates.keys(), np.int64, len(updates)))
    up_tags = pa.array(
        [[str(t) for t in updates[int(i)]] for i in up_ids],
        pa.list_(pa.string()),
    )
    up_path = os.path.join(index_dir, "tag_updates.parquet")
    pq.write_table(pa.table({"doc_id": up_ids, "tags": up_tags}), up_path)
    try:
        # 1. segment sidecars: membership-check + rewrite, 1 task/segment
        pids = [r["partition_id"] for r in read_manifest(index_dir)]
        idx = index_dir
        up_path_b = up_path

        def rewrite(
            batches: Iterator[pa.RecordBatch],
        ) -> Iterator[pa.RecordBatch]:
            import pyarrow.compute as pc

            ut = pq.read_table(up_path_b)
            uids = ut["doc_id"].to_numpy()
            utags = ut["tags"].combine_chunks()
            for rb in batches:
                for pid in rb.column("pid").to_pylist():
                    docs_p = seg_paths(idx, int(pid))[2]
                    t = pq.read_table(docs_p)
                    ids = t["doc_id"].to_numpy()
                    pos = np.searchsorted(uids, ids)
                    posc = np.minimum(pos, uids.size - 1)
                    hit = uids[posc] == ids
                    n_hit = int(hit.sum())
                    if n_hit:
                        repl = utags.take(pa.array(posc))
                        new_tags = pc.if_else(
                            pa.array(hit), repl, t["tags"].combine_chunks()
                        )
                        out = t.set_column(
                            t.schema.get_field_index("tags"), "tags", new_tags
                        )
                        pq.write_table(out, docs_p + ".tmp", compression="zstd")
                        os.replace(docs_p + ".tmp", docs_p)
                    yield pa.record_batch(
                        [pa.array([n_hit], pa.int32())], names=["n"]
                    )

        pid_df = spark.createDataFrame(
            [(p,) for p in pids], "pid int"
        ).repartition(min(len(pids), 64))
        rewritten = sum(
            r["n"] > 0
            for r in pid_df.mapInArrow(rewrite, schema="n int").collect()
        )

        # 2. docs table: rewrite only the affected part dirs
        docs_path = os.path.join(index_dir, "docs.parquet")
        docs = spark.read.parquet(docs_path)
        u = spark.read.parquet(up_path).withColumnRenamed("tags", "_u_tags")
        affected = [
            r["part"]
            for r in docs.join(F.broadcast(u), "doc_id")
            .select("part")
            .distinct()
            .collect()
        ]
        n_updated = 0
        if affected:
            n_updated = int(docs.join(F.broadcast(u), "doc_id").count())
            # localCheckpoint materializes the new rows BEFORE the
            # overwrite (Spark refuses to overwrite a path its own plan
            # still reads, and the old files vanish under any lazy plan)
            new_rows = (
                docs.where(F.col("part").isin(affected))
                .join(F.broadcast(u), "doc_id", "left")
                .withColumn("tags", F.coalesce("_u_tags", "tags"))
                .drop("_u_tags")
                .localCheckpoint(eager=True)
            )
            (
                new_rows.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("part")
                .parquet(docs_path)
            )
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(up_path)
    return {"updated_docs": n_updated, "segments_rewritten": int(rewritten)}


def append_pages(
    spark: SparkSession,
    new_pages: DataFrame,
    index_dir: str,
    lock_blocking: bool = False,
    lock_timeout: float = 600.0,
) -> dict:
    """Log-structured append: index new pages as ADDITIONAL segments.

    New doc ids continue after the current corpus; new partition ids
    continue after the current max pid, so existing segments and
    manifest rows are untouched. Global stats/df are refreshed (BM25
    scores legitimately shift — same semantics as reference add).

    Takes the maintenance lock: append allocates ids/pids from current
    maxima and refreshes stats.json/term_stats/docs.parquet, all of
    which a concurrent compact/merge/update also touches.
    ``lock_blocking=True`` waits out a concurrent maintenance op instead
    of raising — streaming ingest passes it so a micro-batch landing
    during a merge retries rather than killing the whole stream.
    """
    with maintenance_lock(
        index_dir, blocking=lock_blocking, timeout=lock_timeout
    ):
        return _append_pages_locked(spark, new_pages, index_dir)


def _append_pages_locked(
    spark: SparkSession, new_pages: DataFrame, index_dir: str
) -> dict:
    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    num_parts = stats["num_parts"]
    tag_cols = tuple(stats.get("tag_cols", ["lang"]))
    docs_path = os.path.join(index_dir, "docs.parquet")
    old_docs = spark.read.parquet(docs_path)
    base_id = old_docs.agg(F.max("doc_id")).head()[0] + 1
    base_pid = max(r["partition_id"] for r in read_manifest(index_dir)) + 1

    # drop urls we already have (recrawl -> keep existing, matching S10)
    fresh = new_pages.join(
        old_docs.select("url"), "url", "left_anti"
    )
    new_docs = prepare_docs(
        fresh, num_parts, content_dedup=True, tag_cols=tag_cols
    ).withColumn(
        "doc_id", (F.col("doc_id") + F.lit(int(base_id))).cast("long")
    ).withColumn("part", (F.col("part") + F.lit(int(base_pid))).cast("int"))
    new_docs.write.mode("append").partitionBy("part").parquet(docs_path)

    # build segments for the new parts only (same writer machinery),
    # THEN refresh global stats from the updated dictionaries
    from refimage_spark.index.build import _write_segments_for

    stats = json.loads(open(os.path.join(index_dir, STATS_FILE)).read())
    n_new = _write_segments_for(
        spark, index_dir, stats["avgdl"], part_filter=lambda p: p >= base_pid
    )
    _recompute_global_stats(spark, index_dir)
    return {"appended_docs": int(new_docs.count()), "new_segments": n_new}
