"""Index replication: master -> replica file sync by generation.

The ReplicationHandler/SnapPuller pair (``solr/core/src/java/org/apache/
solr/handler/ReplicationHandler.java``, ``SnapPuller.java``) restated for
an immutable-file index on a shared/posix filesystem:

- the MASTER's commit point is its ``manifest.json`` (written last,
  atomically — the ``segments_N`` analogue); its generation is the
  manifest content hash;
- a REPLICA pulls by comparing file lists: segment/merged/norms/delete
  files are immutable and content-named, so sync = copy only the files
  the replica lacks, delete the ones the master dropped, then publish the
  new manifest LAST (same ordering as the reference: searchers reopen
  only after a complete, consistent file set exists).

``SearcherManager.maybe_refresh`` on the replica picks up the new
generation exactly like a local commit.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

_SYNC_DIRS = ("segments", "norms", "merged", "deletes", "_checkpoints",
              "_appends", "docvalues", "docvalues_updates")


def index_generation(index_dir: str) -> str:
    """Content hash of the commit point (manifest.json)."""
    with open(os.path.join(index_dir, "manifest.json"), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _file_set(index_dir: str) -> dict[str, int]:
    out = {}
    for d in _SYNC_DIRS:
        full = os.path.join(index_dir, d)
        if not os.path.isdir(full):
            continue
        # recursive: docvalues_updates/<field>/gen-*.parquet nests
        for root, _dirs, files in os.walk(full):
            for name in files:
                if name.endswith(".tmp"):
                    continue
                p = os.path.join(root, name)
                rel = os.path.relpath(p, index_dir)
                out[rel] = os.path.getsize(p)
    # root-level commit companions: the pickled analyzer and
    # ExternalFileField key=value files travel with the index
    for name in os.listdir(index_dir):
        p = os.path.join(index_dir, name)
        if os.path.isfile(p) and (
                name == "analyzer.pkl" or name.startswith("external_")):
            out[name] = os.path.getsize(p)
    return out


def replicate(master_dir: str, replica_dir: str) -> dict:
    """One sync pass; returns {"generation", "copied", "deleted",
    "up_to_date"}. Safe to call repeatedly (idempotent)."""
    gen = index_generation(master_dir)
    man_path = os.path.join(replica_dir, "manifest.json")
    gen_path = os.path.join(replica_dir, "_replication.json")
    if os.path.exists(man_path) and os.path.exists(gen_path):
        with open(gen_path) as f:
            if json.load(f).get("generation") == gen:
                return {"generation": gen, "copied": 0, "deleted": 0,
                        "up_to_date": True}
    os.makedirs(replica_dir, exist_ok=True)
    want = _file_set(master_dir)
    have = _file_set(replica_dir)
    copied = 0
    for rel, size in want.items():
        dst = os.path.join(replica_dir, rel)
        if rel in have and have[rel] == size:
            continue  # immutable content-named files: size match = same
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(os.path.join(master_dir, rel), dst + ".tmp")
        os.replace(dst + ".tmp", dst)
        copied += 1
    deleted = 0
    for rel in set(have) - set(want):
        os.remove(os.path.join(replica_dir, rel))
        deleted += 1
    # manifest LAST (the commit publish); file paths inside are relative
    # to index_dir except the source-corpus references, which stay shared
    with open(os.path.join(master_dir, "manifest.json")) as f:
        man = json.load(f)
    man["index_dir"] = replica_dir
    # partitions referencing files INSIDE the master dir (delta-append
    # segments) re-point at the replica's synced copies; shared corpus
    # paths outside the index dir stay as-is
    mabs = os.path.abspath(master_dir)
    for p in man.get("partitions", []):
        fabs = os.path.abspath(p.get("file", ""))
        if fabs.startswith(mabs + os.sep):
            p["file"] = os.path.join(
                replica_dir, os.path.relpath(fabs, mabs))
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, man_path)
    with open(gen_path + ".tmp", "w") as f:
        json.dump({"generation": gen}, f)
    os.replace(gen_path + ".tmp", gen_path)
    return {"generation": gen, "copied": copied, "deleted": deleted,
            "up_to_date": False}


def backup_index(index_dir: str, backup_root: str, *,
                 name: str | None = None) -> str:
    """Snapshot backup (ReplicationHandler ?command=backup ->
    SnapShooter.java): a point-in-time copy of the commit's file set.
    Immutable files HARDLINK into the snapshot (zero-copy on the same
    filesystem, like SnapShooter's hardlink-capable directory copies);
    the manifest is COPIED last so the snapshot has its own commit
    point. Returns the snapshot dir (``snapshot.<generation>``)."""
    gen = index_generation(index_dir)
    snap = os.path.join(backup_root, name or f"snapshot.{gen}")
    if os.path.isdir(snap):
        return snap  # idempotent: a generation's snapshot is immutable
    tmp = snap + ".inprogress"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    for rel in _file_set(index_dir):
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        src = os.path.join(index_dir, rel)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
    for extra in ("analyzer.pkl", "multi_manifest.json"):
        p = os.path.join(index_dir, extra)
        dst = os.path.join(tmp, extra)
        if os.path.exists(p) and not os.path.exists(dst):
            shutil.copy2(p, dst)  # _file_set may have linked it already
    shutil.copy2(os.path.join(index_dir, "manifest.json"),
                 os.path.join(tmp, "manifest.json"))
    os.replace(tmp, snap)
    return snap


def restore_index(snapshot_dir: str, index_dir: str) -> str:
    """Restore (?command=restore -> RestoreCore.java): publish the
    snapshot's file set as a fresh index dir; manifest last."""
    tmp = index_dir + ".restoring"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    for rel in _file_set(snapshot_dir):
        dst = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        src = os.path.join(snapshot_dir, rel)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
    for extra in ("analyzer.pkl", "multi_manifest.json"):
        p = os.path.join(snapshot_dir, extra)
        dst = os.path.join(tmp, extra)
        if os.path.exists(p) and not os.path.exists(dst):
            shutil.copy2(p, dst)
    shutil.copy2(os.path.join(snapshot_dir, "manifest.json"),
                 os.path.join(tmp, "manifest.json"))
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.replace(tmp, index_dir)
    return index_dir
