"""Versioned-manifest commit protocol for managed tables.

A managed table is a directory of immutable parquet data files plus a
commit log of manifest files. Each committed version is its own
immutable file ``_manifest-v{N:012d}.json`` listing exactly the data
files that make up that version; ``_manifest.json`` is kept as a
best-effort CONVENIENCE POINTER at the latest version for legacy /
external readers, refreshed after every commit. Engine readers resolve
the highest-numbered version file directly.

Round-7 made the commit crash-atomic and reader-consistent (stage new
files invisible → one atomic rename → post-commit GC), but the commit
itself was read-modify-write over the single pointer file: two
concurrent writer PROCESSES could both read version v and both rename
v+1, the second silently discarding the first writer's committed
files. Round 8 (verdict task 1) makes the commit a COMPARE-AND-SWAP:

* A writer materializes the full manifest content in a temp file
  (fsync'd), then publishes it with ``link(2)`` to the version-numbered
  name. ``link`` fails with EEXIST if that version was already
  committed — the atomic create-if-absent primitive — and because the
  temp file is complete before the link, a version file can never be
  observed partially written (unlike ``open(O_CREAT|O_EXCL)`` + write,
  where a crash mid-write leaves a torn committed version).
* The LOSER of a race re-reads the new latest version and either
  REBASES (blind appends: the new files can simply be appended to the
  winner's file list — they conflict with nothing) or ABORTS with
  ``ConcurrentWriteError`` (rewrites: DELETE/UPDATE/compact computed
  their kept-file set against a version that is no longer latest, so
  committing would silently drop — or resurrect — the winner's rows).

This is the same split Delta Lake ships as WriteSerializable (blind
appends never conflict; any transaction that *read* table state
conflicts with every intervening commit) and the same primitive both
Delta (put-if-absent on ``_delta_log/{N}.json``) and Iceberg (CAS on
the metadata pointer) use at 100 TB. The reference sidesteps the
problem by serializing all writers through one server process
(duckherder_schema_catalog_entry.cpp:173-213 — catalog entries created
inside the server DuckDB's single-writer transaction); a shared
warehouse directory has no such funnel, so isolation must come from
the commit protocol itself.

Everything here is Spark-free on purpose: the multi-process isolation
test (tests/test_manifest_cas.py) drives these functions from plain
Python subprocesses, proving the CAS across real process boundaries
without paying a SparkSession per writer.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

__all__ = [
    "ConcurrentWriteError",
    "adopt",
    "commit_append",
    "commit_exact",
    "last_txn",
    "list_versions",
    "prune_watermark",
    "read_manifest",
    "try_commit",
]

POINTER = "_manifest.json"
_VERSION_FMT = "_manifest-v{:012d}.json"
_VERSION_RE = re.compile(r"_manifest-v(\d{1,18})\.json$")
_PRUNED_FMT = "_pruned-v{:012d}.marker"
_PRUNED_RE = re.compile(r"_pruned-v(\d{1,18})\.marker$")
# Committed version files retained behind the latest one. A lagging
# reader that resolved version N keeps working while up to KEEP newer
# commits land (the standard lakehouse read-vs-retention window —
# Delta's logRetentionDuration, here expressed in versions).
KEEP_VERSIONS = 20
# Age floor on pruning: version files younger than this are never
# unlinked even when they fall KEEP_VERSIONS behind — the time half of
# the reader-retention contract (Delta's logRetentionDuration proper).
# A reader that resolved version N is guaranteed N stays readable for
# at least this many seconds OR until KEEP_VERSIONS newer commits land,
# whichever is LATER. Tests that exercise pruning set this to 0.
PRUNE_MIN_AGE_SECONDS = 600.0


class ConcurrentWriteError(RuntimeError):
    """Another writer committed a new table version between this
    operation's read of the table state and its commit attempt. The
    operation was NOT applied (the losing commit never becomes
    visible); re-run it against the new state. Raised only by
    state-dependent mutations (DELETE/UPDATE/MERGE/compact/restore) —
    blind appends rebase and retry automatically."""


def _pointer_path(path: str) -> str:
    return os.path.join(path, POINTER)


def version_file(path: str, version: int) -> str:
    return os.path.join(path, _VERSION_FMT.format(version))


def list_versions(path: str) -> list[int]:
    """Committed version numbers present in the directory, ascending."""
    out = []
    for f in os.listdir(path):
        m = _VERSION_RE.fullmatch(f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def prune_watermark(path: str) -> int:
    """Highest version number ever PRUNED in this directory, -1 if
    none. Persisted as link(2)-created ``_pruned-v{N}.marker`` files
    and resolved as the max, so the watermark is monotone by
    construction — two racing pruners each publish their own marker
    and the max wins; a marker is never replaced in place, so the
    value can never regress the way a read-modify-write pointer
    could."""
    w = -1
    try:
        names = os.listdir(path)
    except OSError:
        return w
    for f in names:
        m = _PRUNED_RE.fullmatch(f)
        if m:
            w = max(w, int(m.group(1)))
    return w


def read_manifest(path: str) -> dict | None:
    """Resolve the latest committed manifest: the highest-numbered
    version file, else the legacy single pointer file (a pre-CAS
    table that has not been committed to since), else None."""
    versions = list_versions(path)
    if versions:
        with open(version_file(path, versions[-1])) as fh:
            return json.load(fh)
    pp = _pointer_path(path)
    if not os.path.exists(pp):
        return None
    with open(pp) as fh:
        return json.load(fh)


def try_commit(path: str, files: list[str], op: str,
               version: int, txns: dict | None = None) -> dict | None:
    """ONE compare-and-swap attempt: publish ``files`` as exactly
    ``version``. Returns the manifest on the win, None if that version
    number was already taken (lost race — re-read and rebase/abort).
    ``txns`` is the application-transaction map ({app_id: last applied
    transaction version} — Delta's SetTransaction action): each commit
    stores the FULL map, so the latest manifest always answers "what
    was the last batch app X applied?" without any log-history scan —
    prune-safe by construction.

    The content is fully written and fsync'd in a temp file first;
    link(2) then creates the version name atomically (EEXIST = loss),
    so a committed version file is always complete and a crash at any
    point leaves at most an invisible ``_manifest.tmp.*`` orphan.

    A version number at or below the PRUNE WATERMARK is a loss even
    if the name is free: pruning unlinked that version's file, which
    would otherwise re-open the number for link(2) and let a stalled
    loser (read base N, slept through >KEEP_VERSIONS commits) 'win' a
    commit that never becomes latest — readers resolve max — while its
    caller's post-commit GC deletes files the real latest still
    references. The watermark is checked before staging AND re-checked
    after the link (backing the link out on failure), closing the race
    where pruning advances between check and link."""
    if version <= prune_watermark(path):
        return None
    m = {
        "version": version,
        "op": op,
        "files": sorted(files),
        "ts": time.time(),
    }
    if txns:
        m["txns"] = dict(txns)
    tmp = os.path.join(path, f"_manifest.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump(m, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, version_file(path, version))
    except FileExistsError:
        os.unlink(tmp)
        return None
    os.unlink(tmp)
    if version <= prune_watermark(path):
        # Pruning advanced past us between the pre-check and the link.
        # Our version file can never be the resolved max (the watermark
        # is always > KEEP_VERSIONS behind a live latest), so backing
        # it out is invisible to readers.
        try:
            os.unlink(version_file(path, version))
        except OSError:
            pass
        return None
    # Make the directory entry itself durable (the rename-commit's
    # fsync-the-parent step, same reason).
    try:
        dfd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        pass
    _refresh_pointer(path)
    _prune_versions(path, version)
    return m


def commit_exact(path: str, files: list[str], op: str,
                 base_version: int | None,
                 txns: dict | None = None) -> dict:
    """Commit ``files`` as the version directly after ``base_version``
    (the version this mutation READ its state from; None = the table
    had no manifest). Any intervening commit makes the read stale →
    ConcurrentWriteError, nothing applied. This is the commit path for
    every state-dependent mutation. Callers must pass the BASE
    manifest's ``txns`` map through (rewrites otherwise erase stream
    idempotence state, re-opening replayed batches after a compact)."""
    version = 0 if base_version is None else base_version + 1
    m = try_commit(path, files, op, version, txns=txns)
    if m is None:
        cur = read_manifest(path)
        raise ConcurrentWriteError(
            f"{op}: table at {path} moved from version {base_version} "
            f"to {cur['version'] if cur else '?'} during this "
            "operation; re-run against the new state"
        )
    return m


def commit_append(path: str, new_files: list[str], op: str,
                  txn: tuple[str, int] | None = None) -> dict:
    """Commit ``new_files`` appended to the live file list, REBASING
    onto the winner and retrying if a concurrent commit lands first.
    Blind appends conflict with nothing: the staged files are fresh
    uniquely-named objects no other transaction references, so
    append-after-rebase preserves every concurrent commit's effect
    (WriteSerializable append semantics).

    ``txn=(app_id, txn_version)`` stamps this append as application
    transaction ``txn_version`` of ``app_id`` ATOMICALLY with the data
    (the idempotent-foreachBatch pattern): the rebase loop re-reads
    the live txns map each attempt, and if the app's recorded version
    is already >= txn_version the append is SKIPPED (files discarded
    by the caller) and the live manifest returned — a replayed
    micro-batch can never land twice even when the replay races a
    fresh batch."""
    while True:
        cur = read_manifest(path)
        base = cur["files"] if cur else []
        version = (cur["version"] + 1) if cur else 0
        txns = dict(cur.get("txns") or {}) if cur else {}
        if txn is not None:
            app, tv = txn
            last = txns.get(app)
            if last is not None and last >= tv:
                return cur  # already applied — idempotent skip
            txns[app] = tv
        m = try_commit(path, base + list(new_files), op,
                       version, txns=txns or None)
        if m is not None:
            return m


def last_txn(path: str, app: str) -> int | None:
    """Last applied transaction version for ``app`` (None = never) —
    resolved from the latest manifest's carried txns map."""
    m = read_manifest(path)
    if not m:
        return None
    return (m.get("txns") or {}).get(app)


def adopt(path: str) -> dict:
    """Manifest for a directory that predates one (legacy layout or an
    externally-written parquet dir, e.g. a fresh CTAS): adopt the
    current ``*.parquet`` listing as version 0. If a concurrent
    adopter wins the race, return the winner's manifest."""
    m = read_manifest(path)
    if m is not None:
        return m
    files = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and os.path.isfile(os.path.join(path, f))
    )
    won = try_commit(path, files, "adopt", 0)
    return won if won is not None else read_manifest(path)


def _refresh_pointer(path: str) -> None:
    """Best-effort: point ``_manifest.json`` at the CURRENT latest
    version (re-resolved, not necessarily the caller's commit — a
    racing refresh that loses the replace still converges, because
    every later commit refreshes again and engine readers never trust
    the pointer when version files exist)."""
    versions = list_versions(path)
    if not versions:
        return
    src = version_file(path, versions[-1])
    tmp = os.path.join(
        path, f"_pointer.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    )
    try:
        with open(src) as fh:
            content = fh.read()
        with open(tmp, "w") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, _pointer_path(path))
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _prune_versions(path: str, latest: int) -> None:
    """Unlink committed version files more than KEEP_VERSIONS behind
    ``latest`` AND older than PRUNE_MIN_AGE_SECONDS (both retention
    clauses must expire). Before any unlink, the prune WATERMARK is
    raised to the highest version about to go — watermark-first
    ordering means a version number is retired before its name is ever
    free for reuse, so try_commit's watermark check is sound even
    against pruners that crash mid-sweep. Safe concurrently: version
    files are immutable, each unlink targets a distinct name, readers
    resolve the max (never touched), and the marker scheme makes the
    watermark monotone under racing pruners."""
    now = time.time()
    doomed = []
    for v in list_versions(path):
        if v >= latest - KEEP_VERSIONS:
            continue
        try:
            age = now - os.path.getmtime(version_file(path, v))
        except OSError:
            continue
        if age >= PRUNE_MIN_AGE_SECONDS:
            doomed.append(v)
    if not doomed:
        return
    new_w = max(doomed)
    old_w = prune_watermark(path)
    if new_w > old_w:
        # publish the new watermark with the same create-if-absent
        # primitive as commits (content irrelevant — the NAME is the
        # value); EEXIST = another pruner already published it
        tmp = os.path.join(
            path, f"_manifest.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w") as fh:
            fh.write("")
        try:
            os.link(tmp, os.path.join(path, _PRUNED_FMT.format(new_w)))
        except FileExistsError:
            pass
        os.unlink(tmp)
        # retire superseded markers (max is preserved: we only ever
        # delete strictly below a marker that is already published)
        for f in os.listdir(path):
            m = _PRUNED_RE.fullmatch(f)
            if m and int(m.group(1)) < new_w:
                try:
                    os.unlink(os.path.join(path, f))
                except OSError:
                    pass
    for v in doomed:
        try:
            os.unlink(version_file(path, v))
        except OSError:
            pass


def vacuum_tmp(path: str) -> int:
    """Remove ``_manifest.tmp.*`` / ``_pointer.tmp.*`` orphans left by
    writers that crashed between staging a manifest and linking it.
    Invisible to every reader; pure housekeeping."""
    n = 0
    for f in os.listdir(path):
        if f.startswith(("_manifest.tmp.", "_pointer.tmp.")):
            try:
                os.unlink(os.path.join(path, f))
                n += 1
            except OSError:
                pass
    return n
