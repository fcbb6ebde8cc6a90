"""Snapshot-versioned parquet tables — time travel and O(1) rollback.

The lakehouse snapshot primitive (the essence of Delta/Iceberg's
version chain, minus manifest files, matching this engine's
plain-parquet stance): every write lands in an immutable ``v{N}``
directory and a tiny ``_current`` pointer file flips to it ATOMICALLY
(write-temp + ``os.replace`` — the same crash-safety contract as
``maintenance.compact``'s rename-aside: at every instant the pointer
names a complete, fully-written snapshot).

Consequences, each load-bearing at scale:

- readers never see a partial write — the pointer flips only after the
  snapshot directory is complete;
- time travel is "read an older directory" (audit reads, repro runs);
- rollback is a pointer flip — O(1), data-free, instantly effective
  for every subsequent reader;
- a crashed write leaves an ORPHAN directory the pointer never names:
  invisible to readers, skipped over by the next successful write
  (version numbers advance past it), reclaimable by vacuum.

At 100 TB the per-version cost is the changed files only if writes go
through ``compact``-style rewrites of touched partitions; this module
keeps whole-snapshot semantics because the harness tables are small —
the PointER mechanics (the part engines get wrong) are identical.

Round 11 adds the one storage-lifecycle shape this layer lacked:
**deletion vectors** (Delta DV / Iceberg positional deletes). A
``delete_where`` produces a DELETE version — a directory holding only
a tiny parquet of ``(file_path, row_index)`` positions plus a
``_base`` pointer naming the version it applies over — so deleting
0.1% of a 100 TB table writes megabytes instead of rewriting the
snapshot. Readers resolve the version CHAIN (delete → … → base),
scan the base's parquet once with the ``_metadata.file_path`` /
``_metadata.row_index`` virtual columns (Spark 3.5+ parquet reader;
probed stable across reads on this build), and drop deleted positions
with ONE broadcast anti-join — filters and column pruning still reach
the base scan because the join key is metadata, not data.
``apply_deletes`` is the compaction step (materialize the live view
as a fresh base) once the DV ratio makes the anti-join worth
retiring; ``vacuum`` keeps every version reachable through a retained
version's ``_base`` chain so a delete version can never orphan its
own base.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "_current"
_VDIR = re.compile(r"^v(\d{5})$")
#: delete-version layout: v{N}/_base (text: version it applies over)
#: + v{N}/_dv/ (parquet: file_path string, row_index bigint). No data
#: files — the base version's parquet is shared, never copied.
_BASE = "_base"
_DV = "_dv"


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _VDIR.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(path: str) -> int | None:
    """The pointer's version, or None for an empty table. Orphan
    snapshot directories (crashed writes) are ignored by design."""
    ptr = os.path.join(path, _CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def write_version(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next snapshot and flip the pointer to it.
    Returns the new version number. Version numbers advance past any
    orphan directory a crashed writer left."""
    os.makedirs(path, exist_ok=True)
    n = (_versions(path)[-1] + 1) if _versions(path) else 1
    vdir = os.path.join(path, f"v{n:05d}")
    df.write.mode("error").parquet(vdir)
    tmp = os.path.join(path, f".{_CURRENT}.tmp")
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, os.path.join(path, _CURRENT))
    return n


def _vdir(path: str, v: int) -> str:
    return os.path.join(path, f"v{v:05d}")


def _base_of(path: str, v: int) -> int | None:
    """``v``'s ``_base`` pointer (a delete version), or None when ``v``
    is a base snapshot."""
    p = os.path.join(_vdir(path, v), _BASE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def _is_orphan_delete(path: str, v: int) -> bool:
    """A crash in :func:`delete_where` between the ``_dv`` parquet
    write and the ``_base`` pointer write leaves a version directory
    holding ``_dv`` but no ``_base`` — it would otherwise masquerade
    as a base snapshot (``_base_of`` returns None) whose "data" is an
    underscore-hidden dir no reader can scan (ADVICE r11). Never
    reachable via ``_current`` (the pointer flips last)."""
    vdir = _vdir(path, v)
    return os.path.isdir(os.path.join(vdir, _DV)) and not os.path.exists(
        os.path.join(vdir, _BASE)
    )


def _is_orphan_base(path: str, v: int) -> bool:
    """The sibling crash class (review r12): :func:`write_version`
    dying mid-parquet leaves a version dir with no ``_SUCCESS`` commit
    marker (and neither ``_dv`` nor ``_base``) — a PARTIAL base
    snapshot that must not be read, rolled back to, or allowed to hold
    a vacuum ``keep_last`` slot. Every complete snapshot written by
    this module carries the marker (Spark's default committer);
    manually-assembled dirs without one are not supported."""
    vdir = _vdir(path, v)
    return (
        not os.path.exists(os.path.join(vdir, _BASE))
        and not os.path.isdir(os.path.join(vdir, _DV))
        and not os.path.exists(os.path.join(vdir, "_SUCCESS"))
    )


def _is_orphan(path: str, v: int) -> bool:
    return _is_orphan_delete(path, v) or _is_orphan_base(path, v)


def _resolve_chain(path: str, v: int) -> tuple[int, list[str]]:
    """Walk a delete-version chain down to its base snapshot. Returns
    ``(base_version, dv_dirs)`` — every ``_dv`` directory on the walk
    (each holding (file_path, row_index) positions) in newest→oldest
    order; empty for a plain base version. An orphan delete version
    (crashed ``delete_where``; see :func:`_is_orphan_delete`) raises a
    clear error instead of resolving as an unscannable base."""
    dvs: list[str] = []
    seen: set[int] = set()
    while True:
        if v in seen:
            raise ValueError(f"cyclic _base chain at version {v} in {path}")
        seen.add(v)
        b = _base_of(path, v)
        if b is None:
            if _is_orphan_delete(path, v):
                raise ValueError(
                    f"version {v} at {path} is an ORPHAN delete version "
                    "(crashed delete_where: _dv written, _base pointer "
                    "missing) — it holds no data; vacuum() reclaims it"
                )
            if _is_orphan_base(path, v):
                raise ValueError(
                    f"version {v} at {path} is an ORPHAN base snapshot "
                    "(crashed write_version: no _SUCCESS commit marker) "
                    "— it is incomplete; vacuum() reclaims it"
                )
            return v, dvs
        dvs.append(os.path.join(_vdir(path, v), _DV))
        v = b


def _with_positions(base: DataFrame) -> DataFrame:
    """Attach the parquet reader's virtual position columns — the
    positional-delete join key. ``_metadata`` is only resolvable on
    the scan relation itself, which is why every DV consumer derives
    from the freshly-read base frame. Tables carrying user columns
    named like the internals are REJECTED loudly — ``withColumns``
    would silently overwrite them and the chain-resolving read would
    drop the user's data while a plain base read kept it (review
    r11)."""
    clash = {"__dv_fp", "__dv_ri", "__del_fp", "__del_ri", "_metadata"} & set(
        base.columns
    )
    if clash:
        # "_metadata" is in the clash set because Spark resolves a real
        # data column AHEAD of the virtual file-metadata column — a
        # user table carrying one would silently join DV positions
        # against user data and deletes would not apply (ADVICE r11)
        raise ValueError(
            f"versioned table carries reserved column(s) {sorted(clash)} — "
            "rename them before using deletion vectors (the DV read path "
            "would silently drop them or mis-resolve the positional join)"
        )
    return base.withColumns(
        {
            "__dv_fp": F.col("_metadata.file_path"),
            "__dv_ri": F.col("_metadata.row_index"),
        }
    )


#: DV payloads (compressed parquet bytes, summed over the chain) up to
#: this size join as an explicit broadcast — positions-only files, so
#: 64 MB compressed is roughly 2-5x that in executor memory, far
#: inside the broadcast hard cap. ABOVE it the hint is dropped and the
#: anti-join shuffles (AQE picks the strategy): a single 1%-delete on
#: a 100 TB table mints ~1e9 positions (tens of GB) in ONE
#: delete_where, with no apply_deletes opportunity beforehand, so an
#: unconditional broadcast would OOM the very write path that creates
#: the chance to compact.
DV_BROADCAST_MAX_BYTES = 64 << 20


def _dv_bytes(dv_dirs: list[str]) -> int:
    total = 0
    for d in dv_dirs:
        for root, _dirs, files in os.walk(d):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
    return total


def _minus_deleted(
    spark: SparkSession, with_pos: DataFrame, dv_dirs: list[str]
) -> DataFrame:
    """Drop deleted positions: ONE anti-join against the union of the
    chain's DVs — an explicit broadcast while the chain's parquet
    payload is at most :data:`DV_BROADCAST_MAX_BYTES` (the common
    case: positions-only megabytes against a terabyte base), a plain
    shuffled anti-join above it (AQE chooses the physical strategy; a
    billion-position delete must not be driver-collected). Base-side
    filters/pruning are untouched either way: the join key is reader
    metadata, not data columns."""
    dv = spark.read.parquet(*dv_dirs).select(
        F.col("file_path").alias("__del_fp"),
        F.col("row_index").alias("__del_ri"),
    )
    if _dv_bytes(dv_dirs) <= DV_BROADCAST_MAX_BYTES:
        dv = F.broadcast(dv)
    return with_pos.join(
        dv,
        (F.col("__dv_fp") == F.col("__del_fp"))
        & (F.col("__dv_ri") == F.col("__del_ri")),
        "left_anti",
    )


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to ``version``. A
    delete version resolves its chain: one scan of the base snapshot,
    one broadcast anti-join against the chain's deletion vectors."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"versioned table {path} is empty")
    vdir = _vdir(path, v)
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"version {v} does not exist at {path}")
    base_v, dv_dirs = _resolve_chain(path, v)
    base = spark.read.parquet(_vdir(path, base_v))
    if not dv_dirs:
        return base
    return _minus_deleted(spark, _with_positions(base), dv_dirs).drop(
        "__dv_fp", "__dv_ri"
    )


def delete_where(
    spark: SparkSession, path: str, condition: Column | str
) -> tuple[int, int]:
    """Positional delete (Delta DV / Iceberg positional-delete shape):
    record the ``(file_path, row_index)`` of every LIVE row matching
    ``condition`` as a new DELETE version over the current one —
    no data file is copied or rewritten, so the write cost is
    proportional to the rows DELETED, not the table. Returns
    ``(version, n_deleted)``; a predicate matching nothing is a no-op
    returning ``(current_version, 0)`` (no empty version is minted).

    Crash-safe like :func:`write_version`: the ``_dv`` parquet and
    ``_base`` pointer land inside the new version directory BEFORE the
    ``_current`` pointer flips, so a crash mid-delete leaves an orphan
    directory no reader ever resolves."""
    import shutil

    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"versioned table {path} is empty")
    base_v, dv_dirs = _resolve_chain(path, cur)
    cond = F.expr(condition) if isinstance(condition, str) else condition
    live = _with_positions(spark.read.parquet(_vdir(path, base_v)))
    if dv_dirs:
        live = _minus_deleted(spark, live, dv_dirs)
    hits = live.filter(cond).select(
        F.col("__dv_fp").alias("file_path"),
        F.col("__dv_ri").alias("row_index"),
    )
    n = _versions(path)[-1] + 1
    vdir = _vdir(path, n)
    hits.write.mode("error").parquet(os.path.join(vdir, _DV))
    n_deleted = spark.read.parquet(os.path.join(vdir, _DV)).count()
    if n_deleted == 0:
        shutil.rmtree(vdir)  # never pointed to; safe to reclaim now
        return cur, 0
    with open(os.path.join(vdir, _BASE), "w") as f:
        f.write(str(cur))
    tmp = os.path.join(path, f".{_CURRENT}.tmp")
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, os.path.join(path, _CURRENT))
    return n, n_deleted


def apply_deletes(spark: SparkSession, path: str) -> int:
    """Compaction: materialize the current live view as a fresh BASE
    snapshot, retiring the chain's anti-join for every later reader
    (Delta's PURGE / Iceberg's rewrite-data-files shape). The one
    deliberate rewrite in the DV lifecycle — run it when the chain's
    DV count or size makes per-read anti-joins more expensive than a
    single rewrite. A no-op error-out is inherited from
    ``write_version``'s mode("error") if the target dir exists."""
    return write_version(read_version(spark, path), path)


def dv_chain_stats(path: str, version: int | None = None) -> dict:
    """Lifecycle introspection: the resolved chain of ``version`` (or
    current) — base version, delete-version count, and per-DV file
    bytes. Pure filesystem walk, no Spark."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"versioned table {path} is empty")
    base_v, dv_dirs = _resolve_chain(path, v)
    dv_bytes = 0
    for d in dv_dirs:
        for root, _dirs, files in os.walk(d):
            dv_bytes += sum(
                os.path.getsize(os.path.join(root, fn)) for fn in files
            )
    return {
        "version": v,
        "base_version": base_v,
        "n_delete_versions": len(dv_dirs),
        "dv_bytes": dv_bytes,
    }


def rollback(path: str, version: int) -> None:
    """Flip the pointer to an older snapshot — O(1), no data moves."""
    if not os.path.isdir(os.path.join(path, f"v{version:05d}")):
        raise FileNotFoundError(f"version {version} does not exist at {path}")
    if _is_orphan(path, version):
        raise ValueError(
            f"version {version} at {path} is an ORPHAN version (crashed "
            "delete_where or write_version) — it holds no complete data "
            "and cannot be the current version"
        )
    tmp = os.path.join(path, f".{_CURRENT}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, _CURRENT))


def vacuum(
    path: str, keep_last: int = 2, *, detail: bool = False
) -> list[int] | dict[str, list[int]]:
    """Drop snapshot dirs older than the last ``keep_last``, never the
    pointer's target — and never any version a RETAINED version's
    ``_base`` chain reaches: a delete version shares its base's data
    files, so dropping the base would corrupt every reader of the
    delete version (the DV-lifecycle analogue of Delta's
    vacuum-respects-active-snapshots rule). Orphan versions — crashed
    ``delete_where`` (``_dv`` without ``_base``) AND crashed
    ``write_version`` (no ``_SUCCESS`` marker; review r12) — never
    count toward the ``keep_last`` newest slots (an orphan holding a
    slot would evict a real older snapshot in its place, ADVICE r11)
    and are reclaimed, EXCEPT: the NEWEST version dir, which is
    indistinguishable from a writer still in flight (its payload lands
    before its commit marker/pointer; reclaiming it would crash the
    writer mid-commit — it gets collected by a later vacuum once a
    newer version exists), and a dir ``_current`` points at (a legacy
    pointer from the pre-r12 rollback that accepted orphans; deleting
    it would dangle the pointer). Returns removed versions.

    Orphan dirs of EITHER class that hold real parquet bytes are
    QUARANTINED (renamed ``v{N}.quarantined[.K]``) instead of deleted:
    an orphan-base is indistinguishable from a complete snapshot whose
    ``_SUCCESS`` marker was stripped by a copy tool (S3 sync / distcp
    commonly exclude underscore-prefixed files — ADVICE r12), and an
    orphan-delete whose ``_dv`` parquet survived such a copy is a
    COMMITTED delete version missing only its ``_base`` marker —
    destroying its positions would silently resurrect deleted rows
    (review r13). The rename removes the dir from the version
    namespace (``_VDIR`` is anchored, so readers, ``write_version``
    numbering, and later vacuums no longer see it) while preserving
    the bytes for manual recovery. An orphan-classified dir that a
    RETAINED version's chain still reaches is left untouched entirely
    (neither deleted nor renamed) — the retained reader's recovery
    path is restoring the stripped marker in place. For a kept
    orphan-DELETE that promise needs its unit intact below the strip
    point, so the versions its ``_dv`` positions index — and the
    unit's mid-chain delete versions — are retained in place with it
    (review r14): marker restoration must have a base to land on.

    A quarantined orphan-delete keeps its RECOVERY UNIT whole (ADVICE
    r13): its ``_base`` marker is gone — that is what made it an
    orphan — but the ``_dv`` parquet records the base snapshot's data
    files by absolute path, so any removable data-bearing version
    those positions index is quarantined alongside it instead of
    rmtree'd. Without this, the same sweep that preserved the
    positions could reclaim the base they point at, leaving the
    quarantine unrecoverable. The unit also spans MID-CHAIN delete
    versions (the r13 caveat, solved r14): DV payloads are
    incremental — each ``_dv`` records only that version's new
    deletes — so the orphan's view builds on every delete version
    between it and the base its positions index. Any removable
    delete version whose ``_base`` chain reaches a version the unit
    preserves (a quarantined version, or a harvested ref that stayed
    live) is quarantined with it; manual recovery (rename the unit
    back, restore the stripped marker) then reproduces the
    pre-vacuum view whole, not just its newest surviving prefix.

    Returns the versions swept out of the namespace (deleted +
    quarantined together, sorted — the namespace view callers key
    on). Pass ``detail=True`` for
    ``{"deleted": [...], "quarantined": [...]}`` so operators can tell
    reclaimed space from preserved bytes (ADVICE r13)."""
    import shutil

    cur = current_version(path)
    all_vs = _versions(path)
    vs = [v for v in all_vs if not _is_orphan(path, v)]
    newest = all_vs[-1] if all_vs else None
    base_cache: dict[int, int | None] = {}

    def _b(v: int) -> int | None:
        # one marker read per version per sweep: the membership walks
        # below re-visit the same chain once per version above it,
        # O(n²) marker opens on a long chain without this (review r14)
        if v not in base_cache:
            base_cache[v] = _base_of(path, v)
        return base_cache[v]

    refs_cache: dict[int, set[int]] = {}

    def _refs(v: int) -> set[int]:
        # one payload harvest per orphan-delete per sweep: the keep
        # side, the unit-claim scan, and the quarantine side may all
        # ask for the same version's refs
        if v not in refs_cache:
            refs_cache[v] = _dv_referenced_versions(_vdir(path, v))
        return refs_cache[v]

    def _chain_reaches(w: int, hits: set[int]) -> bool:
        # shared by the keep-side and quarantine-side membership walks
        # (review r14 second batch — one copy of the cycle-guarded
        # termination logic): walk ``w``'s ``_base`` chain to the
        # strip point / bottom / a cycle; True when any node below
        # ``w`` is in ``hits``
        node, seen = _b(w), {w}
        while node is not None and node not in seen:
            if node in hits:
                return True
            seen.add(node)
            node = _b(node)
        return False

    keep: set[int] = set(vs[-keep_last:]) if keep_last else set()
    if cur is not None:
        keep.add(cur)
    for v in list(keep):
        b = _b(v)
        while b is not None and b not in keep:
            keep.add(b)
            b = _b(b)
    # An IN-PLACE orphan-delete — one a retained version's marker
    # chain reaches, the pointer's target, or the newest dir —
    # promises IN-PLACE recovery: restore its stripped ``_base`` and
    # the chain reads again. The keep-chain walk above stops at its
    # missing marker, so the versions BELOW the strip point were
    # previously neither kept nor quarantined and got rmtree'd,
    # breaking that promise with retained data (review r14). Harvest
    # its ``_dv`` refs the same way the quarantine side does: the
    # base those positions index — and every surviving delete version
    # whose own chain reaches it (the unit's mid-chain DVs; payloads
    # are incremental) — stays IN PLACE, because renaming any of them
    # would dangle the very marker-restoration the recovery promises.
    protected = keep | {v for v in (cur, newest) if v is not None}
    keep_refs: set[int] = set()
    for v in sorted(protected):
        if _is_orphan_delete(path, v):
            keep_refs |= _refs(v)
    if keep_refs:
        for r in sorted(keep_refs):
            # a harvested ref joins keep WITH its own ``_base`` chain
            # (review r14 second batch): an over-matched ref can name
            # a delete version, and keeping it without its base would
            # leave a dangling marker in the namespace — the exact
            # corruption vacuum's keep-chain rule exists to prevent
            if not os.path.isdir(_vdir(path, r)):
                continue
            keep.add(r)
            b = _b(r)
            while b is not None and b not in keep:
                keep.add(b)
                b = _b(b)
        # a SECOND stripped marker mid-chain hides the unit's lower
        # half from the membership walk — an orphan-delete whose own
        # positions name a kept unit's base shares that base and
        # stays in place with it (review r14 second batch: renaming
        # it would dangle the in-place restoration one level up)
        unit_hits = set(keep_refs)
        for w in all_vs:
            if (
                w not in keep
                and _is_orphan_delete(path, w)
                and _refs(w) & keep_refs
            ):
                keep.add(w)
                unit_hits.add(w)
        for w in all_vs:
            if w not in keep and _chain_reaches(w, unit_hits):
                keep.add(w)
    # keep is computed BEFORE the orphan list: a retained delete
    # version's ``_base`` chain can reach an orphan-CLASSIFIED base
    # (a complete snapshot whose ``_SUCCESS`` a copy tool stripped) —
    # reclaiming it would strand every reader of the retained version
    # (review r13). Such a dir stays in place so recovery is
    # re-creating the marker, not restoring data.
    orphans = [
        v
        for v in all_vs
        if v not in set(vs) and v != cur and v != newest and v not in keep
    ]
    removable = [v for v in vs if v not in keep] + orphans
    removable.sort()
    # BOTH orphan classes quarantine when they hold parquet bytes:
    # an orphan-delete whose ``_dv`` parquet survived a copy tool
    # that stripped only the ``_base`` marker file is a COMMITTED
    # delete version in disguise — destroying its positions would
    # silently resurrect deleted rows once the operator restores
    # the markers (review r13 second batch). The probe walks the
    # dir (listdir/walk, never glob: metacharacters in the table
    # path must not defeat it — review r13). Non-orphan removable
    # versions are superseded real snapshots: plain rmtree is the
    # point of vacuum.
    quarantine: set[int] = {
        v
        for v in removable
        if _is_orphan(path, v) and _holds_parquet(_vdir(path, v))
    }
    # Keep each quarantined orphan-delete's recovery unit whole
    # (ADVICE r13): the versions its positions index — recovered from
    # the ``_dv`` payload's recorded file paths, the only pointer that
    # survives the stripped marker — must not be rmtree'd by the same
    # sweep that preserved the positions.
    removable_set = set(removable)
    refs: set[int] = set()
    for v in sorted(quarantine):
        if _is_orphan_delete(path, v):
            refs |= _refs(v)
    for ref in sorted(refs):
        if ref in removable_set and _holds_parquet(_vdir(path, ref)):
            quarantine.add(ref)
    # ... and the unit's MID-CHAIN delete versions (r13 caveat, solved
    # r14): DV payloads are incremental, so the orphan's view builds on
    # every delete version between it and the base its positions index.
    # The orphan's own ``_base`` is gone — chain topology around it is
    # unrecoverable — so membership is decided from the SURVIVING side:
    # a removable delete version whose chain reaches a version the unit
    # preserves (quarantined, or a harvested ref that stayed live)
    # shares the orphan's base and is quarantined with it. Over-matching
    # errs toward quarantine, the safe direction. One membership pass
    # suffices: chains are walked to their bottom, so any version
    # reaching a newly-added member also reaches that member's own hit
    # directly.
    recovery = quarantine | refs
    for w in removable:
        if w not in quarantine and _chain_reaches(w, recovery):
            quarantine.add(w)
    deleted: list[int] = []
    quarantined: list[int] = []
    for v in removable:
        vdir = _vdir(path, v)
        if v in quarantine:
            os.replace(vdir, _quarantine_dest(vdir))
            quarantined.append(v)
        else:
            shutil.rmtree(vdir)
            deleted.append(v)
    if detail:
        return {"deleted": deleted, "quarantined": quarantined}
    return removable


def _dv_referenced_versions(vdir: str) -> set[int]:
    """Version numbers whose data files an orphan-delete's ``_dv``
    positions index — parsed from the recorded absolute ``file_path``
    strings (the ``_base`` marker is gone; the payload itself is the
    only surviving pointer). Matches the anchored ``v{N:05d}`` path
    segment :func:`_vdir` writes; over-matching (a table path that
    itself contains such a segment) errs toward quarantine, the safe
    direction. Failures are PER FILE: a multi-part ``_dv`` whose copy
    also truncated one part must not discard the refs already parsed
    from the readable parts — that would rmtree the base those
    positions index, exactly the state this function exists to
    prevent (review r14). A fully unreadable payload yields the empty
    set — positions that cannot be read name nothing recoverable.

    Streams ROW GROUP by row group and uniques the ``file_path``
    column before touching Python (review r14 second batch): a
    crashed 1%-delete on a 100 TB table leaves ~1e9 positions —
    ``to_pylist`` over a whole file would hold GBs of path strings on
    the maintenance process's heap, while the distinct paths number
    only in the data-file thousands."""
    import re

    refs: set[int] = set()
    try:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
    except Exception:
        return refs
    for root, _dirs, files in os.walk(os.path.join(vdir, _DV)):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            try:
                pf = pq.ParquetFile(os.path.join(root, f))
                groups = range(pf.metadata.num_row_groups)
            except Exception:
                continue  # keep refs harvested from readable parts
            for g in groups:
                try:
                    col = pf.read_row_group(g, columns=["file_path"])
                    vals = pc.unique(
                        col.column("file_path").combine_chunks()
                    ).to_pylist()
                except Exception:
                    continue  # per row group, same rationale as per file
                for s in vals:
                    for m in re.finditer(r"/v(\d{5})/", s or ""):
                        refs.add(int(m.group(1)))
    return refs


def _holds_parquet(vdir: str) -> bool:
    for _root, _dirs, files in os.walk(vdir):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _quarantine_dest(vdir: str) -> str:
    """First free ``v{N}.quarantined[.K]`` name — version numbers can
    be reused after a rollback+vacuum, so a second quarantine of the
    same number must not os.replace into a non-empty dir (ENOTEMPTY
    would abort vacuum mid-sweep; review r13 second batch)."""
    dest = vdir + ".quarantined"
    k = 0
    while os.path.exists(dest):
        k += 1
        dest = f"{vdir}.quarantined.{k}"
    return dest
