"""Streaming change-data-feed over the engine's table commit logs —
``readStream.format("aligned_table").option("readChangeFeed", "true")``,
the delta-spark ``readChangeFeed`` analog, for BOTH formats (the
iceberg twin uses snapshot-id offsets and the ``_snapshot_id``
version column, matching ``IcebergLog.read_changes``).

Where the plain table stream (:mod:`aligned_spark.streaming
.table_stream`) raises on MERGE/DELETE/UPDATE commits, this reader
emits them as ROW-LEVEL changes with public Delta CDF columns
(``_change_type`` in insert / update_preimage / update_postimage /
delete, plus ``_commit_version``) — the piece that makes incremental
view maintenance (:mod:`aligned_spark.operators.incremental`)
continuous: commit log → CDF stream → ``foreachBatch`` →
``IncrementalAggregate.apply_changes``. Reference anchor: the stream
worker's poll-based aggregate-maintenance loop
(``aligned/worker.py:172-209``); here the poll loop is Structured
Streaming's trigger machinery with exactly-once replay.

Semantics (matching the batch reconstruction ``DeltaLog.read_cdf`` /
``sources/cdc.py`` — the stream ≡ batch-CDC parity is
oracle-verified by the ``stream_table_cdf`` registry query):

- default start = the CURRENT snapshot emitted as ``insert`` rows at
  the pinned version, then true changes for later commits
  (delta-spark CDF default);
- ``startingVersion=N`` = changes from commit N (inclusive);
- a copy-on-write rewrite does NOT re-emit surviving rows: the
  removed parts' old content is diffed against the added parts' new
  content — keyed (the ``mergeKeys`` the commit recorded) as
  update pre/post pairs, else whole-row multiset difference
  (delete+insert, still exactly-once);
- merge-on-read commits emit exactly the rows their new position-
  delete pairs kill (read at the parent version so already-dead rows
  can't re-emit) plus their appended parts;
- compaction (``dataChange=false``) is invisible.

Scale contour: offsets are log versions (driver metadata reads);
append commits plan ONE TASK PER PART like a batch scan. A rewrite
commit that touched >= ``CHANGE_DATA_FILE_THRESHOLD`` files carries
writer-materialized ``_change_data/`` parquet (``cdc`` actions —
upstream Delta's CDF design), which both this stream and the batch
``read_cdf`` plan as plain per-file scan tasks: a giant historical
MERGE replays with full cluster parallelism. Only SMALL rewrite
commits (below the threshold, or written before the feature) fall
back to the read-time diff, which runs in one task over only the
commit's touched parts — the right bound for micro-batch-sized
commits.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

from aligned_spark.streaming.table_stream import (
    _align_batches,
    _DeltaStreamReader,
    _delta_log,
    _IcebergStreamReader,
    _sidecar_map,
    _slice_range,
)

#: CDF column names — public Delta CDF semantics; the iceberg twin
#: uses ``_snapshot_id`` (matching ``IcebergLog.read_changes``)
CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"
SNAPSHOT_ID_COL = "_snapshot_id"
_VERSION_COLS = (COMMIT_VERSION_COL, SNAPSHOT_ID_COL)


def cdf_schema(
    base: StructType, version_col: str = COMMIT_VERSION_COL
) -> StructType:
    """The stream's output schema: table columns + CDF columns."""
    return StructType(
        [
            *base.fields,
            StructField(CHANGE_TYPE_COL, StringType(), False),
            StructField(version_col, LongType(), False),
        ]
    )


class _CdfInsertPart(InputPartition):
    """One parquet part whose every (live) row is an ``insert`` at
    ``version`` — append commits and the initial snapshot."""

    def __init__(
        self,
        abs_path: str,
        partition_values: dict[str, Any],
        base_schema_json: str,
        version: int,
        rel_path: str = "",
        delete_sidecars: tuple = (),
    ):
        self.abs_path = abs_path
        self.partition_values = partition_values
        self.base_schema_json = base_schema_json
        self.version = version
        self.rel_path = rel_path
        self.delete_sidecars = delete_sidecars


class _CdfChangeFilePart(InputPartition):
    """One pre-materialized ``_change_data/`` parquet part (a ``cdc``
    action — upstream Delta's CDF design): rows already carry
    ``_change_type``; the commit's version column materializes as a
    constant. One task per change file, so a large rewrite commit's
    CDF is a plain parallel scan — never a one-task diff."""

    def __init__(
        self,
        abs_path: str,
        version_col: str,
        version: int,
    ):
        self.abs_path = abs_path
        self.version_col = version_col
        self.version = version


class _CdfDiffPart(InputPartition):
    """One rewrite commit's row-level diff: old side = touched parts
    at the parent version (parent position deletes applied), new side
    = touched parts at the commit version. ``files`` entries are
    ``(abs_path, rel_path, partition_values)``; sidecars are absolute
    paths of the side's live position-delete files."""

    def __init__(
        self,
        old_files: tuple,
        old_sidecars: tuple,
        new_files: tuple,
        new_sidecars: tuple,
        keys: tuple,
        base_schema_json: str,
        version: int,
    ):
        self.old_files = old_files
        self.old_sidecars = old_sidecars
        self.new_files = new_files
        self.new_sidecars = new_sidecars
        self.keys = keys
        self.base_schema_json = base_schema_json
        self.version = version


# ------------------------------------------------------------------
# executor-side diff (arrow; one task per rewrite commit)
# ------------------------------------------------------------------


def _side_table(files, sidecars, base_schema_json: str):
    """All live rows of one side, aligned to the table schema —
    reuses the stream reader's batch alignment (position deletes
    applied per file)."""
    import json

    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(
        StructType.fromJson(json.loads(base_schema_json))
    )
    batches = []
    for abs_path, rel_path, pvals in files:
        batches.extend(
            _align_batches(
                abs_path,
                dict(pvals),
                base_schema_json,
                rel_path,
                tuple(sidecars),
            )
        )
    return pa.Table.from_batches(batches, schema=target)


def _null_safe_eq(a, b):
    """Elementwise null-safe (and NaN-safe, matching Spark's
    ``eqNullSafe``/NaN-equality semantics) comparison → bool array
    with no nulls. Falls back to python-object comparison for types
    arrow compute can't equate (nested lists etc.)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    both_null = pc.and_(pc.is_null(a), pc.is_null(b))
    try:
        eq = pc.equal(a, b)
        if pa.types.is_floating(a.type):
            eq = pc.or_(
                eq, pc.and_(pc.is_nan(a), pc.is_nan(b))
            )
        eq = pc.fill_null(eq, False)
    except pa.ArrowNotImplementedError:
        av, bv = a.to_pylist(), b.to_pylist()
        eq = pa.array(
            [
                x is not None and _py_eq(x, y)
                for x, y in zip(av, bv)
            ],
            type=pa.bool_(),
        )
    return pc.or_(eq, both_null)


#: NaN identity sentinel: Spark's eqNullSafe / exceptAll treat NaN
#: as EQUAL to NaN (documented NaN semantics), while python equality
#: does not — every row-identity path here must agree with Spark
_NAN = object()


def _py_eq(x, y) -> bool:
    """Python-object row-value equality under Spark NaN semantics."""
    if isinstance(x, float) and isinstance(y, float):
        return x == y or (x != x and y != y)
    if isinstance(x, list) and isinstance(y, list):
        return len(x) == len(y) and all(
            (a is None and b is None)
            or (a is not None and b is not None and _py_eq(a, b))
            for a, b in zip(x, y)
        )
    return x == y


def _keyed_diff(old, new, keys: list[str], cols: list[str]):
    """Full-outer keyed diff of two arrow tables → list of
    ``(table_of_base_cols, change_type)`` — update pairs for changed
    keys, delete for vanished, insert for new; rows whose key AND
    values survive are excluded (the CDF contract)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    rest = [c for c in cols if c not in keys]
    ones = pa.array([True] * len(old), type=pa.bool_())
    o = old.select(keys + rest).rename_columns(
        keys + [f"{c}__o" for c in rest]
    ).append_column("__po", ones)
    n_ones = pa.array([True] * len(new), type=pa.bool_())
    n = new.select(keys + rest).rename_columns(
        keys + [f"{c}__n" for c in rest]
    ).append_column("__pn", n_ones)
    j = o.join(n, keys=keys, join_type="full outer")
    po = pc.fill_null(j["__po"], False)
    pn = pc.fill_null(j["__pn"], False)
    same = pa.array([True] * len(j), type=pa.bool_())
    for c in rest:
        same = pc.and_(
            same, _null_safe_eq(j[f"{c}__o"], j[f"{c}__n"])
        )
    changed = pc.and_(pc.and_(po, pn), pc.invert(same))

    def side(mask, suffix):
        sub = j.filter(mask)
        return pa.Table.from_arrays(
            [
                sub[c] if c in keys else sub[f"{c}{suffix}"]
                for c in cols
            ],
            names=cols,
        )

    out = []
    if pc.any(changed).as_py():
        out.append((side(changed, "__o"), "update_preimage"))
        out.append((side(changed, "__n"), "update_postimage"))
    deleted = pc.and_(po, pc.invert(pn))
    if pc.any(deleted).as_py():
        out.append((side(deleted, "__o"), "delete"))
    inserted = pc.and_(pn, pc.invert(po))
    if pc.any(inserted).as_py():
        out.append((side(inserted, "__n"), "insert"))
    return out


def _freeze(v):
    """Hashable stand-in for a row value (lists/maps recurse; float
    NaN maps to a sentinel so NaN rows hash equal — Spark's
    exceptAll NaN semantics)."""
    if isinstance(v, float) and v != v:
        return _NAN
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    return v


def _multiset_diff(old, new, cols: list[str]):
    """Whole-row multiset difference (``exceptAll`` both ways) for
    keyless rewrites: updates appear as delete+insert, surviving rows
    cancel — still exactly-once. Row identity is python-object
    equality over the aligned arrow values (bit-exact for floats,
    like Spark's exceptAll); nested arrays/maps hash via a frozen
    twin while the ORIGINAL values rebuild the output rows."""
    from collections import Counter

    import pyarrow as pa

    def rows(t):
        originals: dict = {}
        counter: Counter = Counter()
        for r in t.to_pylist():
            key = tuple(_freeze(r[c]) for c in cols)
            counter[key] += 1
            originals.setdefault(key, r)
        return counter, originals

    schema = old.schema
    co, oo = rows(old)
    cn, on = rows(new)
    out = []
    for counter, originals, other, ctype in (
        (co, oo, cn, "delete"),
        (cn, on, co, "insert"),
    ):
        surplus = []
        for key, k in counter.items():
            extra = k - other.get(key, 0)
            if extra > 0:
                surplus.extend([originals[key]] * extra)
        if surplus:
            out.append(
                (pa.Table.from_pylist(surplus, schema=schema), ctype)
            )
    return out


def _emit_cdf(tables, schema_json: str) -> Iterator[Any]:
    """Append the CDF columns and cast to the stream's exact arrow
    schema. ``tables`` is an iterable of
    ``(base_cols_table, change_type, version)``."""
    import json

    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(
        StructType.fromJson(json.loads(schema_json))
    )
    for tbl, ctype, version in tables:
        n = tbl.num_rows
        if not n:
            continue
        arrays = []
        for field in target:
            if field.name == CHANGE_TYPE_COL:
                arrays.append(
                    pa.array([ctype] * n, type=field.type)
                )
            elif field.name in _VERSION_COLS:
                arrays.append(
                    pa.array([version] * n, type=field.type)
                )
            else:
                col = tbl.column(field.name)
                if col.type != field.type:
                    col = pc.cast(col, field.type)
                arrays.append(col)
        yield from pa.Table.from_arrays(
            arrays, schema=target
        ).to_batches()


class DeltaCdfStreamReader(_DeltaStreamReader):
    """Streaming CDF reader. Offset machinery (version offsets,
    default-snapshot pinning, ``maxFilesPerTrigger`` admission)
    inherits from the plain reader; only planning and reading
    change."""

    def __init__(self, schema: StructType, options: dict[str, str]):
        super().__init__(schema, options)
        # the stream schema is the CDF schema; sides align to the
        # BASE table schema
        base = StructType(
            [
                f
                for f in schema.fields
                if f.name
                not in (CHANGE_TYPE_COL, COMMIT_VERSION_COL)
            ]
        )
        self._base_json = base.json()

    def _commit_splittable(self, log: Any, version: int) -> bool:
        """Only pure-append commits may split across triggers: their
        parts are independent insert tasks. A rewrite commit plans
        ONE diff unit, so it is admitted whole.

        This predicate must mirror :meth:`partitions`' pure-append
        test EXACTLY (no dataChange removes, no new delete sidecars,
        AND no dropped sidecar whose referenced data file is still
        live after the commit) — a RESTORE-style commit (re-adds +
        ``deleteFile add=false`` of a sidecar referencing a live
        file, no removes) is planned as ONE diff unit, so handing it
        a ``{version, cidx}`` split offset would make the next
        trigger's cidx resume re-emit ``adds[cidx:]`` as duplicate
        inserts."""
        del_drops: list[str] = []
        for action in log._read_commit(version):
            rm = action.get("remove")
            if rm is not None and rm.get("dataChange", True):
                return False
            dl = action.get("deleteFile")
            if dl is not None:
                if dl.get("add", True):
                    return False  # new MOR sidecar: diff commit
                del_drops.append(dl["path"])
        if not del_drops:
            return True
        # a dropped sidecar only changes rows if its data file
        # survives the commit (otherwise compaction materialized the
        # deletes — pure metadata); same rule as partitions()
        live = log.snapshot(version).files
        return not any(
            r in live for r in log._sidecar_refs(del_drops)
        )

    def _append_adds(self, log: Any, version: int) -> list[dict]:
        """Path-sorted dataChange add actions of one (append) commit
        — the stable ordering the split indices (cidx) address."""
        adds = [
            a["add"]
            for a in log._read_commit(version)
            if "add" in a and a["add"].get("dataChange", True)
        ]
        return sorted(adds, key=lambda a: a["path"])

    # ---------------------------------------------------- planning
    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from aligned_spark.sources.delta_log import Snapshot

        log = _delta_log(self._path)
        self._last_end = dict(end)
        parts: list[InputPartition] = []
        s_idx, e_idx = _slice_range(start, end)
        if e_idx:
            _, files, snap = self._snapshot_plan(
                log, end["snap_v"]
            )
            smap = _sidecar_map(self._path, snap.delete_files)
            for rel in files[s_idx:e_idx]:
                add = snap.files[rel]
                parts.append(
                    _CdfInsertPart(
                        os.path.join(self._path, rel),
                        dict(add.get("partitionValues") or {}),
                        self._base_json,
                        int(end["snap_v"]),
                        rel_path=rel,
                        delete_sidecars=smap.get(rel, ()),
                    )
                )
        start_v, end_v = int(start["version"]), int(end["version"])
        s_cidx = start.get("cidx")
        e_cidx = end.get("cidx")
        if s_cidx is not None:
            # resume the partially-planned append commit start_v
            adds = self._append_adds(log, start_v)
            hi = (
                e_cidx
                if (end_v == start_v and e_cidx is not None)
                else len(adds)
            )
            for add in adds[s_cidx:hi]:
                parts.append(
                    _CdfInsertPart(
                        os.path.join(self._path, add["path"]),
                        dict(add.get("partitionValues") or {}),
                        self._base_json,
                        start_v,
                    )
                )
        if end_v <= start_v:
            return parts
        # incremental snapshot walk — same single replay rule as
        # DeltaLog.read_cdf, O(V) for the trigger's version range
        # (startingVersion=0 streams from before the first commit)
        prev = (
            log.snapshot(start_v)
            if start_v >= 0
            else Snapshot(
                version=-1, metadata=None, files={}, txns={}
            )
        )
        for v in range(start_v + 1, end_v + 1):
            actions = log._read_commit(v)
            cur = Snapshot(
                version=v,
                metadata=prev.metadata,
                files=dict(prev.files),
                txns=dict(prev.txns),
                delete_files=dict(prev.delete_files),
            )
            log._apply_commit(cur, actions)
            adds: list[dict] = []
            removes: list[str] = []
            del_adds: list[str] = []
            del_drops: list[str] = []
            cdc_rels: list[str] = []
            keys: list[str] = []
            for action in actions:
                if "commitInfo" in action:
                    mk = (
                        action["commitInfo"]
                        .get("operationParameters", {})
                        .get("mergeKeys")
                    )
                    if mk:
                        keys = mk.split(",")
                elif "cdc" in action:
                    cdc_rels.append(action["cdc"]["path"])
                elif "deleteFile" in action:
                    if action["deleteFile"].get("add", True):
                        del_adds.append(action["deleteFile"]["path"])
                    else:
                        del_drops.append(action["deleteFile"]["path"])
                elif "add" in action:
                    if action["add"].get("dataChange", True):
                        adds.append(action["add"])
                elif "remove" in action:
                    if action["remove"].get("dataChange", True):
                        removes.append(action["remove"]["path"])
            if cdc_rels:
                # writer-materialized change files: per-file tasks,
                # full parallelism — the scale path for big rewrites
                for rel in sorted(cdc_rels):
                    parts.append(
                        _CdfChangeFilePart(
                            os.path.join(self._path, rel),
                            COMMIT_VERSION_COL,
                            v,
                        )
                    )
                prev = cur
                continue
            # only refs still LIVE after the commit change rows: a
            # dropped sidecar whose data file is gone (compaction
            # materialized the deletes) is pure metadata — same rule
            # as DeltaLog.read_cdf
            touched_refs = (
                {
                    r
                    for r in log._sidecar_refs(del_adds + del_drops)
                    if r in cur.files
                }
                if (del_adds or del_drops)
                else set()
            )
            if not removes and not del_adds and not touched_refs:
                # pure append: per-part insert tasks, batch-scan-like
                # (path-sorted so a split commit's cidx is stable)
                adds = sorted(adds, key=lambda a: a["path"])
                hi = (
                    e_cidx
                    if (v == end_v and e_cidx is not None)
                    else len(adds)
                )
                for add in adds[:hi]:
                    parts.append(
                        _CdfInsertPart(
                            os.path.join(self._path, add["path"]),
                            dict(add.get("partitionValues") or {}),
                            self._base_json,
                            v,
                        )
                    )
                prev = cur
                continue
            old_files = sorted(
                (set(removes) | touched_refs) & set(prev.files)
            )
            new_files = sorted(
                ({a["path"] for a in adds} | touched_refs)
                & set(cur.files)
            )

            def spec(snap: Snapshot, rels: list[str]) -> tuple:
                return (
                    tuple(
                        (
                            os.path.join(self._path, r),
                            r,
                            dict(
                                snap.files[r].get("partitionValues")
                                or {}
                            ),
                        )
                        for r in rels
                    ),
                    tuple(
                        os.path.join(self._path, p)
                        for p in sorted(snap.delete_files)
                    ),
                )

            of, osc = spec(prev, old_files)
            nf, nsc = spec(cur, new_files)
            # INVARIANT (r11): a rewrite commit reaching this branch
            # carries no cdc actions, which means the writer's
            # _cdc_materialize gate said no — its touched bytes are
            # < thresholdBytesLarge (default 256 MB) AND it fails the
            # (files >= 8 AND bytes >= 32 MB) small gate. So the ONE
            # _CdfDiffPart below reads < thresholdBytesLarge through
            # a single task, survivable by construction; anything
            # bigger was materialized at commit time and planned as
            # per-file _CdfChangeFilePart tasks above. Pinned by
            # test_below_threshold_rewrite_single_diff_task_bounded.
            # (External writers that never materialize are the
            # documented exception — set thresholdBytesLarge on the
            # table they write.)
            parts.append(
                _CdfDiffPart(
                    of,
                    osc,
                    nf,
                    nsc,
                    tuple(keys),
                    self._base_json,
                    v,
                )
            )
            prev = cur
        return parts

    # ---------------------------------------------------- reading
    def read(self, partition) -> Iterator[Any]:
        return read_cdf_partition(partition, self._schema_json)


def read_cdf_partition(partition, schema_json: str) -> Iterator[Any]:
    """Executor-side CDF partition read, shared by the delta and
    iceberg readers (the parts are format-agnostic: absolute file
    paths + partition values + position-delete sidecar paths)."""
    import json

    if isinstance(partition, _CdfChangeFilePart):
        # change file: base cols + _change_type in-file; the version
        # column materializes as a constant via the partition-values
        # path of the shared alignment kernel
        yield from _align_batches(
            partition.abs_path,
            {partition.version_col: partition.version},
            schema_json,
        )
        return
    if isinstance(partition, _CdfInsertPart):
        import pyarrow as pa

        base_batches = _align_batches(
            partition.abs_path,
            partition.partition_values,
            partition.base_schema_json,
            partition.rel_path,
            partition.delete_sidecars,
        )
        for rb in base_batches:
            tbl = pa.Table.from_batches([rb])
            yield from _emit_cdf(
                [(tbl, "insert", partition.version)],
                schema_json,
            )
        return
    p: _CdfDiffPart = partition
    base = StructType.fromJson(json.loads(p.base_schema_json))
    cols = [f.name for f in base.fields]
    old = _side_table(p.old_files, p.old_sidecars, p.base_schema_json)
    new = _side_table(p.new_files, p.new_sidecars, p.base_schema_json)
    keys = [k for k in p.keys]
    rest = [c for c in cols if c not in keys]
    if keys and rest:
        pieces = _keyed_diff(old, new, keys, cols)
    else:
        pieces = _multiset_diff(old, new, cols)
    yield from _emit_cdf(
        ((t, ctype, p.version) for t, ctype in pieces),
        schema_json,
    )


class IcebergCdfStreamReader(_IcebergStreamReader):
    """Iceberg twin of :class:`DeltaCdfStreamReader`: snapshot-id
    offsets inherit from the plain reader; per snapshot the file set
    is diffed against its parent's EXACTLY as the batch
    ``IcebergLog.read_changes`` does (operation ``replace`` skipped,
    ``merge-keys`` from the snapshot summary, merge-on-read pair
    kills read at the parent view), so stream ≡ batch-CDC. Version
    column: ``_snapshot_id`` (the iceberg CDC convention)."""

    def __init__(self, schema: StructType, options: dict[str, str]):
        super().__init__(schema, options)
        base = StructType(
            [
                f
                for f in schema.fields
                if f.name not in (CHANGE_TYPE_COL, SNAPSHOT_ID_COL)
            ]
        )
        self._base_json = base.json()

    def _refs(self, rels) -> set:
        """Data files referenced by position-delete sidecars —
        driver-side, reads only the small files' file_path column."""
        import pyarrow.parquet as pq

        refs: set = set()
        for rel in rels:
            try:
                refs |= set(
                    pq.read_table(
                        os.path.join(self._path, rel),
                        columns=["file_path"],
                    )["file_path"].to_pylist()
                )
            except (OSError, KeyError):  # pragma: no cover
                continue
        return refs

    def _empty_view(self, log: Any):
        from aligned_spark.sources.iceberg_log import (
            IcebergSnapshotView,
            _schema_to_spark,
        )

        md = log.current_metadata()
        return IcebergSnapshotView(
            -1, _schema_to_spark(md["schema"]), [], {}
        )

    def partitions(self, start: dict, end: dict) -> Sequence:
        from aligned_spark.streaming.table_stream import _iceberg_log

        log = _iceberg_log(self._path)
        self._check_offset(start)
        self._check_offset(end)
        self._last_end = dict(end)
        parts: list = []
        # see _IcebergStreamReader.partitions: tailing resumes from
        # the START offset's snapshot, never the pinned snap_v (that
        # override replayed consumed snapshots after the first tail
        # batch)
        tail_from = int(start["snapshot_id"])
        s_idx, e_idx = _slice_range(start, end)
        if e_idx:
            _, files, view = self._snapshot_plan(log, end["snap_v"])
            smap = _sidecar_map(self._path, view.delete_files)
            for rel in files[s_idx:e_idx]:
                rec = view.files[rel]
                parts.append(
                    _CdfInsertPart(
                        os.path.join(self._path, rel),
                        dict(rec.get("partition") or {}),
                        self._base_json,
                        int(end["snap_v"]),
                        rel_path=rel,
                        delete_sidecars=smap.get(rel, ()),
                    )
                )
        s_cidx = start.get("cidx")
        e_cidx = end.get("cidx")
        end_id = int(end["snapshot_id"])
        snaps = self._tail_snaps(log, start, end)
        if not snaps:
            return parts
        if s_cidx is not None:
            # resume a split snapshot: diff against its PARENT, not
            # against itself (the start watermark is mid-snapshot)
            md = log.current_metadata()
            sids = [s["snapshot-id"] for s in md["snapshots"]]
            i = sids.index(tail_from)
            prev = (
                log._resolve(sids[i - 1])
                if i
                else self._empty_view(log)
            )
        elif tail_from == 0:
            prev = self._empty_view(log)
        else:
            prev = log._resolve(tail_from)
        for snap in snaps:
            sid = snap["snapshot-id"]
            cur = log._resolve(sid)
            added = sorted(set(cur.files) - set(prev.files))
            removed = sorted(set(prev.files) - set(cur.files))
            new_del = sorted(
                set(cur.delete_files) - set(prev.delete_files)
            )
            old_view, prev = prev, cur
            if not added and not removed and not new_del:
                continue
            if snap.get("summary", {}).get("operation") == "replace":
                continue  # compaction — no logical row changes
            cdf_dir = snap.get("summary", {}).get("change-data-dir")
            if cdf_dir:
                # commit-time change files: per-file tasks, full
                # parallelism — same scale path as the delta reader
                absdir = os.path.join(self._path, cdf_dir)
                for name in sorted(os.listdir(absdir)):
                    if not name.endswith(".parquet"):
                        continue
                    parts.append(
                        _CdfChangeFilePart(
                            os.path.join(absdir, name),
                            SNAPSHOT_ID_COL,
                            sid,
                        )
                    )
                continue
            mk = snap.get("summary", {}).get("merge-keys")
            keys = tuple(mk.split(",")) if mk else ()
            if not removed and not new_del:
                # pure append: per-file insert tasks. `added` is
                # path-sorted, so an oversized snapshot's cidx slices
                # address the SAME ordering across triggers/replays
                lo = (
                    s_cidx
                    if (sid == tail_from and s_cidx is not None)
                    else 0
                )
                hi = (
                    e_cidx
                    if (sid == end_id and e_cidx is not None)
                    else len(added)
                )
                for rel in added[lo:hi]:
                    parts.append(
                        _CdfInsertPart(
                            os.path.join(self._path, rel),
                            dict(
                                cur.files[rel].get("partition") or {}
                            ),
                            self._base_json,
                            sid,
                        )
                    )
                continue
            touched = {
                r for r in self._refs(new_del) if r in cur.files
            }
            old_files = sorted(
                (set(removed) | touched) & set(old_view.files)
            )
            new_files = sorted((set(added) | touched) & set(cur.files))

            def spec(view, rels):
                return (
                    tuple(
                        (
                            os.path.join(self._path, r),
                            r,
                            dict(
                                view.files[r].get("partition") or {}
                            ),
                        )
                        for r in rels
                    ),
                    tuple(
                        os.path.join(self._path, p)
                        for p in sorted(view.delete_files)
                    ),
                )

            of, osc = spec(old_view, old_files)
            nf, nsc = spec(cur, new_files)
            parts.append(
                _CdfDiffPart(
                    of, osc, nf, nsc, keys, self._base_json, sid
                )
            )
        return parts

    def read(self, partition) -> Iterator[Any]:
        return read_cdf_partition(partition, self._schema_json)
