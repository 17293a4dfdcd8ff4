"""Native Spark streaming source over the engine's pure-Python Delta
and Iceberg tables (PySpark Python Data Source API).

``spark.readStream.format("aligned_table")`` tails a table's commit
log with version-based offsets — the same role delta-spark's
streaming source / Iceberg's streaming read play (reference ingest
loop: ``aligned/worker.py:150-242`` polls a source and feeds the
contract pipeline; here the poll loop IS Structured Streaming's
trigger machinery, so checkpointing, exactly-once replay, watermarks
and every downstream streaming operator come for free).

Scale design:
- **Offsets are log versions, not row positions.** ``latestOffset``
  and ``partitions`` are driver-side metadata reads (a handful of
  JSON/Avro files per trigger); no data is touched until executors
  read their assigned parts.
- **One input partition per parquet part** — reads parallelize
  across the cluster exactly like a batch scan of the same files,
  and a 100-file commit becomes a 100-task micro-batch.
- **Replay-deterministic**: the commit log is immutable, so
  ``partitions(start, end)`` always plans the same file set — a
  recovered query re-reads exactly the rows of the failed batch
  (exactly-once with the engine's idempotent sinks,
  ``streaming/sinks.py``).
- **Admission control**: ``max_files_per_trigger`` caps each
  micro-batch, including while serving the initial snapshot (≥1
  file / ≥1 version per trigger so the stream always advances).

Semantics match delta-spark's streaming source:

- **Default start = the current snapshot, then tail.** With no
  ``startingVersion`` the first micro-batch(es) serve the table's
  LIVE rows at stream start (merge-on-read position deletes
  applied), and only commits AFTER that snapshot are tailed — so a
  table with a historical overwrite/MERGE/DELETE streams fine at
  defaults. ``startingVersion=0`` explicitly replays the full
  history; ``startingVersion=latest`` skips existing rows and
  tails.
- While tailing, append commits only: a commit that removes or
  rewrites live rows (MERGE/DELETE/UPDATE, copy-on-write or
  merge-on-read) raises unless ``ignoreChanges`` is set, in which
  case its re-added rows are emitted (consumers dedup on keys —
  documented delta behavior). For true row-level change streaming
  use ``readChangeFeed`` (:mod:`aligned_spark.streaming.cdf_stream`).
- Compaction commits (``dataChange=false`` / Iceberg ``replace``)
  are invisible, as they change no rows.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "aligned_table"


@dataclass
class _PartFile(InputPartition):
    """One parquet part of a micro-batch. ``partition_values`` carries
    hive partition-column values (absent from the file itself);
    ``schema_json`` is the stream's output StructType. Initial-snapshot
    parts of a merge-on-read table additionally carry ``rel_path`` and
    the snapshot's position-delete sidecars (absolute paths) so the
    executor can drop dead rows."""

    abs_path: str
    partition_values: dict[str, Any]
    schema_json: str
    rel_path: str = ""
    delete_sidecars: tuple = ()


def _delta_log(path: str):
    from aligned_spark.sources.delta_log import DeltaLog

    return DeltaLog(path)


def _iceberg_log(path: str):
    from aligned_spark.sources.iceberg_log import IcebergLog

    return IcebergLog(path)


#: sidecar count above which snapshot planning switches from exact
#: column reads to footer-stats range mapping — keeps the planner
#: light as MOR state grows between compactions (r9 VERDICT note 5;
#: a Spark job is not an option here: the Python streaming source
#: planner runs in a worker process with no SparkSession)
SIDECAR_FOOTER_THRESHOLD = 64


class _SidecarRangeMap:
    """Footer-stats sidecar map: sidecar → [min, max] ``file_path``
    range from its parquet footer (sidecars are range-clustered by
    file_path at write time, so ranges are near-disjoint). ``get``
    returns a SOUND SUPERSET of the exact referencing sidecars —
    executors drop non-matching pairs per file anyway
    (:func:`_dead_positions` filters on file_path). Backward scan
    stops at the running-max-hi prefix bound, so lookups cost
    O(matches) for near-disjoint ranges."""

    def __init__(self, ranges, always):
        import bisect  # noqa: F401

        self._ranges = sorted(ranges)  # (lo, hi, abs_path)
        self._los = [r[0] for r in self._ranges]
        self._max_hi = []
        run = ""
        for _, hi, _p in self._ranges:
            run = max(run, hi)
            self._max_hi.append(run)
        #: sidecars with no usable stats attach to every file (sound)
        self._always = tuple(always)

    def get(self, rel: str, default=()):
        import bisect

        out = list(self._always)
        i = bisect.bisect_right(self._los, rel) - 1
        while i >= 0 and self._max_hi[i] >= rel:
            lo, hi, p = self._ranges[i]
            if hi >= rel:
                out.append(p)
            i -= 1
        return tuple(out) if out else default


def _sidecar_map(
    table_path: str,
    delete_files,
    footer_threshold: int | None = None,
):
    """rel data-file path → absolute position-delete sidecars that
    (may) REFERENCE it. Below the threshold: exact — one read of
    each small sidecar's ``file_path`` column. Above: footer-stats
    ranges only (:class:`_SidecarRangeMap`) — O(sidecars) metadata
    reads with zero column data, trading exactness for a sound
    superset so planning stays cheap however much MOR state has
    accumulated. Snapshot-slice planning attaches only a part's own
    (candidate) sidecars, so executor sidecar I/O stays O(relevant
    pairs), not O(files x sidecars). An unreadable sidecar raises
    (attaching nothing would resurrect its dead rows; the batch scan
    fails the same way)."""
    import pyarrow.parquet as pq

    if footer_threshold is None:
        footer_threshold = int(
            os.environ.get(
                "ALIGNED_SIDECAR_FOOTER_THRESHOLD",
                SIDECAR_FOOTER_THRESHOLD,
            )
        )
    rels = sorted(delete_files)
    if len(rels) > footer_threshold:
        ranges: list[tuple[str, str, str]] = []
        always: list[str] = []
        for rel in rels:
            absd = os.path.join(table_path, rel)
            md = pq.ParquetFile(absd)
            idx = md.schema_arrow.names.index("file_path")
            lo = hi = None
            ok = True
            for rg in range(md.metadata.num_row_groups):
                st = md.metadata.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if ok and lo is not None:
                ranges.append((lo, hi, absd))
            else:
                always.append(absd)
        return _SidecarRangeMap(ranges, always)
    out: dict[str, list[str]] = {}
    for rel in rels:
        absd = os.path.join(table_path, rel)
        refs = set(
            pq.read_table(absd, columns=["file_path"])[
                "file_path"
            ].to_pylist()
        )
        for r in refs:
            out.setdefault(r, []).append(absd)
    return {k: tuple(v) for k, v in out.items()}


def _slice_range(start: dict, end: dict) -> "tuple[int, int]":
    """The initial-snapshot file-index window to plan for this batch
    — THE shared guard for all four stream readers (delta/iceberg ×
    plain/CDF), so its two subtleties live in exactly one place:
    the slice is driven by the END offset's progress but only counts
    from the START's index when both pin the SAME snapshot (an old
    checkpoint or a fabricated fallback offset must never replant a
    different snapshot's files), and (0, 0) means nothing to plan.
    Tailing, by contrast, always resumes from the START offset's
    version/snapshot watermark — never the pinned snap_v."""
    if "snap_v" not in end:
        return (0, 0)
    same = start.get("snap_v") == end["snap_v"]
    s_idx = int(start.get("idx", 0)) if same else 0
    e_idx = int(end.get("idx", 0))
    return (s_idx, e_idx) if e_idx > s_idx else (0, 0)


def _dead_positions(
    sidecars: Sequence[str], rel_path: str
) -> "set[int]":
    """Row positions of ``rel_path`` killed by the given position-
    delete sidecar files — executor-side, reads only the (small)
    sidecars' two columns."""
    import pyarrow.parquet as pq

    dead: set[int] = set()
    for p in sidecars:
        try:
            t = pq.read_table(p, columns=["file_path", "pos"])
        except (OSError, KeyError):  # pragma: no cover - corrupt
            continue
        import pyarrow.compute as pc

        mask = pc.equal(t["file_path"], rel_path)
        dead.update(t.filter(mask)["pos"].to_pylist())
    return dead


def _align_batches(
    abs_path: str,
    partition_values: dict[str, Any],
    schema_json: str,
    rel_path: str = "",
    delete_sidecars: Sequence[str] = (),
) -> Iterator[Any]:
    """Executor-side: stream a parquet part as arrow batches aligned
    to the table schema — missing (schema-evolved) columns project
    null, partition columns materialize from the log's metadata, and
    everything casts to the exact arrow types Spark expects. When
    ``delete_sidecars`` is given, rows at positions the sidecars kill
    for ``rel_path`` are dropped (merge-on-read snapshot read)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = StructType.fromJson(json.loads(schema_json))
    target = to_arrow_schema(spark_schema)

    dead = (
        _dead_positions(delete_sidecars, rel_path)
        if delete_sidecars
        else set()
    )
    dead_arr = (
        np.fromiter(dead, dtype=np.int64) if dead else None
    )

    pf = pq.ParquetFile(abs_path)
    present = set(pf.schema_arrow.names)
    read_cols = [n for n in target.names if n in present]
    offset = 0
    for rb in pf.iter_batches(columns=read_cols):
        n = rb.num_rows
        tbl = pa.Table.from_batches([rb])
        if dead_arr is not None:
            keep = ~np.isin(
                np.arange(offset, offset + n, dtype=np.int64),
                dead_arr,
            )
            tbl = tbl.filter(pa.array(keep))
        offset += n
        m = tbl.num_rows
        arrays = []
        for field in target:
            if field.name in present:
                arr = tbl.column(field.name)
                if arr.type != field.type:
                    arr = pc.cast(arr, field.type)
            elif field.name in partition_values:
                v = partition_values[field.name]
                if v is None:
                    arr = pa.nulls(m, field.type)
                else:
                    # delta partitionValues are hive strings; iceberg
                    # manifest values are native — cast handles both
                    arr = pc.cast(pa.array([v] * m), field.type)
            else:
                arr = pa.nulls(m, field.type)
            arrays.append(arr)
        out = pa.Table.from_arrays(arrays, schema=target)
        yield from out.to_batches()


class _DeltaStreamReader(DataSourceStreamReader):
    """Offsets: ``{"version": v}`` — last commit version PLANNED
    (inclusive). A default-start (snapshot-first) stream adds
    ``{"snap_v": v0, "idx": k}``: the initial snapshot is pinned at
    version ``v0`` and ``k`` of its (sorted) live files have been
    planned; tailing resumes at ``v0 + 1`` once ``k`` reaches the
    file count. An oversized SPLITTABLE commit (a pure append whose
    file count exceeds the remaining ``maxFilesPerTrigger`` budget)
    is served across triggers via ``{"version": v, "cidx": k}`` —
    commit ``v`` planned through its first ``k`` path-sorted add
    files — so a 10k-file bulk append never lands as one micro-batch.
    All methods here run driver-side; only :meth:`read` runs on
    executors."""

    def __init__(self, schema: StructType, options: dict[str, str]):
        self._path = options["path"]
        self._schema_json = schema.json()
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        mft = options.get("maxfilespertrigger")
        self._max_files = int(mft) if mft else None
        self._starting = options.get("startingversion")
        self._last_end: dict | None = None
        #: (v0, sorted live rel paths, snapshot) — driver-side memo of
        #: the pinned initial snapshot; deterministic from the
        #: immutable log, so replay re-plans the same slices
        self._snap_cache: tuple | None = None

    # -------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        log = _delta_log(self._path)
        if self._starting is None:
            # delta-spark default: serve the CURRENT snapshot as the
            # initial batch(es), then tail commits after it
            v0 = log.latest_version()
            off = {"version": v0, "snap_v": v0, "idx": 0}
        elif str(self._starting).lower() == "latest":
            off = {"version": log.latest_version()}
        else:
            off = {"version": int(self._starting) - 1}
        if self._last_end is None:
            # seed the throttle state so the FIRST latestOffset of a
            # fresh query applies admission control to the initial
            # backlog; never clobber progression partitions() seeded
            self._last_end = dict(off)
        return off

    def _snapshot_plan(self, log: Any, v0: int) -> tuple:
        if self._snap_cache is None or self._snap_cache[0] != v0:
            snap = log.snapshot(v0)
            self._snap_cache = (v0, sorted(snap.files), snap)
        return self._snap_cache

    def latestOffset(self) -> dict:
        log = _delta_log(self._path)
        latest = log.latest_version()
        last = self._last_end
        if last is None:
            # Spark calls latestOffset BEFORE initialOffset on a
            # fresh query (observed runner order), and restarts
            # re-plan the last batch via partitions() first — so a
            # None state here always means fresh-query semantics
            last = self.initialOffset()
        end = dict(last)
        budget = self._max_files
        took = False
        if "snap_v" in end:
            _, files, _ = self._snapshot_plan(log, end["snap_v"])
            n = len(files)
            if end["idx"] < n:
                want = n - end["idx"]
                take = want if budget is None else max(
                    1, min(budget, want)
                )
                end["idx"] += take
                took = True
                if budget is not None:
                    budget -= take
                    if end["idx"] < n or budget <= 0:
                        self._last_end = end
                        return dict(end)
        v = end["version"]
        cidx = end.get("cidx")
        if cidx is not None:
            # finish the partially-planned commit v first
            n = len(self._commit_adds(log, v)[0])
            want = n - cidx
            if want > 0:
                take = want if budget is None else max(
                    1, min(budget, want)
                )
                cidx += take
                took = True
                if budget is not None:
                    budget -= take
            if cidx < n:
                end["cidx"] = cidx
                self._last_end = end
                return dict(end)
            end.pop("cidx", None)
            if budget is not None and budget <= 0:
                self._last_end = end
                return dict(end)
        while v < latest:
            n_files = len(self._commit_adds(log, v + 1)[0])
            if budget is not None and n_files > budget:
                if self._commit_splittable(log, v + 1):
                    # start the oversized append commit: plan its
                    # first `budget` path-sorted files, carry the
                    # rest to later triggers via cidx
                    end["version"] = v + 1
                    end["cidx"] = budget
                    self._last_end = end
                    return dict(end)
                if took:
                    break
                # oversized UNSPLITTABLE commit (e.g. a CDF rewrite
                # diff, one planning unit): take it whole — the
                # stream must advance ≥1 commit per trigger
            v += 1
            took = True
            if budget is not None:
                budget -= n_files
                if budget <= 0:
                    break
        end["version"] = v
        self._last_end = end
        return dict(end)

    # -------------------------------------------------- planning
    def _commit_adds(
        self, log: Any, version: int
    ) -> tuple[list[dict[str, Any]], bool]:
        """(dataChange add actions, commit-rewrites-live-rows)."""
        adds: list[dict[str, Any]] = []
        changes = False
        for action in log._read_commit(version):
            add = action.get("add")
            if add is not None and add.get("dataChange", True):
                adds.append(add)
            rm = action.get("remove")
            if rm is not None and rm.get("dataChange", True):
                changes = True
            dl = action.get("deleteFile")
            if dl is not None and dl.get("add", True):
                # new MOR position-delete sidecar = row-level deletes
                changes = True
        return adds, changes

    def _commit_splittable(self, log: Any, version: int) -> bool:
        """Whether an oversized commit may be served across several
        triggers by slicing its path-sorted add files. The plain
        reader plans every add as an independent part, so always —
        a rewrite commit either raised already or (ignoreChanges)
        emits its re-added rows per file anyway."""
        return True

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
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
                    _PartFile(
                        os.path.join(self._path, rel),
                        dict(add.get("partitionValues") or {}),
                        self._schema_json,
                        rel_path=rel,
                        delete_sidecars=smap.get(rel, ()),
                    )
                )
        start_v, end_v = int(start["version"]), int(end["version"])
        s_cidx = start.get("cidx")
        e_cidx = end.get("cidx")
        first_commit = start_v if s_cidx is not None else start_v + 1
        for v in range(first_commit, end_v + 1):
            adds, changes = self._commit_adds(log, v)
            if changes and not self._ignore_changes:
                raise ValueError(
                    f"Delta commit {v} of {self._path} updates or "
                    "deletes existing rows; streaming reads require "
                    "append-only commits. Set ignoreChanges=true to "
                    "receive re-added rows instead (dedup on keys "
                    "downstream), or stream the change feed with "
                    "readChangeFeed=true."
                )
            # path-sorted: the split indices (cidx) must address the
            # SAME ordering across triggers and replays
            adds = sorted(adds, key=lambda a: a["path"])
            lo = s_cidx if (v == start_v and s_cidx is not None) else 0
            hi = (
                e_cidx
                if (v == end_v and e_cidx is not None)
                else len(adds)
            )
            for add in adds[lo:hi]:
                parts.append(
                    _PartFile(
                        os.path.join(self._path, add["path"]),
                        dict(add.get("partitionValues") or {}),
                        self._schema_json,
                    )
                )
        return parts

    # -------------------------------------------------- reading
    def read(self, partition: _PartFile) -> Iterator[Any]:
        return _align_batches(
            partition.abs_path,
            partition.partition_values,
            partition.schema_json,
            partition.rel_path,
            partition.delete_sidecars,
        )

    def commit(self, end: dict) -> None:
        pass


class _IcebergStreamReader(DataSourceStreamReader):
    """Offsets: ``{"snapshot_id": id}`` (0 = before the first
    snapshot). Default start mirrors the delta reader: the CURRENT
    snapshot's live files (position deletes applied) are the initial
    batch(es) — ``{"snap_v": id, "idx": k}`` pins the snapshot and
    counts its (sorted) planned files, so ``maxFilesPerTrigger``
    slices a 100 TB initial snapshot across triggers exactly like
    the delta reader instead of serving it as one giant micro-batch.
    While tailing, the same budget admits whole snapshots by their
    ADDED-data-file counts (manifest metadata reads; ≥1 snapshot per
    trigger so the stream always advances), and an oversized
    SPLITTABLE snapshot (a pure append whose ADDED-file count
    exceeds the remaining budget) is served across triggers via
    ``{"snapshot_id": sid, "cidx": k}`` — snapshot ``sid`` planned
    through its first ``k`` path-sorted added files — so a 10k-file
    Iceberg bulk append never lands as one micro-batch (r11; the
    delta ``cidx`` mechanism). A consumed snapshot that was since
    expired raises — the consumer's history is gone, same failure
    mode as Iceberg's own streaming read.

    Offset format is VERSIONED from r11: every emitted offset
    carries ``"fmt": 2``. Before r10 a default-start checkpoint used
    ``idx: 1`` to mean "whole snapshot planned"; ``idx`` then
    changed to count planned FILES without a marker — so an
    UNVERSIONED offset carrying ``idx >= 1`` is ambiguous and now
    raises instead of silently re-serving files (pre-r10 checkpoints
    must restart fresh; unversioned offsets without ``idx`` are
    unambiguous and stay accepted)."""

    def __init__(self, schema: StructType, options: dict[str, str]):
        self._path = options["path"]
        self._schema_json = schema.json()
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._starting = options.get("startingsnapshotid")
        #: EXCLUSIVE start: tail only snapshots AFTER this id. The
        #: inclusive ``startingSnapshotId`` cannot express "everything
        #: the table commits from now on" before those snapshots exist
        #: — this can, so a consumer may open the stream concurrently
        #: with the producer's commits (the stream's startup cost then
        #: overlaps the producer's jobs instead of serializing after
        #: them) and drain exactly the post-``afterSnapshotId`` feed.
        self._after = options.get("aftersnapshotid")
        if self._starting is not None and self._after is not None:
            raise ValueError(
                "startingSnapshotId and afterSnapshotId are mutually "
                "exclusive"
            )
        mft = options.get("maxfilespertrigger")
        self._max_files = int(mft) if mft else None
        self._last_end: dict | None = None
        #: (snap_id, sorted live rel paths, view) — driver-side memo
        #: of the pinned initial snapshot (deterministic from the
        #: immutable metadata, so replay re-plans the same slices)
        self._snap_cache: tuple | None = None
        #: snapshot id -> ADDED data-file count (manifest reads memo)
        self._count_cache: dict[int, int] = {}

    #: offset format version stamped on every emitted offset (r11;
    #: 1 = the implicit unversioned formats of r9/r10)
    OFFSET_FMT = 2

    @staticmethod
    def _check_offset(off: dict) -> dict:
        """Fail fast on ambiguous UNVERSIONED offsets: pre-r10
        checkpoints used ``idx: 1`` for "whole snapshot planned",
        r10 reinterpreted ``idx`` as a planned-file count without a
        marker — silently re-planning such an offset re-serves every
        snapshot file past the first (duplicate rows, not an
        error). ``cidx`` never existed unversioned."""
        if "fmt" not in off and (
            int(off.get("idx") or 0) >= 1 or "cidx" in off
        ):
            raise ValueError(
                f"unversioned iceberg stream offset {off!r} carries "
                "a planned-file index whose meaning changed across "
                "releases (pre-r10 'idx: 1' meant the WHOLE snapshot "
                "was planned; it now counts files) — re-planning it "
                "would duplicate rows. Restart the query from a "
                "fresh checkpoint."
            )
        return off

    def initialOffset(self) -> dict:
        log = _iceberg_log(self._path)
        ids = log.snapshot_ids()
        if self._after is not None:
            sid = int(self._after)
            if sid != 0 and sid not in ids:
                raise ValueError(
                    f"unknown afterSnapshotId {sid}"
                )
            # the given snapshot IS the consumed watermark: tailing
            # resumes at the next snapshot (0 = before the first)
            off = {"snapshot_id": sid, "fmt": self.OFFSET_FMT}
            if self._last_end is None:
                self._last_end = dict(off)
            return off
        if self._starting is None:
            cur = ids[-1] if ids else 0
            off = (
                {"snapshot_id": cur, "snap_v": cur, "idx": 0}
                if cur
                else {"snapshot_id": 0}
            )
        elif str(self._starting).lower() == "latest":
            off = {"snapshot_id": ids[-1] if ids else 0}
        else:
            sid = int(self._starting)
            if sid not in ids:
                raise ValueError(
                    f"unknown starting snapshot id {sid}"
                )
            # startingSnapshotId is INCLUSIVE (iceberg convention):
            # the offset is the snapshot before it
            i = ids.index(sid)
            off = {"snapshot_id": ids[i - 1] if i else 0}
        off["fmt"] = self.OFFSET_FMT
        if self._last_end is None:
            self._last_end = dict(off)
        return off

    def _snapshot_by_id(self, log: Any, sid: int) -> dict:
        for s in log.current_metadata()["snapshots"]:
            if s["snapshot-id"] == sid:
                return s
        raise ValueError(
            f"streaming offset snapshot {sid} of {self._path} has "
            "been expired; restart the query from a live snapshot"
        )

    def _snapshot_splittable(self, snap: dict) -> bool:
        """Only pure-append snapshots may be served across triggers
        by slicing their path-sorted ADDED files: each added file is
        an independent insert task. Every other operation
        (overwrite/delete/replace, incl. change-data commits) is one
        planning unit and admits whole — the same rule as the delta
        readers' `_commit_splittable`."""
        return snap.get("summary", {}).get("operation") == "append"

    def _snapshot_plan(self, log: Any, sid: int) -> tuple:
        if self._snap_cache is None or self._snap_cache[0] != sid:
            view = log._resolve(sid)
            self._snap_cache = (sid, sorted(view.files), view)
        return self._snap_cache

    def _added_count(self, log: Any, snap: dict) -> int:
        """ADDED data files of one snapshot — the tail-admission
        unit. Driver-side manifest metadata reads, memoized (the
        planner reads the same manifests again)."""
        from aligned_spark.sources.avro_io import read_container
        from aligned_spark.sources.iceberg_log import ADDED

        sid = snap["snapshot-id"]
        if sid in self._count_cache:
            return self._count_cache[sid]
        n = 0
        _, manifests = read_container(
            os.path.join(self._path, snap["manifest-list"])
        )
        for m in manifests:
            if m["added_snapshot_id"] != sid:
                continue
            if m.get("content", 0) == 1:  # position deletes
                continue
            _, entries = read_container(
                os.path.join(self._path, m["manifest_path"])
            )
            n += sum(1 for e in entries if e["status"] == ADDED)
        self._count_cache[sid] = n
        return n

    def latestOffset(self) -> dict:
        log = _iceberg_log(self._path)
        ids = log.snapshot_ids()
        latest = ids[-1] if ids else 0
        last = self._last_end
        if last is None:
            # same runner-order rule as the delta reader: None state
            # = fresh query; restarts re-seed via partitions()
            last = self.initialOffset()
        end = dict(self._check_offset(last))
        end["fmt"] = self.OFFSET_FMT
        budget = self._max_files
        took = False
        if "snap_v" in end:
            _, files, _ = self._snapshot_plan(log, end["snap_v"])
            n = len(files)
            if end["idx"] < n:
                want = n - end["idx"]
                take = want if budget is None else max(
                    1, min(budget, want)
                )
                end["idx"] += take
                took = True
                if budget is not None:
                    budget -= take
                    if end["idx"] < n or budget <= 0:
                        self._last_end = end
                        return dict(end)
        cur = int(end["snapshot_id"])
        cidx = end.get("cidx")
        if cidx is not None:
            # finish the partially-planned split snapshot first
            n = self._added_count(log, self._snapshot_by_id(log, cur))
            want = n - cidx
            if want > 0:
                take = want if budget is None else max(
                    1, min(budget, want)
                )
                cidx += take
                took = True
                if budget is not None:
                    budget -= take
            if cidx < n:
                end["cidx"] = cidx
                self._last_end = end
                return dict(end)
            end.pop("cidx", None)
            if budget is not None and budget <= 0:
                self._last_end = end
                return dict(end)
        if cur != latest:
            md = log.current_metadata()
            snaps = md["snapshots"]
            sids = [s["snapshot-id"] for s in snaps]
            if cur == 0:
                pos = 0
            elif cur in sids:
                pos = sids.index(cur) + 1
            else:
                raise ValueError(
                    f"streaming offset snapshot {cur} of "
                    f"{self._path} has been expired; restart the "
                    "query from a live snapshot"
                )
            while pos < len(sids):
                n_files = self._added_count(log, snaps[pos])
                if budget is not None and n_files > budget:
                    if self._snapshot_splittable(snaps[pos]):
                        # start the oversized append snapshot: plan
                        # its first `budget` path-sorted added files,
                        # carry the rest to later triggers via cidx
                        end["snapshot_id"] = sids[pos]
                        end["cidx"] = budget
                        self._last_end = end
                        return dict(end)
                    if took:
                        break
                    # oversized UNSPLITTABLE snapshot (rewrite = one
                    # planning unit): take it whole — the stream
                    # must advance ≥1 snapshot per trigger
                cur = sids[pos]
                pos += 1
                took = True
                if budget is not None:
                    budget -= n_files
                    if budget <= 0:
                        break
            end["snapshot_id"] = cur
        self._last_end = end
        return dict(end)

    def _range(self, log: Any, start_id: int, end_id: int) -> list[dict]:
        md = log.current_metadata()
        snaps = md["snapshots"]
        ids = [s["snapshot-id"] for s in snaps]
        if end_id == 0:
            return []
        if start_id == 0:
            lo = 0
        elif start_id in ids:
            lo = ids.index(start_id) + 1
        else:
            raise ValueError(
                f"streaming offset snapshot {start_id} of "
                f"{self._path} has been expired; restart the query "
                "from a live snapshot"
            )
        hi = ids.index(end_id) + 1
        return snaps[lo:hi]

    def _added_records(self, log: Any, snap: dict) -> list[dict]:
        """Path-sorted ADDED data-file records of one snapshot — the
        stable ordering the split indices (cidx) address across
        triggers and replays."""
        from aligned_spark.sources.avro_io import read_container
        from aligned_spark.sources.iceberg_log import ADDED

        recs: list[dict] = []
        _, manifests = read_container(
            os.path.join(self._path, snap["manifest-list"])
        )
        for m in manifests:
            if m["added_snapshot_id"] != snap["snapshot-id"]:
                continue
            if m.get("content", 0) == 1:  # position deletes
                continue
            _, entries = read_container(
                os.path.join(self._path, m["manifest_path"])
            )
            recs.extend(
                e["data_file"]
                for e in entries
                if e["status"] == ADDED
            )
        return sorted(recs, key=lambda r: r["file_path"])

    def _tail_snaps(
        self, log: Any, start: dict, end: dict
    ) -> list[dict]:
        """Snapshot dicts one batch plans while tailing: the
        (tail_from, end] range, PLUS tail_from itself when the start
        offset carries a cidx resume (the snapshot was partially
        planned by an earlier trigger)."""
        tail_from = int(start["snapshot_id"])
        snaps = self._range(log, tail_from, int(end["snapshot_id"]))
        if start.get("cidx") is not None:
            snaps = [self._snapshot_by_id(log, tail_from)] + snaps
        return snaps

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        log = _iceberg_log(self._path)
        self._check_offset(start)
        self._check_offset(end)
        self._last_end = dict(end)
        parts: list[InputPartition] = []
        # tailing ALWAYS resumes from the start offset's snapshot —
        # start.snapshot_id equals snap_v on the snapshot-serving
        # batch and the true consumed watermark afterwards (an
        # end-side snap_v override here replayed already-consumed
        # snapshots on every later batch)
        tail_from = int(start["snapshot_id"])
        s_idx, e_idx = _slice_range(start, end)
        if e_idx:
            _, files, view = self._snapshot_plan(log, end["snap_v"])
            smap = _sidecar_map(self._path, view.delete_files)
            for rel in files[s_idx:e_idx]:
                rec = view.files[rel]
                parts.append(
                    _PartFile(
                        os.path.join(self._path, rel),
                        dict(rec.get("partition") or {}),
                        self._schema_json,
                        rel_path=rel,
                        delete_sidecars=smap.get(rel, ()),
                    )
                )
        s_cidx = start.get("cidx")
        e_cidx = end.get("cidx")
        end_id = int(end["snapshot_id"])
        for snap in self._tail_snaps(log, start, end):
            sid = snap["snapshot-id"]
            op = snap.get("summary", {}).get("operation")
            if op == "replace":  # compaction: no row changes
                continue
            if op != "append" and not self._ignore_changes:
                raise ValueError(
                    f"Iceberg snapshot {sid} of "
                    f"{self._path} is a {op!r} commit; streaming "
                    "reads require append-only snapshots. Set "
                    "ignoreChanges=true to receive re-added rows."
                )
            recs = self._added_records(log, snap)
            lo = (
                s_cidx
                if (sid == tail_from and s_cidx is not None)
                else 0
            )
            hi = (
                e_cidx
                if (sid == end_id and e_cidx is not None)
                else len(recs)
            )
            for df_rec in recs[lo:hi]:
                parts.append(
                    _PartFile(
                        os.path.join(
                            self._path, df_rec["file_path"]
                        ),
                        dict(df_rec.get("partition") or {}),
                        self._schema_json,
                    )
                )
        return parts

    def read(self, partition: _PartFile) -> Iterator[Any]:
        return _align_batches(
            partition.abs_path,
            partition.partition_values,
            partition.schema_json,
            partition.rel_path,
            partition.delete_sidecars,
        )

    def commit(self, end: dict) -> None:
        pass


class TableStreamDataSource(DataSource):
    """``format("aligned_table")`` — streaming reads over the
    engine's Delta/Iceberg logs.

    Options: ``path`` (table root, required), ``format`` ("delta"
    default | "iceberg"), ``startingVersion`` (delta: int | "latest";
    unset = current snapshot first, then tail), ``startingSnapshotId``
    (iceberg: int, inclusive | "latest"; unset = current snapshot
    first), ``afterSnapshotId`` (iceberg: int, EXCLUSIVE — tail only
    snapshots after it; 0 = the whole history; usable before the
    tailed snapshots exist, so the stream can start concurrently with
    the producer), ``ignoreChanges``, ``maxFilesPerTrigger`` (both formats:
    slices the initial snapshot across triggers, admits tail commits/
    snapshots by file count, and — delta — splits oversized append
    commits by file index), ``readChangeFeed`` (both formats: stream
    row-level changes with ``_change_type`` +
    ``_commit_version``/``_snapshot_id`` columns)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _opts(self) -> dict[str, str]:
        return {str(k).lower(): v for k, v in self.options.items()}

    def _cdf(self, opts: dict[str, str]) -> bool:
        return (
            str(opts.get("readchangefeed", "false")).lower() == "true"
        )

    def schema(self) -> StructType:
        opts = self._opts()
        path = opts.get("path")
        if not path:
            raise ValueError("aligned_table requires option 'path'")
        fmt = opts.get("format", "delta").lower()
        if fmt == "delta":
            schema = _delta_log(path).snapshot().schema()
            if schema is None:
                raise ValueError(f"Delta table has no metaData: {path}")
            if self._cdf(opts):
                from aligned_spark.streaming.cdf_stream import (
                    cdf_schema,
                )

                return cdf_schema(schema)
            return schema
        if fmt == "iceberg":
            from aligned_spark.sources.iceberg_log import _schema_to_spark

            log = _iceberg_log(path)
            md = log.current_metadata()
            cur = md["current-schema-id"]
            ice = next(
                s for s in md["schemas"] if s["schema-id"] == cur
            )
            base = _schema_to_spark(ice)
            if self._cdf(opts):
                from aligned_spark.streaming.cdf_stream import (
                    SNAPSHOT_ID_COL,
                    cdf_schema,
                )

                return cdf_schema(base, SNAPSHOT_ID_COL)
            return base
        raise ValueError(f"unknown table format {fmt!r}")

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        opts = self._opts()
        fmt = opts.get("format", "delta").lower()
        if fmt == "delta":
            if self._cdf(opts):
                from aligned_spark.streaming.cdf_stream import (
                    DeltaCdfStreamReader,
                )

                return DeltaCdfStreamReader(schema, opts)
            return _DeltaStreamReader(schema, opts)
        if fmt == "iceberg":
            if self._cdf(opts):
                from aligned_spark.streaming.cdf_stream import (
                    IcebergCdfStreamReader,
                )

                return IcebergCdfStreamReader(schema, opts)
            return _IcebergStreamReader(schema, opts)
        raise ValueError(f"unknown table format {fmt!r}")


def register(spark: Any) -> None:
    """Idempotently register the data source with this session."""
    key = "_aligned_table_stream_registered"
    if getattr(spark, key, False):
        return
    spark.dataSource.register(TableStreamDataSource)
    setattr(spark, key, True)
