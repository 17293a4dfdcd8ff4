"""Pluggable commit coordination for the ``_delta_log`` directory.

The Delta protocol's whole ACID story reduces to ONE primitive:
*put-if-absent* of ``_delta_log/<version>.json`` — exactly one writer
may create each numbered commit file (delta.io PROTOCOL.md; upstream
delta-spark calls this a LogStore and ships per-filesystem
implementations, e.g. S3DynamoDBLogStore, because bare S3 historically
had no atomic create). This module provides that primitive behind a
small interface so :class:`~aligned_spark.sources.delta_log.DeltaLog`
can host its transaction log on any store:

- :class:`FileSystemLogStore` — the default; ``O_CREAT|O_EXCL`` is
  the filesystem's native put-if-absent (fsync'd for durability).
- :class:`S3LogStore` — conditional writes via
  ``PutObject(IfNoneMatch="*")``, which S3 has supported natively
  since 2024 (no DynamoDB sidecar needed); a lost race surfaces as
  HTTP 412 ``PreconditionFailed`` and is rethrown as
  :class:`ConcurrentCommitError`, feeding the same optimistic-retry
  loop the filesystem tier uses. The client is injected through the
  same ``client_factory`` convention as
  :class:`~aligned_spark.sources.s3.S3Source` (tests pass a moto
  ``mock_aws`` client; production uses the boto3 default chain).

Scale note (100 TB / 1000 executors): everything here is DRIVER-side
metadata — commit files are a few KB of JSON and checkpoints one
parquet object; data parts never flow through the log store. The
commit listing is memoized per store instance: N snapshot
resolutions of an unchanged table cost ONE prefix-scoped LIST; the
memo is kept current by this store's own puts, dropped when a
conditional put loses (proof of a missed commit), and cross-checked
against external writers by the log layer's dense-version HEAD probe
(DeltaLog/IcebergLog ``_versions``).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — reload the
    snapshot and retry the operation against it."""


class FileSystemLogStore:
    """Log directory on a filesystem with atomic exclusive create
    (local disk, NFS with O_EXCL semantics, HDFS via a mount)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def list_names(self) -> list[str]:
        if not os.path.isdir(self.log_dir):
            return []
        return os.listdir(self.log_dir)

    def exists(self, name: str) -> bool:
        return os.path.isfile(os.path.join(self.log_dir, name))

    def read_text(self, name: str) -> str:
        with open(
            os.path.join(self.log_dir, name), encoding="utf-8"
        ) as fh:
            return fh.read()

    def read_bytes(self, name: str) -> bytes:
        with open(os.path.join(self.log_dir, name), "rb") as fh:
            return fh.read()

    def put_exclusive(self, name: str, data: bytes) -> None:
        """Put-if-absent: the commit critical section."""
        os.makedirs(self.log_dir, exist_ok=True)
        path = os.path.join(self.log_dir, name)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise ConcurrentCommitError(
                f"{name} already committed in {self.log_dir}"
            ) from exc
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())

    def put_atomic(self, name: str, data: bytes) -> None:
        """Overwrite-allowed atomic put (checkpoints and the
        ``_last_checkpoint`` pointer — idempotent, last wins)."""
        os.makedirs(self.log_dir, exist_ok=True)
        path = os.path.join(self.log_dir, name)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)


def _default_client_factory():  # pragma: no cover - needs live creds
    import boto3

    return boto3.client("s3")


@dataclass
class S3LogStore:
    """``_delta_log`` hosted under ``s3://bucket/prefix/`` with
    native conditional-put commit coordination.

    Data parts can live anywhere (typically the same bucket via the
    ``s3a://`` executor tier or an :class:`S3Source` spill); only the
    log's atomicity needs this class. S3 PUTs are already atomic and
    read-after-write consistent, so ``put_atomic`` is a plain put;
    ``put_exclusive`` adds ``IfNoneMatch="*"`` so exactly one racer's
    commit lands — the loser's 412 becomes
    :class:`ConcurrentCommitError` and its optimistic-retry loop
    replays against the fresh snapshot."""

    bucket: str
    prefix: str
    client_factory: Callable[[], Any] = _default_client_factory
    #: memoized LIST result; None = no valid cache. Kept current by
    #: this store's OWN puts; invalidated when a conditional put
    #: loses (a 412 is proof a newer commit exists that the cache
    #: missed). Readers detect EXTERNAL writers via the dense-version
    #: probe in DeltaLog/IcebergLog._versions (one HEAD, no LIST).
    _names_cache: list[str] | None = field(
        default=None, init=False, repr=False, compare=False
    )

    def _key(self, name: str) -> str:
        return f"{self.prefix.rstrip('/')}/{name}"

    def _client(self):
        return self.client_factory()

    def invalidate(self) -> None:
        """Drop the memoized listing (next ``list_names`` re-LISTs)."""
        self._names_cache = None

    def _cache_add(self, name: str) -> None:
        if self._names_cache is not None and name not in self._names_cache:
            self._names_cache.append(name)

    def list_names(self) -> list[str]:
        if self._names_cache is not None:
            return list(self._names_cache)
        client = self._client()
        pfx = self.prefix.rstrip("/") + "/"
        names: list[str] = []
        paginator = client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket, Prefix=pfx):
            for obj in page.get("Contents", []):
                names.append(obj["Key"][len(pfx):])
        self._names_cache = names
        return list(names)

    def exists(self, name: str) -> bool:
        try:
            self._client().head_object(
                Bucket=self.bucket, Key=self._key(name)
            )
            return True
        except Exception as exc:
            # only a definitive not-found maps to False — a throttle
            # or auth hiccup must NOT read as "table does not exist"
            # (a writer would take the table-CREATE path and an
            # incremental consumer would full-rebuild on top)
            code = str(
                (getattr(exc, "response", None) or {})
                .get("Error", {})
                .get("Code", "")
            )
            if code in ("404", "NoSuchKey", "NotFound"):
                return False
            raise

    def read_text(self, name: str) -> str:
        return self.read_bytes(name).decode("utf-8")

    def read_bytes(self, name: str) -> bytes:
        obj = self._client().get_object(
            Bucket=self.bucket, Key=self._key(name)
        )
        return obj["Body"].read()

    def put_exclusive(self, name: str, data: bytes) -> None:
        try:
            self._client().put_object(
                Bucket=self.bucket,
                Key=self._key(name),
                Body=data,
                IfNoneMatch="*",
            )
        except Exception as exc:
            code = (
                getattr(exc, "response", None) or {}
            ).get("Error", {}).get("Code", "")
            if code in ("PreconditionFailed", "ConditionalRequestConflict"):
                # 412: another writer's commit landed first.
                # 409: a concurrent conditional put on the same key is
                # in flight — treat as lost race; retry re-resolves.
                # Either way the memoized listing is provably stale.
                self.invalidate()
                raise ConcurrentCommitError(
                    f"{name} already committed at "
                    f"s3://{self.bucket}/{self._key(name)}"
                ) from exc
            raise
        self._cache_add(name)

    def put_atomic(self, name: str, data: bytes) -> None:
        self._client().put_object(
            Bucket=self.bucket, Key=self._key(name), Body=data
        )
        self._cache_add(name)
