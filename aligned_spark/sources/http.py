"""HTTP file source (reference: ``CsvFileSource.to_lazy_polars`` http
branch, ``aligned/sources/local.py:283-290``).

Small-reference-data pattern: the driver fetches the payload once and
parallelizes it — an HTTP endpoint is not a splittable filesystem, so
pretending otherwise would just hide a single-stream download inside
an executor. For big files, land them on object storage and use the
regular readers (``s3a://`` paths are first-class there)."""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class HttpCsvSource:
    url: str
    delimiter: str = ","
    has_header: bool = True
    mapping_keys: dict[str, str] = field(default_factory=dict)
    #: injectable for tests / proxies: fn(url) -> bytes
    fetch: object | None = None

    def job_group_key(self) -> str:
        return f"http:{self.url}"

    def _fetch_bytes(self) -> bytes:
        if self.fetch is not None:
            return self.fetch(self.url)  # type: ignore[operator]
        from urllib.request import urlopen

        with urlopen(self.url, timeout=60) as resp:  # noqa: S310
            return resp.read()

    def read(self, spark: SparkSession) -> DataFrame:
        payload = self._fetch_bytes()
        tmp_dir = tempfile.mkdtemp(prefix="aligned_http_")
        path = os.path.join(tmp_dir, "payload.csv")
        with open(path, "wb") as f:
            f.write(payload)
        df = (
            spark.read.option("header", str(self.has_header).lower())
            .option("sep", self.delimiter)
            .option("inferSchema", "true")
            .csv(path)
        )
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df
