"""WARC as a registered Spark 4 Python DataSource: ``format("warc")``.

The Data Source API (``pyspark.sql.datasource``, Spark 4) lets the
WARC reader plug into the normal reader surface instead of the
binaryFile+mapInPandas composition in :mod:`westa_ocr_spark.sources.
warc` (which remains the oracle twin and works on any Spark 3.4+):

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load("/crawl/segments/*.warc.gz")

Partition planning mirrors Common Crawl's sharding: ONE input
partition per WARC file (tens of thousands of ~1 GiB segments per
crawl), planned on the driver from a filesystem glob; each executor
task parses only its own file, decompressing gzip members one at a
time so memory is bounded by a record, not a file. Malformed files
yield a single ERROR row (per-row error-capture contract), never a
task failure.

Local/posix paths only (the sandbox has no distributed FS client);
on a real cluster the same class works wherever the executors mount
the same filesystem, or swap the ``open()`` for an fsspec handle.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

from westa_ocr_spark.sources.warc import (
    WARC_PAGES_SCHEMA,
    _warc_ts,
    parse_warc,
)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warc datasource requires .load(<path>)")
        self._path = path
        self._file_filter: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        """Consume warc_file equality filters as FILE pruning: a query
        like ``WHERE warc_file = '/crawl/seg-7.warc.gz'`` plans only
        the named segment's partition instead of scanning the whole
        crawl — the Python-DataSource analogue of partition pruning.
        Everything else stays with Spark."""
        remaining: list[Filter] = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("warc_file",):
                vals = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("warc_file",):
                vals = {str(v) for v in f.value}
            else:
                remaining.append(f)
                continue
            self._file_filter = (
                vals if self._file_filter is None
                else self._file_filter & vals
            )
        return remaining

    def partitions(self) -> list[InputPartition]:
        # one partition per WARC file = Common Crawl's sharding unit
        if os.path.isdir(self._path):
            pattern = os.path.join(self._path, "*")
        else:
            pattern = self._path
        files = sorted(
            f for f in _glob.glob(pattern) if os.path.isfile(f)
        )
        if not files:
            raise ValueError(f"warc datasource: no files match {pattern}")
        if self._file_filter is not None:
            files = [f for f in files if f in self._file_filter]
        return [_WarcFilePartition(f) for f in files]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        fpath = partition.path
        try:
            with open(fpath, "rb") as fh:
                data = fh.read()
            for rec in parse_warc(data):
                if rec["type"] != "response":
                    continue
                yield (
                    rec["url"],
                    _warc_ts(rec["date"]),
                    rec["payload"],
                    "",
                    "",
                    fpath,
                    rec["type"],
                    "OK",
                    None,
                )
        except ValueError as exc:
            yield (
                None, None, None, "", "", fpath, "error", "ERROR",
                f"warc: {exc}",
            )


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` over WARC files/directories."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_PAGES_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the ``warc`` format."""
    spark.dataSource.register(WarcDataSource)


__all__ = ["WarcDataSource", "WarcReader", "register"]
