"""First-class `spark.read.format("mbox")` via the Python DataSource
API (Spark 4, SPARK-44076) — the modern way to ship a custom source:
users get a format string, options, schema and partition planning
instead of calling a helper function.

Division of labor mirrors read_mbox (email_source.py:164): this
source only FRAMES the archive (one row per raw RFC-2822 message,
with file + index lineage); parsing stays in parse_rfc822 so there is
exactly one parser path. Partition planning is per FILE — mbox
archives shard naturally by file (Takeout exports, listserv dumps),
so executors open only their own file and the driver touches nothing
but the listing.

Register once per session:
    spark.dataSource.register(MboxDataSource)
    spark.read.format("mbox").load("/archives/*.mbox")
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MBOX_SCHEMA = "src_file string, msg_idx int, raw string"


class _MboxPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class MboxReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("mbox source requires a path: .load('/dir/or/file')")
        self._path = path

    def partitions(self):
        import glob
        import os

        p = self._path
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "**", "*"), recursive=True))
            files = [f for f in files if os.path.isfile(f)]
        else:
            files = sorted(f for f in glob.glob(p) if os.path.isfile(f))
        if not files:
            raise FileNotFoundError(f"no mbox files under {p!r}")
        return [_MboxPartition(f) for f in files]

    def read(self, partition: _MboxPartition):
        # executor-side: stream one archive, split on the mbox
        # envelope ("From " at line start), emit raw message text
        path = partition.path
        idx = 0
        buf: list[str] = []
        with open(path, "r", errors="replace") as fh:
            for line in fh:
                if line.startswith("From ") and buf:
                    yield (path, idx, "".join(buf))
                    idx += 1
                    buf = []
                elif line.startswith("From ") and not buf:
                    continue  # envelope of the first message
                else:
                    buf.append(line)
        if buf:
            yield (path, idx, "".join(buf))


class MboxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mbox"

    def schema(self) -> str:
        return MBOX_SCHEMA

    def reader(self, schema) -> MboxReader:
        return MboxReader(self.options)
