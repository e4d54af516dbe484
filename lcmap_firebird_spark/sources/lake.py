"""Python DataSource for the native lakehouse — `format("lake")`.

Gives the commit-log tables (lakehouse.py) a first-class reader
surface::

    spark.dataSource.register(LakeDataSource)
    df = (spark.read.format("lake")
          .option("path", root).option("version", 3).load())

Why a DataSource when `LakeTable.snapshot()` exists: the snapshot
path resolves file lists on the caller's thread; the DataSource
form composes with everything that speaks reader options (SQL `USING
lake`, `spark.read`, other sessions) and demonstrates the PySpark 4
Python DataSource surface end to end (driver-side planning +
Arrow-batch worker reads, same API as sources/ardgen.py).

Shape:
- `partitions()` replays the commit log ON THE DRIVER (checkpoint-
  aware) — one InputPartition per live data file, so Spark schedules
  only live files and pruning/locality machinery sees real splits;
- `read(part)` streams the file as pyarrow RecordBatches (never
  row-at-a-time Python), null-filling columns added by schema
  evolution after the file was written.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType


@dataclass
class LakeFilePartition(InputPartition):
    path: str
    schema_json: str


class LakeDataSource(DataSource):
    """format name: lake. Options:
    - path: table root (required)
    - version: time-travel version (optional, default latest)
    """

    @classmethod
    def name(cls) -> str:
        return "lake"

    def _resolved(self):
        import json as _json
        import os as _os

        from ..lakehouse import LakeTable

        root = self.options.get("path")
        if not root:
            raise ValueError("option 'path' is required for format 'lake'")
        version = self.options.get("version")
        version = int(version) if version is not None else None
        # attach without a SparkSession: LakeTable only needs one for
        # snapshot(); log replay is pure filesystem
        t = LakeTable.__new__(LakeTable)
        t.spark = None
        t.root = root
        if not _os.path.isdir(_os.path.join(root, "_txn")):
            raise FileNotFoundError(f"no lakehouse table at {root}")
        live, head = t._live(version)
        return root, live, _json.loads(head["schema"])

    def schema(self) -> StructType:
        _, _, schema_json = self._resolved()
        return StructType.fromJson(schema_json)

    def reader(self, schema) -> "LakeReader":
        return LakeReader(self._resolved())


class LakeReader(DataSourceReader):
    def __init__(self, resolved):
        self._root, self._live, self._schema_json = resolved

    def partitions(self):
        import json as _json
        import os as _os

        sj = _json.dumps(self._schema_json)
        return [
            LakeFilePartition(
                _os.path.join(self._root, rec["path"]), sj
            )
            for rec in self._live
        ]

    def read(self, part: LakeFilePartition):
        import json as _json

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _St

        target = to_arrow_schema(
            _St.fromJson(_json.loads(part.schema_json))
        )
        pf = pq.ParquetFile(part.path)
        present = set(pf.schema_arrow.names)
        for batch in pf.iter_batches():
            cols = []
            for field in target:
                if field.name in present:
                    cols.append(
                        batch.column(field.name).cast(field.type)
                    )
                else:
                    # column added by schema evolution after this
                    # file was written -> nulls
                    cols.append(pa.nulls(batch.num_rows, field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=target)


# shipped to Python workers by class reference
import sys  # noqa: E402

import pyspark  # noqa: E402

pyspark.cloudpickle.register_pickle_by_value(sys.modules[__name__])
