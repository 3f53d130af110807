"""Read the reference converter's OWN on-disk output — a directory of
per-column TypedArray buffer dumps — directly into a Spark DataFrame, via
the PySpark 4 Python DataSource API.

Format (reference/index.js:595-641, ext map index.js:80-90):

- ``<col>.i8/.u8/.i16/.u16/.i32/.u32/.f32/.f64`` — raw little-endian
  TypedArray buffer dump (``new Buffer(column.buffer)``), no header.
- ``<col>.json`` — string column as a JSON array.
- ``<col>.k8`` / ``<col>.k16`` — dictionary CODES (Uint8/Uint16 buffer)
  with ``<col>.k8.key`` / ``<col>.k16.key`` — the JSON decoder array
  (index = code, value = decoded value; a ``null`` entry is the
  categorical null, index.js:423-431).
- ``index.json`` (flag ``-i``) — original name → filename manifest.

This is the compatibility on-ramp: a user of the reference points
``spark.read.format("collimate_legacy").load(dir)`` at an existing
converted store and queries it with every operator in this repo — no
re-conversion. Usage:

    spark.dataSource.register(CollimateLegacyDataSource)
    df = spark.read.format("collimate_legacy").load("/path/to/store")

Semantics decisions (documented, matching SURVEY.md §1.3):
- int sentinel 0 and float NaN are surfaced AS STORED (the reference's
  lossy encoding cannot distinguish them from real values; converting
  NaN→NULL is a one-line ``nanvl`` for callers who want it);
- dictionary columns decode to their values by default
  (``option("decode_dicts", "false")`` surfaces raw codes);
- rows are split into row-range partitions (``option("rows_per_split")``,
  default 1 << 20) so a big store scans in parallel; each split reads
  only its byte range of the fixed-width files. ``.json`` string columns
  have no row index, so every split holding one must parse the array
  once per task — inherent to the format (the reference itself holds the
  whole column in memory, index.js:552); the parse is JSON-library-fast
  and bounded by the column file size.

The reader yields Arrow RecordBatches (the vectorized path of the Python
DataSource API), never per-row Python tuples.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

# extension -> (numpy dtype, spark type); mirrors reference ext_map
_EXT_TYPES = {
    ".i8": ("<i1", ByteType()),
    ".u8": ("<u1", ShortType()),  # uint8 widens to short (Spark has no unsigned)
    ".i16": ("<i2", ShortType()),
    ".u16": ("<u2", IntegerType()),
    ".i32": ("<i4", IntegerType()),
    ".u32": ("<u4", LongType()),
    ".f32": ("<f4", FloatType()),
    ".f64": ("<f8", DoubleType()),
}


def _scan_store(path: str) -> dict[str, dict]:
    """Map column name -> {kind, file, dtype?, key_file?} for one store
    directory. Honors index.json when present (original names), else
    derives names from filenames."""
    entries = sorted(os.listdir(path))
    manifest = None
    if "index.json" in entries:
        with open(os.path.join(path, "index.json")) as f:
            manifest = json.load(f)
    cols: dict[str, dict] = {}

    def add(name: str, fname: str) -> None:
        full = os.path.join(path, fname)
        if fname.endswith(".key"):
            return
        ext = os.path.splitext(fname)[1]
        if ext in _EXT_TYPES:
            np_dt, spark_t = _EXT_TYPES[ext]
            cols[name] = {"kind": "fixed", "file": full, "np": np_dt, "spark": spark_t}
        elif ext == ".json":
            cols[name] = {"kind": "json", "file": full, "spark": StringType()}
        elif ext in (".k8", ".k16"):
            np_dt = "<u1" if ext == ".k8" else "<u2"
            cols[name] = {
                "kind": "dict",
                "file": full,
                "np": np_dt,
                "key_file": full + ".key",
                "spark": StringType(),
            }

    if manifest:
        for name, fname in manifest.items():
            add(name, fname)
    else:
        for fname in entries:
            if fname == "index.json":
                continue
            name = fname
            for suffix in (".k8", ".k16"):
                if fname.endswith(suffix):
                    name = fname[: -len(suffix)]
            name = os.path.splitext(name)[0] if name == fname else name
            add(name, fname)
    if not cols:
        raise ValueError(f"no collimate columns found in {path}")
    return cols


def _row_count(cols: dict[str, dict]) -> int:
    for meta in cols.values():
        if meta["kind"] in ("fixed", "dict"):
            width = np.dtype(meta["np"]).itemsize
            return os.path.getsize(meta["file"]) // width
    # all-string store: length of the first JSON array
    meta = next(iter(cols.values()))
    with open(meta["file"]) as f:
        return len(json.load(f))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class CollimateLegacyReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("collimate_legacy requires a load(path)")
        self.decode_dicts = str(options.get("decode_dicts", "true")).lower() != "false"
        self.rows_per_split = int(options.get("rows_per_split", 1 << 20))
        self.cols = _scan_store(self.path)
        self.schema = schema

    def partitions(self):
        n = _row_count(self.cols)
        splits = []
        start = 0
        while start < n:
            splits.append(_RangePartition(start, min(start + self.rows_per_split, n)))
            start += self.rows_per_split
        return splits or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        start, end = partition.start, partition.end
        n = end - start
        arrays, names = [], []
        for field in self.schema.fields:
            meta = self.cols[field.name]
            names.append(field.name)
            if meta["kind"] == "fixed":
                width = np.dtype(meta["np"]).itemsize
                with open(meta["file"], "rb") as f:
                    f.seek(start * width)
                    buf = f.read(n * width)
                arrays.append(pa.array(np.frombuffer(buf, dtype=meta["np"])))
            elif meta["kind"] == "dict":
                width = np.dtype(meta["np"]).itemsize
                with open(meta["file"], "rb") as f:
                    f.seek(start * width)
                    buf = f.read(n * width)
                codes = np.frombuffer(buf, dtype=meta["np"])
                with open(meta["key_file"]) as f:
                    key = json.load(f)
                if self.decode_dicts:
                    decoded = [key[c] if c < len(key) else None for c in codes]
                    arrays.append(
                        pa.array(
                            [
                                v if (v is None or isinstance(v, str)) else json.dumps(v)
                                for v in decoded
                            ],
                            type=pa.string(),
                        )
                    )
                else:
                    arrays.append(pa.array(codes.astype("int64")))
            else:  # json string column
                with open(meta["file"]) as f:
                    values = json.load(f)[start:end]
                arrays.append(
                    pa.array(
                        [
                            v if (v is None or isinstance(v, str)) else json.dumps(v)
                            for v in values
                        ],
                        type=pa.string(),
                    )
                )
        yield pa.RecordBatch.from_arrays(arrays, names=names)


class CollimateLegacyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "collimate_legacy"

    def schema(self):
        cols = _scan_store(self.options["path"])
        decode = str(self.options.get("decode_dicts", "true")).lower() != "false"
        fields = []
        for name, meta in sorted(cols.items()):
            if meta["kind"] == "dict" and not decode:
                fields.append(StructField(name, LongType()))
            else:
                fields.append(StructField(name, meta["spark"]))
        return StructType(fields)

    def reader(self, schema: StructType) -> DataSourceReader:
        return CollimateLegacyReader(dict(self.options), schema)


def register(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(CollimateLegacyDataSource)
