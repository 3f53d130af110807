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
- sentinels are surfaced AS STORED (the reference's lossy encoding
  cannot distinguish them from real values): int NULL -> 0, float NULL
  -> 0.0 (via JS ``+null === 0``, verified against the real binary in
  tests/test_reference_interop.py), and NaN appears only for non-null
  unparseable strings past the scan budget;
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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# Writer: DataFrame -> reference-format store directory

MAX_CATEGORICAL = 65536  # reference/index.js:57
K8_MAX = 256  # 8-bit code ceiling (index.js:390, with full-scan encounter=1)


def write_legacy_store(df, path: str, categorical_threshold: int | None = None) -> dict:
    """Export a DataFrame to the reference's on-disk format so its
    downstream consumers (`frame`/`beam`, README.md:3-4) can load our
    results byte-compatibly. Returns the index manifest dict.

    Faithful reference semantics (SURVEY.md §1.2-1.4):
    - integer NULL -> 0 sentinel (index.js:467-471); float NULL -> 0.0
      sentinel (index.js:472-476: ``+null === 0`` takes the numeric
      branch; NaN is only the unparseable-non-null-string fallback) —
      the format cannot express real nulls;
    - string columns with <= categorical_threshold distinct values
      dictionary-encode with FIRST-ENCOUNTER code order (index.js:330-334)
      — k8 when <= 256 values else k16 (index.js:390) — and NULL becomes
      a real decoder entry (index.js:423-431); other strings dump as a
      .json array;
    - int64 narrows to .i32 when every value fits (the reference's own
      int ceiling: bigger integers were never typed int32, index.js:169),
      else falls back to the .json string path;
    - index.json manifest maps ORIGINAL names to sanitized filenames.

    Scale note: the format is one UNSPLITTABLE buffer per column with
    sequential code assignment — a single-writer sink by the reference's
    own design (it holds everything in memory, index.js:552). This export
    therefore materializes the frame driver-side via Arrow and is meant
    for dimension/result-sized data; 100 TB tables stay in Parquet and
    interop happens the other direction (the reader above)."""
    from collimate_spark.ingest import sanitize

    os.makedirs(path, exist_ok=True)
    table = df.toArrow()
    n = table.num_rows
    if categorical_threshold is None:
        categorical_threshold = MAX_CATEGORICAL
    index: dict[str, str] = {}

    def _json_dump(fname: str, values) -> None:
        with open(os.path.join(path, fname), "w") as f:
            json.dump(values, f)

    for name, col in zip(table.column_names, table.columns):
        sane = sanitize(name)
        pa_t = col.type
        if pa.types.is_integer(pa_t):
            vals = col.to_pandas()
            arr64 = vals.fillna(0).to_numpy(dtype="int64")
            if arr64.size and (arr64.min() < -(2**31) or arr64.max() > 2**31 - 1):
                fname = sane + ".json"
                _json_dump(fname, [None if v is None else str(v) for v in vals.tolist()])
            else:
                fname = sane + ".i32"
                arr64.astype("<i4").tofile(os.path.join(path, fname))
            index[name] = fname
        elif pa.types.is_floating(pa_t):
            ext = ".f32" if pa.types.is_float32(pa_t) else ".f64"
            np_dt = "<f4" if ext == ".f32" else "<f8"
            # float NULL -> 0.0 sentinel, NOT NaN: in the reference's
            # creation pass (index.js:472-476) a null value coerces via
            # +null === 0 and takes the numeric branch; the NaN branch is
            # reserved for non-null unparseable strings slipping past the
            # scan budget. Verified byte-for-byte against the real binary
            # in tests/test_reference_interop.py. Real NaN VALUES in the
            # data are preserved (fill_null only touches nulls).
            arr = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
            arr.astype(np_dt).tofile(os.path.join(path, sane + ext))
            index[name] = sane + ext
        elif pa.types.is_boolean(pa_t):
            arr = col.to_pandas().fillna(0).to_numpy(dtype="uint8")
            arr.astype("<u1").tofile(os.path.join(path, sane + ".u8"))
            index[name] = sane + ".u8"
        else:
            values = [
                v if (v is None or isinstance(v, str)) else json.dumps(v)
                for v in col.to_pylist()
            ]
            encoder: dict = {}
            for v in values:
                if v not in encoder:
                    encoder[v] = len(encoder)  # first-encounter order
            if len(encoder) <= min(categorical_threshold, MAX_CATEGORICAL):
                ext = ".k8" if len(encoder) <= K8_MAX else ".k16"
                np_dt = "<u1" if ext == ".k8" else "<u2"
                codes = np.array([encoder[v] for v in values], dtype=np_dt)
                codes.tofile(os.path.join(path, sane + ext))
                decoder = [None] * len(encoder)
                for v, c in encoder.items():
                    decoder[c] = v
                _json_dump(sane + ext + ".key", decoder)
                index[name] = sane + ext
            else:
                fname = sane + ".json"
                _json_dump(fname, values)
                index[name] = fname
    _json_dump("index.json", index)
    return index
