"""Compatibility connector tests: synthesize a store directory in the
reference's EXACT on-disk format (raw little-endian TypedArray dumps,
JSON string arrays, k8/k16 dictionary codes + .key decoders, index.json
manifest — reference/index.js:595-641) and read it back through
spark.read.format("collimate_legacy")."""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from collimate_spark.sources.legacy_store import CollimateLegacyDataSource

N = 1000


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("legacy_store"))
    rng = np.random.Generator(np.random.PCG64(99))
    ids = np.arange(N, dtype="<i4")
    # int32 with the reference's 0-sentinel for nulls (index.js:467-471)
    qty = rng.integers(0, 100, N).astype("<i4")
    # float32 with NaN sentinel (index.js:472-476)
    price = rng.random(N).astype("<f4")
    price[::97] = np.nan
    open(os.path.join(d, "id.i32"), "wb").write(ids.tobytes())
    open(os.path.join(d, "qty.i32"), "wb").write(qty.tobytes())
    open(os.path.join(d, "price.f32"), "wb").write(price.tobytes())
    # categorical: 4 values + a null dictionary entry (code 4)
    key = ["red", "green", "blue", "black", None]
    codes = (np.arange(N) % 5).astype("<u1")
    open(os.path.join(d, "color.k8"), "wb").write(codes.tobytes())
    open(os.path.join(d, "color.k8.key"), "w").write(json.dumps(key))
    # str column as JSON array
    names = [f"name_{i}" for i in range(N)]
    open(os.path.join(d, "label.json"), "w").write(json.dumps(names))
    # manifest with original (unsanitized) names
    open(os.path.join(d, "index.json"), "w").write(
        json.dumps(
            {
                "id": "id.i32",
                "qty": "qty.i32",
                "price": "price.f32",
                "color": "color.k8",
                "label": "label.json",
            }
        )
    )
    return d


@pytest.fixture()
def legacy(spark):
    spark.dataSource.register(CollimateLegacyDataSource)
    return spark


def test_reads_all_columns_and_values(legacy, store_dir):
    df = legacy.read.format("collimate_legacy").load(store_dir)
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == N
    qty = np.fromfile(os.path.join(store_dir, "qty.i32"), dtype="<i4")
    price = np.fromfile(os.path.join(store_dir, "price.f32"), dtype="<f4")
    for i in (0, 1, 97, 500, N - 1):
        assert rows[i]["qty"] == int(qty[i])
        if math.isnan(float(price[i])):
            assert math.isnan(rows[i]["price"])  # NaN surfaced as stored
        else:
            assert abs(rows[i]["price"] - float(price[i])) < 1e-7
        assert rows[i]["label"] == f"name_{i}"


def test_dictionary_decode_including_null_entry(legacy, store_dir):
    df = legacy.read.format("collimate_legacy").load(store_dir)
    got = [r.color for r in df.orderBy("id").limit(10).collect()]
    assert got == ["red", "green", "blue", "black", None] * 2


def test_raw_codes_mode(legacy, store_dir):
    df = (
        legacy.read.format("collimate_legacy")
        .option("decode_dicts", "false")
        .load(store_dir)
    )
    got = [r.color for r in df.orderBy("id").limit(6).collect()]
    assert got == [0, 1, 2, 3, 4, 0]
    assert dict(df.dtypes)["color"] == "bigint"


def test_row_range_partitioning(legacy, store_dir):
    df = (
        legacy.read.format("collimate_legacy")
        .option("rows_per_split", "128")
        .load(store_dir)
    )
    assert df.rdd.getNumPartitions() == (N + 127) // 128
    assert df.count() == N
    # each split must carry its own disjoint id range (seek correctness)
    from pyspark.sql import functions as F

    agg = df.agg(F.countDistinct("id").alias("d"), F.min("id"), F.max("id")).collect()[0]
    assert agg["d"] == N and agg["min(id)"] == 0 and agg["max(id)"] == N - 1


def test_queries_compose_on_legacy_store(legacy, store_dir):
    """The point of the connector: plain DataFrame analytics run directly
    over the reference's store."""
    from pyspark.sql import functions as F

    df = legacy.read.format("collimate_legacy").load(store_dir)
    out = (
        df.filter(F.col("color").isNotNull())
        .groupBy("color")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("qty"), 2).alias("avg_qty"))
        .orderBy("color")
        .collect()
    )
    assert [r.color for r in out] == ["black", "blue", "green", "red"]
    assert all(r.n == 200 for r in out)


def test_store_without_manifest(legacy, store_dir, tmp_path):
    """index.json is optional (reference flag -i): names derive from
    filenames."""
    import shutil

    d2 = str(tmp_path / "nomanifest")
    shutil.copytree(store_dir, d2)
    os.remove(os.path.join(d2, "index.json"))
    df = legacy.read.format("collimate_legacy").load(d2)
    assert sorted(df.columns) == ["color", "id", "label", "price", "qty"]
    assert df.count() == N


def test_writer_roundtrip_through_reader(legacy, tmp_path):
    """write_legacy_store -> read.format('collimate_legacy') preserves
    values with the reference's sentinel semantics."""
    from pyspark.sql import functions as F

    from collimate_spark.sources.legacy_store import write_legacy_store

    src = legacy.createDataFrame(
        [(0, None, 1.5, "x"), (1, 7, None, None), (2, 8, 2.5, "y"), (3, None, 3.5, "x")],
        "id: int, k: int, v: double, s: string",
    )
    d = str(tmp_path / "export")
    index = write_legacy_store(src, d)
    assert index == {"id": "id.i32", "k": "k.i32", "v": "v.f64", "s": "s.k8"}
    back = legacy.read.format("collimate_legacy").load(d)
    rows = {r.id: r for r in back.collect()}
    assert rows[0].k == 0 and rows[1].k == 7  # int NULL -> 0 sentinel
    import math

    # float NULL -> 0.0 sentinel (the real binary's +null === 0 path,
    # verified in tests/test_reference_interop.py)
    assert rows[1].v == 0.0 and rows[2].v == 2.5
    assert rows[0].s == "x" and rows[1].s is None  # dict null entry decodes


def test_writer_first_seen_code_order_and_width(tmp_path, legacy):
    import json as _json

    from collimate_spark.sources.legacy_store import write_legacy_store

    vals = ["banana", "apple", "banana", "cherry", "apple"]
    src = legacy.createDataFrame([(i, v) for i, v in enumerate(vals)], "id: int, fruit: string")
    d = str(tmp_path / "order")
    write_legacy_store(src.coalesce(1).sortWithinPartitions("id"), d)
    key = _json.load(open(os.path.join(d, "fruit.k8.key")))
    assert key == ["banana", "apple", "cherry"]  # first-encounter order
    codes = np.fromfile(os.path.join(d, "fruit.k8"), dtype="<u1")
    assert codes.tolist() == [0, 1, 0, 2, 1]
    # k16 promotion past 256 distinct values
    many = legacy.createDataFrame(
        [(i, f"v{i}") for i in range(300)], "id: int, s: string"
    )
    d2 = str(tmp_path / "wide")
    idx = write_legacy_store(many.coalesce(1).sortWithinPartitions("id"), d2)
    assert idx["s"] == "s.k16"
    assert np.fromfile(os.path.join(d2, "s.k16"), dtype="<u2").max() == 299


def test_writer_int64_narrowing_and_json_fallback(tmp_path, legacy):
    from collimate_spark.sources.legacy_store import write_legacy_store

    small = legacy.createDataFrame([(1, 10), (2, 20)], "id: long, x: long")
    d = str(tmp_path / "narrow")
    idx = write_legacy_store(small, d)
    assert idx["x"] == "x.i32"
    big = legacy.createDataFrame([(1, 2**40)], "id: long, x: long")
    d2 = str(tmp_path / "big")
    idx2 = write_legacy_store(big, d2)
    assert idx2["x"] == "x.json"
