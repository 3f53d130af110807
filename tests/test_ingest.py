"""Behavioral ingestion fixtures (FIXTURES.md §1) — each test exercises one
cited behavior of the reference converter, with our documented deviations
(real NULLs, LongType for >32-bit ints, DateType for dates)."""

from __future__ import annotations

import json
import os

import pytest

from collimate_spark.ingest import (
    DATE_FORMATS,
    apply_manifest,
    audit,
    categorical_threshold,
    ingest,
    profile,
    read_raw,
    sanitize,
    scan_budget,
    to_columnar,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _types(manifest):
    return {c.original_name: c.logical_type for c in manifest.columns}


# --- F1: widening lattice ---
def test_widening_lattice(spark, tmp_path):
    rows = ["id,ratio,mixed_if,mixed_is,bigint,negbig"]
    for i in range(200):
        mixed_if = str(i) if i < 100 else f"{i}.5"
        mixed_is = str(i) if i != 150 else "abc"
        rows.append(f"{i},{i}.14,{mixed_if},{mixed_is},{3000000000 + i},{-3000000000 - i}")
    path = _write(tmp_path, "typed_basic.csv", "\n".join(rows) + "\n")
    typed, manifest = ingest(spark, path)
    t = _types(manifest)
    assert t["id"] == "int32"
    assert t["ratio"] == "float64"
    assert t["mixed_if"] == "float64"
    assert t["mixed_is"] == "str"
    assert t["bigint"] == "int64"  # reference: str (upper bound only)
    assert t["negbig"] == "int64"  # reference misses the lower bound entirely
    out = typed.orderBy("id").collect()
    assert out[0].id == 0 and out[150].mixed_is == "abc"


# --- F2: null-token set ---
def test_null_tokens(spark, tmp_path):
    rows = ["i_null,f_null,s_null,case_na"]
    toks = ["null", "na", "n/a", "none", "", "-"]
    for i in range(12):
        tok = toks[i % 6]
        rows.append(f"{i if i % 2 else tok},{i}.5 ,{tok if i % 2 else 'x'},NA")
    path = _write(tmp_path, "nulls.csv", "\n".join(rows) + "\n")
    typed, manifest = ingest(spark, path)
    t = _types(manifest)
    assert t["i_null"] == "int32"
    assert t["f_null"] == "float64"
    assert t["case_na"] == "str"  # uppercase NA is NOT a null token
    got = typed.collect()
    assert sum(1 for r in got if r.i_null is None) == 6  # real NULLs, not 0
    assert all(r.case_na == "NA" for r in got)


# --- F3: categorical threshold ---
def test_categorical_profile(spark, tmp_path):
    rows = ["cat_small,high_card"]
    for i in range(2000):
        rows.append(f"c{i % 5},u{i}")
    path = _write(tmp_path, "categorical.csv", "\n".join(rows) + "\n")
    # scan_rows=0 → the reference's prefix-window budget rule
    _, manifest = ingest(spark, path, scan_rows=0)
    by_name = {c.original_name: c for c in manifest.columns}
    assert by_name["cat_small"].categorical is True
    assert by_name["high_card"].categorical is False
    # threshold model: min(ceil(0.3*2000), 65536) * coverage(0.5)^2
    scanned = scan_budget(2000)
    assert scanned == 1000
    assert manifest.categorical_threshold == categorical_threshold(2000, scanned)
    assert manifest.n_scanned == 1000

    # default (Spark-first): full-data profile, coverage 1.0
    _, full = ingest(spark, path)
    assert full.n_scanned == 2000
    assert full.categorical_threshold == categorical_threshold(2000, 2000)


# --- F4: date detection ---
def test_date_detection(spark, tmp_path):
    rows = ["iso_dash,iso_slash,dmy,mdy,ambiguous,not_date"]
    for i in range(1, 29):
        rows.append(
            f"2021-3-{i},2021/03/{i:02d},{i}-12-2021,12/{i}/2021,03/04/2021,abcdefgh"
        )
    path = _write(tmp_path, "dates.csv", "\n".join(rows) + "\n")
    typed, manifest = ingest(spark, path, parse_dates=True)
    by = {c.original_name: c for c in manifest.columns}
    assert by["iso_dash"].logical_type == "date" and by["iso_dash"].date_format == "yyyy-M-d"
    assert by["iso_slash"].logical_type == "date"
    assert by["dmy"].logical_type == "date" and by["dmy"].date_format == "d-M-yyyy"
    assert by["mdy"].logical_type == "date" and by["mdy"].date_format == "M/d/yyyy"
    # every value parses as both d/M and M/d → format set size 2 → stays str
    assert by["ambiguous"].logical_type == "str"
    assert by["not_date"].logical_type == "str"
    row = typed.orderBy("iso_dash").first()
    assert str(row.iso_dash) == "2021-03-01"


def test_date_requires_flag(spark, tmp_path):
    path = _write(tmp_path, "d.csv", "d\n2021-3-4\n2021-3-5\n")
    _, manifest = ingest(spark, path, parse_dates=False)
    assert _types(manifest)["d"] == "str"


# --- F5: sanitization ---
@pytest.mark.parametrize(
    "raw,expected",
    [
        (" Total % ", "total"),
        ("R&D", "randd"),
        ("user@host", "userathost"),
        ("first-name", "first_name"),
        ("a  b!!c", "a_b_c"),
        ("CAPS", "caps"),
    ],
)
def test_sanitize(raw, expected):
    assert sanitize(raw) == expected


# --- F6: post-scan-window violations are audited, not silently zeroed ---
def test_post_scan_audit(spark, tmp_path):
    n = 5000
    rows = ["late_string"]
    for i in range(n):
        rows.append("oops" if i == 4000 else str(i))
    path = _write(tmp_path, "scan_window.csv", "\n".join(rows) + "\n")
    raw = read_raw(spark, path)
    manifest = profile(spark, raw, scan_rows=1500)
    assert _types(manifest)["late_string"] == "int32"  # inferred from window
    typed = apply_manifest(raw, manifest)
    violations = audit(raw, manifest, typed)
    assert violations["late_string"] == 1  # the late "oops" is surfaced
    assert typed.filter("late_string IS NULL").count() == 1  # NULL, not 0


# --- F7: empty input ---
def test_empty_csv(spark, tmp_path):
    path = _write(tmp_path, "edge.csv", "a,b\n")
    typed, manifest = ingest(spark, path)
    assert typed.count() == 0
    assert manifest.n_rows == 0
    assert [c.sane_name for c in manifest.columns] == ["a", "b"]


# --- F8: format variants ---
def test_tsv_and_json(spark, tmp_path):
    tsv = _write(tmp_path, "t.tsv", "x\ty\n1\tfoo\n2\tbar\n")
    typed, manifest = ingest(spark, tsv)
    assert _types(manifest) == {"x": "int32", "y": "str"}
    js = _write(tmp_path, "t.json", json.dumps([{"x": 1, "y": "foo"}, {"x": 2, "y": "bar"}]))
    typed_j, manifest_j = ingest(spark, js)
    assert _types(manifest_j) == {"x": "int32", "y": "str"}
    assert typed_j.count() == 2


def test_jsonl_and_gzip_inputs(spark, tmp_path):
    """Deliberate upgrades over the reference's csv/tsv/json triple:
    JSON-lines (the splittable layout) and transparent .gz decompression
    of any accepted format."""
    import gzip

    jl = _write(
        tmp_path, "t.jsonl", '{"x": 1, "y": "foo"}\n{"x": 2, "y": "bar"}\n'
    )
    typed, manifest = ingest(spark, jl)
    assert _types(manifest) == {"x": "int32", "y": "str"}
    assert typed.count() == 2

    gz = tmp_path / "t.csv.gz"
    gz.write_bytes(gzip.compress(b"x,y\n1,foo\n2,bar\n3,baz\n"))
    typed_gz, manifest_gz = ingest(spark, str(gz))
    assert _types(manifest_gz) == {"x": "int32", "y": "str"}
    assert typed_gz.count() == 3

    jlgz = tmp_path / "t.jsonl.gz"
    jlgz.write_bytes(gzip.compress(b'{"x": 9, "y": "q"}\n'))
    typed_jg, manifest_jg = ingest(spark, str(jlgz))
    assert _types(manifest_jg) == {"x": "int32", "y": "str"}
    assert typed_jg.count() == 1


def test_unknown_extension(spark, tmp_path):
    path = _write(tmp_path, "t.xyz", "x\n1\n")
    with pytest.raises(ValueError, match="unrecognized extension"):
        read_raw(spark, path)
    # .gz alone isn't a format — the inner extension must be recognized
    with pytest.raises(ValueError, match="unrecognized extension"):
        read_raw(spark, str(tmp_path / "t.xyz.gz"))


# --- end-to-end: ingest → parquet → query round trip ---
def test_to_columnar_roundtrip(spark, tmp_path):
    path = _write(tmp_path, "rt.csv", "K 1,v\n1,a\n2,b\n3,-\n")
    typed, manifest = ingest(spark, path)
    outdir = str(tmp_path / "store")
    to_columnar(typed, outdir, manifest, write_manifest=True)
    back = spark.read.parquet(outdir)
    assert back.columns == ["k_1", "v"]
    assert back.count() == 3
    assert back.filter("v IS NULL").count() == 1
    with open(os.path.join(outdir, "_manifest.json")) as fh:
        m = json.load(fh)
    assert m["columns"][0]["sane_name"] == "k_1"


def test_to_columnar_partitioned(spark, tmp_path):
    path = _write(
        tmp_path, "pt.csv", "k,grp\n" + "".join(f"{i},{i % 3}\n" for i in range(30))
    )
    typed, manifest = ingest(spark, path)
    outdir = str(tmp_path / "pstore")
    to_columnar(typed, outdir, manifest, partition_cols=["grp"])
    subdirs = {p for p in os.listdir(outdir) if p.startswith("grp=")}
    assert subdirs == {"grp=0", "grp=1", "grp=2"}
    back = spark.read.parquet(outdir)
    assert back.count() == 30
    assert back.filter("grp = 1").count() == 10


def test_scan_budget_rule():
    assert scan_budget(999) == 999
    assert scan_budget(1000) == 1000
    assert scan_budget(3000) == 1000
    assert scan_budget(10000) == 3000


# --- F9: sampled profile (distributed scan-budget analog) ---
def test_sampled_profile_matches_full(spark, tmp_path):
    """An explicit sample_fraction must infer the same schema as the full
    profile on homogeneous data, record true n_rows from the count job,
    and report a sampled n_scanned < n_rows."""
    rows = ["id,price,label,day"]
    for i in range(5000):
        rows.append(f"{i},{i}.25,cat{i % 7},2021-3-{(i % 27) + 1}")
    path = _write(tmp_path, "sampled.csv", "\n".join(rows) + "\n")
    df = read_raw(spark, path)
    full = profile(spark, df, parse_dates=True)
    sampled = profile(spark, df, parse_dates=True, sample_fraction=0.3)
    assert _types(full) == _types(sampled)
    assert sampled.n_rows == 5000
    assert 0 < sampled.n_scanned < 5000
    # coverage-adjusted categorical threshold shrinks under sampling
    assert sampled.categorical_threshold < full.categorical_threshold
    # deterministic: the seeded sample reproduces exactly
    again = profile(spark, df, parse_dates=True, sample_fraction=0.3)
    assert again.n_scanned == sampled.n_scanned
    assert _types(again) == _types(sampled)


def test_small_input_skips_sampling(spark, tmp_path):
    """Below AUTO_SAMPLE_MIN_BYTES the auto path must profile in full
    (n_scanned == n_rows) without a separate count job."""
    path = _write(tmp_path, "tiny.csv", "a,b\n1,x\n2,y\n3,z\n")
    df = read_raw(spark, path)
    m = profile(spark, df)
    assert m.n_rows == 3 and m.n_scanned == 3


# --- F10: explicit dictionary-code parity mode (.k8/.k16/.key analog) ---
def test_dict_codes_first_seen_order(spark, tmp_path):
    """Codes must follow FIRST-SEEN order (reference index.js:330-334),
    null is a real dictionary entry, and the decoder round-trips."""
    import pyspark.sql.functions as F

    from collimate_spark.ingest import code_width, dict_encode

    rows = ["id,color"]
    seq = ["blue", "red", "blue", "green", "-", "red", "amber", "green"]
    for i, v in enumerate(seq):
        rows.append(f"{i},{v}")
    path = _write(tmp_path, "dc.csv", "\n".join(rows) + "\n")
    typed, manifest = ingest(spark, path)
    encoded, decoders = dict_encode(typed, ["color"])
    # first-seen order over the typed column ('-' is a null token -> None)
    assert decoders["color"] == ["blue", "red", "green", None, "amber"]
    got = {r.id: r for r in encoded.collect()}
    for i, v in enumerate(seq):
        expect = None if v == "-" else v
        assert decoders["color"][got[i].color__code] == expect
    assert code_width(len(decoders["color"])) == "k8"
    assert code_width(300) == "k16"


def test_to_columnar_dict_codes_roundtrip(spark, tmp_path):
    import json as _json

    import pyspark.sql.functions as F

    from collimate_spark.ingest import to_columnar

    rows = ["k,grp"] + [f"{i},g{i % 5}" for i in range(50)]
    path = _write(tmp_path, "dcs.csv", "\n".join(rows) + "\n")
    typed, manifest = ingest(spark, path)
    out = str(tmp_path / "store")
    to_columnar(typed, out, manifest, write_manifest=True, dict_codes=True)
    back = spark.read.parquet(out)
    assert "grp__code" in back.columns
    dicts = _json.load(open(f"{out}/_dicts.json"))
    values = dicts["grp"]["values"]
    assert dicts["grp"]["width"] == "k8"
    # decode(code) == original for every row
    decoded = [
        (r.grp, values[r.grp__code]) for r in back.collect()
    ]
    assert all(orig == dec for orig, dec in decoded)


# --- F11: incremental manifest merge (append-only feeds) ---
def test_merge_manifests_widens_like_union_profile(spark, tmp_path):
    """Profiling two batches separately and merging must infer the same
    types as one profile over the concatenation."""
    from collimate_spark.ingest import merge_manifests, profile

    b1 = ["v,d,s"] + [f"{i},2021-3-{(i % 27) + 1},x{i % 4}" for i in range(100)]
    # batch 2 widens v to float and breaks d's date format
    b2 = ["v,d,s"] + [f"{i}.5,03/0{(i % 8) + 1}/2021,x{i % 4}" for i in range(100)]
    p1 = _write(tmp_path, "b1.csv", "\n".join(b1) + "\n")
    p2 = _write(tmp_path, "b2.csv", "\n".join(b2) + "\n")
    both = _write(tmp_path, "both.csv", "\n".join(b1 + b2[1:]) + "\n")
    m1 = profile(spark, read_raw(spark, p1), parse_dates=True)
    m2 = profile(spark, read_raw(spark, p2), parse_dates=True)
    merged = merge_manifests(m1, m2)
    union = profile(spark, read_raw(spark, both), parse_dates=True)
    assert _types(merged) == _types(union) == {"v": "float64", "d": "str", "s": "str"}
    assert merged.n_rows == union.n_rows == 200
    # same-format dates survive a merge
    m11 = merge_manifests(m1, m1)
    assert _types(m11)["d"] == "date"
    assert m11.columns[1].date_format == m1.columns[1].date_format
    # categorical flags recompute against the combined threshold
    assert merged.columns[2].categorical == union.columns[2].categorical


def test_query_cli_in_process(spark, capsys):
    """collimate-query CLI: --list names every registered query; running
    one emits JSON-lines with the query's columns (in-process main(), the
    session is reused via getOrCreate)."""
    import json as _json

    from collimate_spark.run_query import main as qmain

    assert qmain(["--list"]) == 0
    listed = capsys.readouterr().out.strip().splitlines()
    assert len(listed) >= 99
    assert any(line.startswith("q1_pricing_summary\toracle") for line in listed)

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
    assert qmain(["agg_percentile", "--sf-dir", sf_dir, "--limit", "2"]) == 0
    out = [
        _json.loads(line) for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert 1 <= len(out) <= 2
    assert "p50" in out[0] or len(out[0]) > 1  # real columns came through
