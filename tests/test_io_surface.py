"""Cloud/HTTP/converter/append/streaming surface tests."""

from __future__ import annotations

import gzip
import io
import os
import zipfile

import pytest

from pyspark.sql import functions as F

from excelstream_spark.sources import converters, http
from excelstream_spark.sources.cloud import (
    ReplicateStats,
    configure_s3,
    plan_strategy,
)
from excelstream_spark.sources.xlsx import register_xlsx
from excelstream_spark.sources.xlsx.reader_core import WorkbookReader
from excelstream_spark.streaming import (
    events_stream,
    hourly_windowed_counts,
    run_available_now,
    sessionized_windows,
)
from excelstream_spark.tables import load_table, table_path

from .conftest import SF_DIR


def test_configure_s3_sets_hadoop_confs(spark):
    configure_s3(
        spark,
        access_key="AK",
        secret_key="SK",
        endpoint="http://minio:9000",
        region="us-east-1",
        path_style_access=True,
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.access.key") == "AK"
    assert conf.get("fs.s3a.endpoint") == "http://minio:9000"
    assert conf.get("fs.s3a.path.style.access") == "true"
    assert conf.get("fs.s3a.fast.upload") == "true"


def test_replicate_strategy_planning():
    assert plan_strategy(None, None, "us-east-1", "us-east-1") == "server_side"
    assert plan_strategy("a", "b", None, None) == "streaming"
    assert plan_strategy(None, None, "us-east-1", "eu-west-1") == "streaming"
    stats = ReplicateStats(bytes_transferred=10 * 1024 * 1024, seconds=2.0)
    assert stats.mb_per_sec == 5.0


def test_http_xlsx_bytes(spark):
    df = load_table(spark, SF_DIR, "nation")
    data = http.dataframe_to_xlsx_bytes(df, sheet_name="Nations")
    wb = WorkbookReader(data)
    assert wb.sheet_names() == ["Nations"]
    rows = list(wb.iter_rows("Nations"))
    assert rows[0] == ["n_nationkey", "n_name", "n_regionkey"]
    assert len(rows) == 1 + df.count()
    headers = http.http_response_headers("x.xlsx", http.XLSX_CONTENT_TYPE)
    assert "attachment" in headers["Content-Disposition"]


def test_http_csv_bytes_gzip(spark):
    df = load_table(spark, SF_DIR, "region")
    data = http.dataframe_to_csv_bytes(df, gzip_compress=True)
    text = gzip.decompress(data).decode()
    assert text.splitlines()[0] == "r_regionkey,r_name"
    assert len(text.splitlines()) == 1 + df.count()


def test_http_max_rows_guard(spark):
    df = load_table(spark, SF_DIR, "customer")
    try:
        http.dataframe_to_xlsx_bytes(df, max_rows=5)
        raise AssertionError("expected ResultTooLargeError")
    except http.ResultTooLargeError as e:
        assert "presigned" in str(e)


class _FakeS3:
    """Minimal boto3-shaped client: paginated listing + URL formatting —
    enough to strategy-test the presign path without cloud access."""

    def __init__(self, keys, page_size=2):
        self._keys = sorted(keys)
        self._page = page_size
        self.presigned = []

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        matches = [k for k in self._keys if k.startswith(Prefix)]
        start = int(ContinuationToken or 0)
        page = matches[start : start + self._page]
        out = {"Contents": [{"Key": k} for k in page]}
        if start + self._page < len(matches):
            out["IsTruncated"] = True
            out["NextContinuationToken"] = str(start + self._page)
        return out

    def generate_presigned_url(self, op, Params, ExpiresIn):
        assert op == "get_object"
        self.presigned.append((Params["Key"], ExpiresIn))
        return f"https://{Params['Bucket']}.example/{Params['Key']}?ttl={ExpiresIn}"


def test_presign_prefix_filters_and_orders():
    """Only DATA part objects get presigned (_SUCCESS, .crc sidecars and
    directory placeholders skipped), key-sorted so multi-part downloads
    concatenate in part order; pagination is followed to the end."""
    fake = _FakeS3(
        [
            "exports/q1/part-00001-x.csv",
            "exports/q1/part-00000-x.csv",
            "exports/q1/_SUCCESS",
            "exports/q1/.part-00000-x.csv.crc",
            "exports/q1/",
            "exports/q2/part-00000-y.csv",  # other prefix
            "exports/q1/part-00002-x.csv",
        ],
        page_size=2,
    )
    keys, urls = http.presign_prefix("bkt", "exports/q1/", fake, ttl_seconds=60)
    assert keys == [
        "exports/q1/part-00000-x.csv",
        "exports/q1/part-00001-x.csv",
        "exports/q1/part-00002-x.csv",
    ]
    assert urls == [f"https://bkt.example/{k}?ttl=60" for k in keys]


def test_serve_dataframe_inline_then_presigned_fallback(spark, tmp_path):
    """serve_dataframe: small results come back inline with no cloud
    involved; past the row guard it falls back to the distributed write +
    presigned URLs (exercised against file: storage + the fake client,
    the same injection seam the cloud replicate tests use)."""
    df = load_table(spark, SF_DIR, "region")
    small = http.serve_dataframe(df, "regions.csv", fmt="csv")
    assert small.inline and small.urls == []
    assert small.body.decode().splitlines()[0] == "r_regionkey,r_name"

    # guard trips -> presigned path (write target overridden to file:)
    out = tmp_path / "exports" / "big"
    res = http.export_presigned(
        df,
        bucket="bkt",
        key_prefix="exports/big",
        fmt="csv",
        s3_client=_FakeS3([]),  # patched below after the write
        write_path=f"file://{out}",
    )
    # the fake client saw no keys (it lists the BUCKET, not the file
    # system) — now re-list with a client seeded from what Spark wrote
    import glob as g

    parts = sorted(
        "exports/big/" + p.rsplit("/", 1)[-1]
        for p in g.glob(f"{out}/part-*.csv")
    )
    assert parts, "expected csv part files written"
    fake = _FakeS3(parts + ["exports/big/_SUCCESS"])
    keys, urls = http.presign_prefix("bkt", "exports/big/", fake, 120)
    assert keys == parts and len(urls) == len(parts)
    assert res.content_type == http.CSV_CONTENT_TYPE

    # no destination configured -> the guard error propagates
    import pytest

    with pytest.raises(http.ResultTooLargeError):
        http.serve_dataframe(df, "r.csv", fmt="csv", max_inline_rows=2)


class _DirS3:
    """Directory-backed in-process S3 (round-5 verdict task #8): the
    'bucket' is a local directory tree, ``list_objects_v2`` pages over
    the REAL objects Spark wrote (not a hand-fed key list), and
    presigned GETs are ``file://`` URLs that genuinely dereference — the
    closest full-path rehearsal the sandbox allows (no boto3/moto/cloud
    baked in)."""

    def __init__(self, root, page_size=2):
        from pathlib import Path

        self._root = Path(root)
        self._page = page_size
        self.list_calls = 0

    def _all_keys(self):
        return sorted(
            str(p.relative_to(self._root)).replace("\\", "/")
            for p in self._root.rglob("*")
            if p.is_file()
        )

    def list_objects_v2(self, Bucket, Prefix, ContinuationToken=None):
        self.list_calls += 1
        matches = [k for k in self._all_keys() if k.startswith(Prefix)]
        start = int(ContinuationToken or 0)
        page = matches[start : start + self._page]
        out = {"Contents": [{"Key": k} for k in page]}
        if start + self._page < len(matches):
            out["IsTruncated"] = True
            out["NextContinuationToken"] = str(start + self._page)
        return out

    def generate_presigned_url(self, op, Params, ExpiresIn):
        assert op == "get_object"
        return (self._root / Params["Key"]).as_uri() + f"?ttl={ExpiresIn}"


def test_export_presigned_end_to_end_roundtrip(spark, tmp_path):
    """The FULL presigned-export path, not just listing/ordering: 3-part
    distributed CSV write -> list the objects actually on 'storage'
    (paginated, sidecars filtered) -> presign -> dereference every URL
    and compare bytes to the stored objects -> reassemble the parts in
    key order and recover the exact input rows."""
    import csv as csvmod
    import io as iomod
    from urllib.request import urlopen

    df = load_table(spark, SF_DIR, "customer").repartition(3)
    bucket_root = tmp_path / "bucket"
    out = bucket_root / "exports" / "cust"
    fake = _DirS3(bucket_root, page_size=2)
    res = http.export_presigned(
        df,
        bucket="bkt",
        key_prefix="exports/cust",
        fmt="csv",
        s3_client=fake,
        ttl_seconds=90,
        write_path=f"file://{out}",
    )
    assert not res.inline and res.content_type == http.CSV_CONTENT_TYPE
    assert res.filename == "cust.csv"
    # one data object per partition; sidecars (_SUCCESS, .crc) filtered;
    # key-sorted; pagination genuinely followed (3+ objects, page=2)
    assert len(res.keys) == 3 and res.keys == sorted(res.keys)
    assert all(k.rsplit("/", 1)[-1].startswith("part-") for k in res.keys)
    assert fake.list_calls >= 2
    # dereference each presigned URL: bytes equal the stored object
    datas = []
    for k, u in zip(res.keys, res.urls):
        assert u.endswith("?ttl=90")
        with urlopen(u.split("?")[0]) as fh:
            b = fh.read()
        assert b == (bucket_root / k).read_bytes(), k
        datas.append(b)
    # concatenating parts in URL order recovers the full result (every
    # part carries the header when header=True)
    rows = []
    for b in datas:
        part_rows = list(csvmod.reader(iomod.StringIO(b.decode())))
        assert part_rows[0] == df.columns
        rows.extend(part_rows[1:])
    assert len(rows) == df.count()
    got_keys = sorted(int(r[0]) for r in rows)
    want_keys = sorted(
        r.c_custkey for r in df.select("c_custkey").collect()
    )
    assert got_keys == want_keys

    # xlsx flavor: distributed sink parts presign the same way and the
    # objects are real zip containers
    out_x = bucket_root / "exports" / "cust_x"
    res_x = http.export_presigned(
        df,
        bucket="bkt",
        key_prefix="exports/cust_x",
        fmt="xlsx",
        s3_client=fake,
        write_path=f"file://{out_x}",
    )
    assert res_x.content_type == http.XLSX_CONTENT_TYPE and res_x.keys
    for k, u in zip(res_x.keys, res_x.urls):
        with urlopen(u.split("?")[0]) as fh:
            assert fh.read(2) == b"PK", k


def test_parquet_excel_parquet_cycle(spark, tmp_path):
    src = table_path(SF_DIR, "supplier")
    x = str(tmp_path / "sup_xlsx")
    p = str(tmp_path / "sup_parquet")
    converters.parquet_to_excel(spark, src, x)
    converters.excel_to_parquet(spark, x, p)
    orig = spark.read.parquet(src)
    back = spark.read.parquet(p)
    assert back.count() == orig.count()
    assert set(back.columns) == set(orig.columns)
    assert (
        back.agg(F.sum("s_acctbal")).first()[0] == orig.agg(F.sum("s_acctbal")).first()[0]
    )


def test_append_to_workbook(spark, tmp_path):
    register_xlsx(spark)
    p = str(tmp_path / "wb.xlsx")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    df1.coalesce(1).write.mode("overwrite").format("xlsx").option(
        "singleFile", True
    ).save(p)
    df2 = spark.createDataFrame([(3, "c")], "id long, s string")
    converters.append_to_workbook(spark, df2, p)
    back = spark.read.format("xlsx").load(p)
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3]


def test_write_sheets_multi_table(spark, tmp_path):
    p = str(tmp_path / "multi.xlsx")
    converters.write_sheets(
        {
            "Regions": load_table(spark, SF_DIR, "region"),
            "Nations": load_table(spark, SF_DIR, "nation"),
        },
        p,
    )
    with WorkbookReader(p) as wb:
        assert wb.sheet_names() == ["Regions", "Nations"]
        assert len(list(wb.iter_rows("Nations"))) == 26  # header + 25


def test_streaming_hourly_matches_batch(spark):
    stream = events_stream(spark, table_path(SF_DIR, "events"))
    assert stream.isStreaming
    result = run_available_now(
        hourly_windowed_counts(stream), "hourly_test", output_mode="complete"
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {
        (str(r["hour"]), r["event_type"]): r["n_events"] for r in result.collect()
    }
    want = {
        (str(r["hour"]), r["event_type"]): r["n_events"] for r in batch.collect()
    }
    assert got == want


def test_streaming_sessionize_runs(spark):
    stream = events_stream(spark, table_path(SF_DIR, "events"))
    result = run_available_now(
        sessionized_windows(stream), "sessions_test", output_mode="complete"
    )
    rows = result.collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)


def test_csv_zstd_roundtrip(spark, tmp_path):
    """S7 parity: .csv.zst equivalents via Spark's zstd codec.  Text-file
    zstd needs libhadoop (present on real clusters, absent in this
    container) — skip rather than fake it when the codec is missing."""
    import glob as g

    src = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    out = str(tmp_path / "sup_zst")
    try:
        src.write.mode("overwrite").options(header=True, compression="zstd").csv(out)
    except Exception as e:
        if "CODEC_NOT_AVAILABLE" in str(e):
            pytest.skip("zstd text codec needs libhadoop (cluster-only)")
        raise
    files = g.glob(f"{out}/part-*.csv.zst")
    assert files, "expected .csv.zst part files"
    back = spark.read.schema(src.schema).options(header=True).csv(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_zip_roundtrip(spark, tmp_path):
    """S7 parity (reference src/csv_reader.rs:83-138): .csv.zip archives
    auto-extract — first .csv entry wins, typed parse equals the plain
    CSV reader on the same data."""
    from excelstream_spark.sources.csvzip import read_csv_zip
    from excelstream_spark.tables import load_table

    from .conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders").limit(500)
    plain = str(tmp_path / "plain")
    orders.coalesce(1).write.options(header=True).csv(plain)
    import glob as g

    [csv_file] = g.glob(plain + "/*.csv")
    zdir = str(tmp_path / "zipped")
    os.makedirs(zdir)
    with zipfile.ZipFile(f"{zdir}/orders.csv.zip", "w") as z:
        z.write(csv_file, "orders.csv")

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in orders.schema)
    got = read_csv_zip(spark, zdir, ddl, header=True)
    want = spark.read.schema(orders.schema).options(header=True).csv(plain)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_csv_zip_entry_selection_and_options(spark, tmp_path):
    """Multi-entry archives pick the first .csv member (reference
    semantics); delimiter/quote options flow through to the JVM parser."""
    from excelstream_spark.sources.csvzip import read_csv_zip

    zdir = str(tmp_path / "z")
    os.makedirs(zdir)
    with zipfile.ZipFile(f"{zdir}/multi.csv.zip", "w") as z:
        z.writestr("README.txt", "not csv")
        z.writestr("data.csv", 'id|name\n1|"a|b"\n2|plain\n')
        z.writestr("other.csv", "id|name\n9|nope\n")
    got = read_csv_zip(
        spark, zdir, "id int, name string", header=True, delimiter="|"
    )
    assert sorted(map(tuple, got.collect())) == [(1, "a|b"), (2, "plain")]


def test_csv_zip_skips_macos_metadata_members(spark, tmp_path):
    """zipfile.namelist() includes directory entries and macOS
    resource-fork members; '__MACOSX/._data.csv' ends in '.csv' and can
    sort first — selecting it would feed AppleDouble bytes to the
    parser.  Only real data members are eligible."""
    from excelstream_spark.sources.csvzip import _pick_entry, read_csv_zip

    assert (
        _pick_entry(["__MACOSX/._data.csv", "sub/", "sub/data.csv"])
        == "sub/data.csv"
    )
    assert _pick_entry(["dir/", "._hidden.csv", "notes.txt"]) == "notes.txt"
    assert _pick_entry(["__MACOSX/", "__MACOSX/._x.csv"]) is None

    zdir = str(tmp_path / "z")
    os.makedirs(zdir)
    with zipfile.ZipFile(f"{zdir}/mac.csv.zip", "w") as z:
        z.writestr("__MACOSX/._data.csv", "\x00\x05\x16\x07garbage")
        z.writestr("data/", "")
        z.writestr("data/data.csv", "id,name\n1,ok\n")
    got = read_csv_zip(spark, zdir, "id int, name string", header=True)
    assert got.collect() == [(1, "ok")]


def test_csv_zip_quoted_embedded_newlines(spark, tmp_path):
    """Records whose quoted fields span physical lines are reassembled
    (quote-parity splitter) — this EXCEEDS the reference's line-buffered
    reader (src/csv_reader.rs:197-252).  The zip read must equal the
    built-in multiLine CSV reader on the identical uncompressed bytes."""
    from excelstream_spark.sources.csvzip import _split_records, read_csv_zip

    # unit: parity splitter (doubled-quote escapes, CRLF, blank lines)
    assert _split_records('a,"x\ny",b\nc,d,e\n', '"') == ['a,"x\ny",b', "c,d,e"]
    assert _split_records('a,"he said ""hi""",z\n', '"') == [
        'a,"he said ""hi""",z'
    ]
    assert _split_records('1,"x\r\ny"\r\n2,z\r\n', '"') == ['1,"x\r\ny"', "2,z"]
    assert _split_records("a,b\n\nc,d\n", '"') == ["a,b", "", "c,d"]
    assert _split_records('1,"open\nnever closed', '"') == [
        '1,"open\nnever closed'
    ]

    csv_text = (
        "id,name,note\n"
        '1,"multi\nline value","with ""quotes"" too"\n'
        "2,plain,simple\n"
        '3,"trailing\nnewline\ninside",last\n'
    )
    plain = tmp_path / "plain.csv"
    plain.write_text(csv_text)
    zdir = str(tmp_path / "z")
    os.makedirs(zdir)
    with zipfile.ZipFile(f"{zdir}/nl.csv.zip", "w") as z:
        z.writestr("nl.csv", csv_text)

    ddl = "id int, name string, note string"
    got = read_csv_zip(spark, zdir, ddl, header=True)
    want = spark.read.schema(ddl).options(header=True, multiLine=True).csv(
        str(plain)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_export_presigned_honors_csv_dialect(spark, tmp_path):
    """The distributed fallback must write the SAME dialect the inline
    path promised: separator and gzip compression forward to the Spark
    csv writer rather than silently reverting to defaults."""
    import glob as g
    import gzip

    df = load_table(spark, SF_DIR, "region")
    out = tmp_path / "exports" / "dialect"
    http.export_presigned(
        df,
        bucket="bkt",
        key_prefix="exports/dialect",
        fmt="csv",
        s3_client=_FakeS3([]),
        write_path=f"file://{out}",
        delimiter=";",
        gzip_compress=True,
        header=True,
    )
    parts = sorted(g.glob(f"{out}/part-*.csv.gz"))
    assert parts, "expected gzipped csv part files"
    text = gzip.decompress(open(parts[0], "rb").read()).decode()
    assert text.splitlines()[0] == ";".join(df.columns)


def test_csv_zip_bare_cr_line_endings(spark, tmp_path):
    """Classic-Mac bare-\\r record terminators parse identically whether
    or not the file contains quote characters (the quote-aware record
    splitter recognizes all three physical endings)."""
    import zipfile as zf

    from excelstream_spark.sources.csvzip import read_csv_zip

    d = tmp_path / "crzip"
    d.mkdir()
    body = 'a,desc\r1,"plain"\r2,"multi\rline"\r3,last\r'
    with zf.ZipFile(d / "t.csv.zip", "w") as z:
        z.writestr("t.csv", body)
    got = read_csv_zip(
        spark, str(d), "a int, desc string", header=True
    ).collect()
    rows = {r["a"]: r["desc"] for r in got}
    assert rows == {1: "plain", 2: "multi\rline", 3: "last"}
