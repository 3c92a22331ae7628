"""XLSX source/sink tests — ports of the reference's round-trip suite
(FIXTURES.md F1-F8 / reference tests/integration_test.rs) plus the
Spark-specific surface (partitioned writes, schema inference, options)."""

from __future__ import annotations

import datetime as dt
import zipfile

import pytest

from pyspark.sql import functions as F, types as T

from excelstream_spark.sources.xlsx import register_xlsx
from excelstream_spark.sources.xlsx.dates import (
    datetime_to_serial,
    serial_to_datetime,
)
from excelstream_spark.sources.xlsx import ooxml
from excelstream_spark.sources.xlsx.reader_core import WorkbookReader
from excelstream_spark.sources.xlsx.writer_core import WorkbookWriter

from .conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_xlsx(spark)


# --- F8: serial-date vectors ---------------------------------------------

DATE_VECTORS = {
    1.0: "1900-01-01",
    59.0: "1900-02-28",
    60.0: "1900-02-28",  # fictitious leap day renders as 02-28
    61.0: "1900-03-01",
    25569.0: "1970-01-01",
    36526.0: "2000-01-01",
    43890.0: "2020-02-29",
    44562.0: "2022-01-01",
    45217.0: "2023-10-18",
    73051.0: "2100-01-01",
}


def test_serial_date_vectors():
    for serial, expected in DATE_VECTORS.items():
        assert serial_to_datetime(serial).date().isoformat() == expected
    for frac, hms in [(0.5, (12, 0, 0)), (0.25, (6, 0, 0)), (0.75, (18, 0, 0))]:
        got = serial_to_datetime(44562.0 + frac)
        assert (got.hour, got.minute, got.second) == hms
    assert serial_to_datetime(0.5) is None       # below range
    assert serial_to_datetime(2958466.5) is None  # above range


def test_serial_inverse_roundtrip():
    for serial in [1.0, 59.0, 61.0, 25569.0, 44562.75, 73051.0]:
        assert abs(datetime_to_serial(serial_to_datetime(serial)) - serial) < 1e-9


def test_serial_column_expressions(spark):
    serials = [s for s in DATE_VECTORS if s != 60.0]  # 60 is non-invertible
    df = spark.createDataFrame([(s,) for s in serials], "serial double")
    from excelstream_spark.sources.xlsx.dates import (
        excel_serial_to_timestamp,
        timestamp_to_excel_serial,
    )
    out = df.select(
        "serial",
        excel_serial_to_timestamp(F.col("serial")).alias("ts"),
    ).withColumn("back", timestamp_to_excel_serial(F.col("ts")))
    for row in out.collect():
        assert row["ts"].date().isoformat() == DATE_VECTORS[row["serial"]]
        assert abs(row["back"] - row["serial"]) < 1e-9


# --- F2: typed row round-trip --------------------------------------------

def test_typed_roundtrip(spark, tmp_path):
    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("joined", T.TimestampNTZType()),
        T.StructField("note", T.StringType()),
    ])
    rows = [
        ("Alice", 30, 1234.56, True, dt.datetime(2023, 1, 1, 12, 0, 0), None),
        ("Bob", -1, -0.5, False, dt.datetime(1995, 6, 15, 23, 59, 59), ""),
        (None, None, None, None, None, "x"),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "typed")
    df.coalesce(1).write.mode("overwrite").format("xlsx").save(out)
    back = spark.read.format("xlsx").load(out)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in schema.fields
    ]
    got = sorted([tuple(r) for r in back.collect()], key=repr)
    want = sorted(rows, key=repr)
    assert got == want


# --- F4: special chars / unicode -----------------------------------------

def test_special_chars_roundtrip(spark, tmp_path):
    rows = [
        ("Text with <xml> tags",),
        ('Quote: "Hello"',),
        ("Ampersand: & Apostrophe: '",),
        ("Emoji: 😀🎉 Ñoño ∑∏∫ €£¥ ID бизнес-аккаунта",),
        ("A" * 10_000,),
        ("tab\tand\nnewline",),
    ]
    df = spark.createDataFrame(rows, "s string")
    out = str(tmp_path / "special")
    df.coalesce(1).write.mode("overwrite").format("xlsx").save(out)
    got = {r["s"] for r in spark.read.format("xlsx").load(out).collect()}
    assert got == {r[0] for r in rows}


# --- F3: 1000-row stream + partitioned write ------------------------------

def test_partitioned_stream_roundtrip(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("ID"),
        F.concat(F.lit("Name_"), F.col("id")).alias("Name"),
        (F.col("id") * 100).alias("Value"),
    )
    out = str(tmp_path / "stream")
    df.repartition(8).write.mode("overwrite").format("xlsx").save(out)
    back = spark.read.format("xlsx").load(out)
    assert back.count() == 1000
    assert back.agg(F.sum("Value")).first()[0] == sum(i * 100 for i in range(1000))


# --- F5: multi-sheet ------------------------------------------------------

def test_multi_sheet_workbook(tmp_path):
    p = str(tmp_path / "multi.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("Sales")
        wb.write_row(["Jan", 1000])
        wb.add_sheet("Данные")
        wb.write_row(["я", 2])
        wb.add_sheet("数据")
        wb.write_row(["中", 3])
    with WorkbookReader(p) as rb:
        assert rb.sheet_names() == ["Sales", "Данные", "数据"]
        assert list(rb.iter_rows("数据")) == [["中", 3]]


def test_sheet_selection_options(spark, tmp_path):
    p = str(tmp_path / "sheets.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("A")
        wb.write_row(["col"])
        wb.write_row(["a"])
        wb.add_sheet("B")
        wb.write_row(["col"])
        wb.write_row(["b1"])
        wb.write_row(["b2"])
    assert spark.read.format("xlsx").option("sheetName", "B").load(p).count() == 2
    assert spark.read.format("xlsx").option("sheetIndex", 1).load(p).count() == 2
    assert spark.read.format("xlsx").load(p).count() == 1


# --- writer options -------------------------------------------------------

def test_compression_levels(spark, tmp_path):
    df = spark.range(2000).select(F.concat(F.lit("v" * 50), F.col("id")).alias("s"))
    sizes = {}
    for level in (0, 1, 9):
        out = str(tmp_path / f"c{level}")
        df.coalesce(1).write.mode("overwrite").format("xlsx").option("compression", level).save(out)
        part = next(f for f in (tmp_path / f"c{level}").iterdir() if f.suffix == ".xlsx")
        sizes[level] = part.stat().st_size
        assert spark.read.format("xlsx").load(out).count() == 2000
    assert sizes[0] > sizes[1] > 0
    assert sizes[9] <= sizes[1]


def test_shared_strings_mode(spark, tmp_path):
    df = spark.createDataFrame([("dup",)] * 100 + [("uniq",)], "s string")
    out = str(tmp_path / "sst")
    df.coalesce(1).write.mode("overwrite").format("xlsx").option("useSharedStrings", True).save(out)
    part = next(f for f in (tmp_path / "sst").iterdir() if f.suffix == ".xlsx")
    sst = zipfile.ZipFile(part).read("xl/sharedStrings.xml").decode()
    assert 'uniqueCount="3"' in sst  # header + dup + uniq
    assert spark.read.format("xlsx").load(out).count() == 101


def test_sheet_protection_and_password_hash(spark, tmp_path):
    out = str(tmp_path / "prot")
    spark.createDataFrame([("x",)], "s string").coalesce(1).write.mode("overwrite").format("xlsx").option("sheetProtectPassword", "test123").save(out)
    part = next(f for f in (tmp_path / "prot").iterdir() if f.suffix == ".xlsx")
    sheet = zipfile.ZipFile(part).read("xl/worksheets/sheet1.xml").decode()
    assert f'password="{ooxml.password_hash("test123")}"' in sheet
    assert len(ooxml.password_hash("abc")) == 4


def test_single_file_mode_rejects_multi_partition(spark, tmp_path):
    df = spark.range(10).repartition(2)
    with pytest.raises(Exception):
        df.write.mode("overwrite").format("xlsx").option("singleFile", True).save(
            str(tmp_path / "bad.xlsx")
        )


def test_header_false_positional_columns(spark, tmp_path):
    out = str(tmp_path / "nohdr")
    spark.createDataFrame([(1, "a")], "x long, s string").coalesce(1).write.mode("overwrite").format("xlsx").option("header", False).save(out)
    back = spark.read.format("xlsx").option("header", False).load(out)
    assert back.columns == ["_c0", "_c1"]
    assert back.count() == 1


# --- inference / coercion -------------------------------------------------

def test_mixed_int_float_promotes_to_double(spark, tmp_path):
    p = str(tmp_path / "mix.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("S")
        wb.write_row(["n"])
        wb.write_row([1])
        wb.write_row([2.5])
    back = spark.read.format("xlsx").load(p)
    assert dict(back.dtypes)["n"] == "double"
    assert {r["n"] for r in back.collect()} == {1.0, 2.5}


def test_user_schema_lenient_casts(spark, tmp_path):
    p = str(tmp_path / "casts.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("S")
        wb.write_row(["i", "b", "f"])
        wb.write_row(["42", "yes", "3.5"])
        wb.write_row(["oops", "no", "x"])
    schema = "i long, b boolean, f double"
    back = spark.read.format("xlsx").schema(schema).load(p)
    rows = sorted([tuple(r) for r in back.collect()], key=repr)
    assert rows == sorted([(42, True, 3.5), (None, False, None)], key=repr)


def test_excel_row_ceiling_autosplit(tmp_path):
    p = str(tmp_path / "big.xlsx")
    with WorkbookWriter(p, max_rows_per_sheet=100) as wb:
        wb.add_sheet("S")
        for i in range(250):
            wb.write_row([i])
    with WorkbookReader(p) as rb:
        names = rb.sheet_names()
        assert len(names) == 3  # 100 + 100 + 50
        total = sum(len(list(rb.iter_rows(s))) for s in names)
        assert total == 250


def test_max_rows_per_sheet_option_roundtrip(spark, tmp_path):
    """maxRowsPerSheet is honored by the sink, continuation sheets repeat
    the header, and an allSheets read reassembles every row exactly."""
    df = spark.range(17).select(
        F.col("id"), (F.col("id") * 2).cast("long").alias("dbl")
    )
    out = str(tmp_path / "split.xlsx")
    (df.coalesce(1).write.mode("overwrite").format("xlsx")
     .option("singleFile", True).option("maxRowsPerSheet", 5).save(out))
    with WorkbookReader(out) as rb:
        names = rb.sheet_names()
        # 5-row sheets, header repeated on each continuation sheet:
        # s1: hdr+4, then hdr+4 per sheet -> ceil((17+1)/... ) = 5 sheets
        assert len(names) == 5
        first_rows = [next(iter(rb.iter_rows(s))) for s in names]
    assert all(r == ["id", "dbl"] for r in first_rows)  # self-describing
    back = spark.read.format("xlsx").option("allSheets", True).load(out)
    got = sorted((r["id"], r["dbl"]) for r in back.collect())
    assert got == [(i, 2 * i) for i in range(17)]


def test_single_file_write_is_atomic(spark, tmp_path):
    """singleFile publishes via temp + rename: no *.__tmp-* litter on
    success and the destination only ever appears complete."""
    import glob as g

    out = str(tmp_path / "atomic.xlsx")
    spark.range(5).coalesce(1).write.mode("overwrite").format("xlsx").option(
        "singleFile", True
    ).save(out)
    assert g.glob(str(tmp_path / "*.__tmp-*")) == []
    assert spark.read.format("xlsx").load(out).count() == 5


def test_workbook_reader_lazy_sst(tmp_path):
    """Driver-side planning (sheet_names) must not load sharedStrings —
    partitions() over many part files stays metadata-only."""
    p = str(tmp_path / "lazy.xlsx")
    with WorkbookWriter(p, use_shared_strings=True) as wb:
        wb.add_sheet("S")
        wb.write_row(["hello", "world"])
    with WorkbookReader(p) as rb:
        assert rb.sheet_names() == ["S"]
        assert "_sst" not in rb.__dict__  # cached_property untriggered
        row = next(iter(rb.iter_rows("S")))
        assert row == ["hello", "world"]
        assert "_sst" in rb.__dict__


def test_filter_pushdown_matches_post_scan(spark, tmp_path):
    """Accepted pushFilters must be EXACTLY as strict as Spark's own
    filter (acceptance removes the post-scan Filter) — compare xlsx-with-
    pushdown against the parquet original for every supported shape."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(500)
    p = str(tmp_path / "orders_x")
    src.write.format("xlsx").mode("overwrite").save(p)
    cases = [
        lambda t: t.filter(F.col("o_orderstatus") == "O"),
        lambda t: t.filter(~(F.col("o_orderstatus") == "O")),
        lambda t: t.filter(F.col("o_orderpriority").isin("1-URGENT", "nope")),
        lambda t: t.filter(F.col("o_orderpriority").contains("URG")),
        lambda t: t.filter(F.col("o_orderpriority").startswith("2")),
        lambda t: t.filter(F.col("o_totalprice") > 100000),
        lambda t: t.filter(F.col("o_orderdate") > "1995-06-01"),
        lambda t: t.filter(F.col("o_totalprice").isNotNull()),
        # mixed pushable + residual expression
        lambda t: t.filter((F.col("o_totalprice") > 100000) & (F.length("o_orderpriority") > 3)),
    ]
    # pushdown is OPT-IN (see datasource.py); a FRESH frame per filter
    # sidesteps Spark's cached-scan reuse — the supported usage pattern
    for i, fn in enumerate(cases):
        fresh = spark.read.format("xlsx").option("pushdown", True).load(p)
        assert fn(fresh).count() == fn(src).count(), f"case {i} diverged"


def test_push_filters_residual_split(spark):
    """Unsupported filters must be yielded back to Spark untouched."""
    from pyspark.sql.datasource import EqualTo, IsNotNull, StringStartsWith
    from pyspark.sql import types as T
    from excelstream_spark.sources.xlsx.datasource import XlsxReader

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("s", T.StringType())]
    )
    r = XlsxReader(schema, {"path": "/nonexistent", "pushdown": "true"})
    f_ok = [EqualTo(("a",), 1), IsNotNull(("s",)), StringStartsWith(("s",), "x")]
    f_bad = [EqualTo(("nope",), 1), EqualTo(("a", "nested"), 2)]
    residual = list(r.pushFilters(f_ok + f_bad))
    assert residual == f_bad
    assert len(r._predicates) == 3
    # three-valued logic: NULL input -> filtered out, not inverted
    assert r._predicates[0]((None, "xy")) is None
    assert r._predicates[2]((1, "xy")) is True


def test_column_widths_and_row_height(spark, tmp_path):
    """K8 exceed-reference: widths/heights actually land in the XML."""
    p = str(tmp_path / "wh")
    src = spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("x"))
    (
        src.coalesce(1).write.format("xlsx").mode("overwrite")
        .option("columnWidths", "22.5,9")
        .option("rowHeight", "18")
        .save(p)
    )
    import glob as g

    xml = None
    with zipfile.ZipFile(g.glob(f"{p}/part-*.xlsx")[0]) as z:
        xml = z.read("xl/worksheets/sheet1.xml").decode()
    assert '<col min="1" max="1" width="22.5" customWidth="1"/>' in xml
    assert '<col min="2" max="2" width="9" customWidth="1"/>' in xml
    assert 'ht="18" customHeight="1"' in xml
    # still a readable workbook
    assert spark.read.format("xlsx").load(p).count() == 3


def test_error_cell_roundtrip(tmp_path):
    """K3 Error variant: t="e" cells survive write->read as ExcelError."""
    from excelstream_spark.sources.xlsx.reader_core import ExcelError

    p = str(tmp_path / "err.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("S")
        wb.write_row(["v", ExcelError("#DIV/0!"), 3])
    with WorkbookReader(p) as rb:
        row = next(iter(rb.iter_rows("S")))
    assert row[0] == "v" and row[2] == 3
    assert isinstance(row[1], ExcelError) and str(row[1]) == "#DIV/0!"
    with zipfile.ZipFile(p) as z:
        assert 't="e"' in z.read("xl/worksheets/sheet1.xml").decode()


def test_property_roundtrip_typed_cells(tmp_path):
    """Property-based write->read equality over the full CellValue domain
    (SURVEY §5 plan): strings incl. XML entities/unicode/whitespace, ints,
    floats, bools, datetimes, None gaps."""
    from hypothesis import given, settings, strategies as st

    cell = st.one_of(
        st.none(),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.booleans(),
        # control chars (except \t\n\r) are STRIPPED on write — reference F3
        # parity (XML 1.0 cannot encode them); generate without them so the
        # round-trip is exact
        st.text(
            max_size=40,
            alphabet=st.characters(
                exclude_categories=("Cs", "Cc"), include_characters="\t\n\r"
            ),
        ).filter(lambda s: not s.startswith("=")),
        st.datetimes(
            min_value=dt.datetime(1901, 1, 1), max_value=dt.datetime(2200, 1, 1)
        ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
    )

    @settings(max_examples=25, deadline=None)
    @given(rows=st.lists(st.lists(cell, min_size=1, max_size=6), min_size=1, max_size=8))
    def run(rows):
        p = str(tmp_path / "prop.xlsx")
        with WorkbookWriter(p) as wb:
            wb.add_sheet("S")
            for r in rows:
                wb.write_row(r)
        with WorkbookReader(p) as rb:
            back = list(rb.iter_rows("S"))
        assert len(back) == len(rows)
        for orig, got in zip(rows, back):
            # trailing Nones are not materialized as cells — pad back
            got = got + [None] * (len(orig) - len(got))
            for o, g in zip(orig, got):
                if isinstance(o, float):
                    assert g == o or (g is not None and abs(g - o) < 1e-9 * max(1, abs(o)))
                elif isinstance(o, dt.datetime):
                    assert abs((g - o).total_seconds()) < 0.001
                elif o == "" or (isinstance(o, str) and o.strip("\r\n\t ") == "" and o):
                    # lone whitespace strings survive via xml:space="preserve"
                    assert g == o
                else:
                    assert g == o, f"{o!r} -> {g!r}"

    run()


def test_all_sheets_header_realignment(spark, tmp_path):
    """Sheets whose column ORDER differs are realigned by header name,
    not silently mis-typed positionally."""
    p = str(tmp_path / "re.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("A")
        wb.write_row(["id", "name", "score"])
        wb.write_row([1, "alpha", 9.5])
        wb.add_sheet("B")  # same columns, shuffled order
        wb.write_row(["score", "id", "name"])
        wb.write_row([7.25, 2, "beta"])
    df = spark.read.format("xlsx").option("allSheets", True).load(p)
    rows = sorted([tuple(r) for r in df.collect()])
    assert rows == [(1, "alpha", 9.5), (2, "beta", 7.25)], rows


def test_user_schema_stays_positional(spark, tmp_path):
    """A user schema with names that don't appear in the header keeps the
    positional mapping (no all-null regression)."""
    p = str(tmp_path / "pos.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("S")
        wb.write_row(["colA", "colB"])
        wb.write_row([5, "x"])
    df = spark.read.format("xlsx").schema("a long, b string").load(p)
    assert [tuple(r) for r in df.collect()] == [(5, "x")]


def test_column_styles_option(spark, tmp_path):
    """K4 parity at the Spark surface: per-column style indices land on
    data cells (header keeps its own style)."""
    p = str(tmp_path / "styles")
    df = spark.createDataFrame([(1500.5, 0.25, "note")], "amt double, pct double, s string")
    (
        df.coalesce(1).write.format("xlsx").mode("overwrite")
        .option("columnStyles", "currency,percent,")
        .save(p)
    )
    import glob as g

    xml = zipfile.ZipFile(g.glob(f"{p}/part-*.xlsx")[0]).read(
        "xl/worksheets/sheet1.xml"
    ).decode()
    from excelstream_spark.sources.xlsx import ooxml

    assert f's="{ooxml.STYLE_CURRENCY}"' in xml
    assert f's="{ooxml.STYLE_PERCENT}"' in xml
    # readable and values intact
    assert [tuple(r) for r in spark.read.format("xlsx").load(p).collect()] == [
        (1500.5, 0.25, "note")
    ]
    # bad style name -> clear error naming valid choices
    import pytest as _pt

    with _pt.raises(Exception, match="columnStyles"):
        df.coalesce(1).write.format("xlsx").mode("overwrite").option(
            "columnStyles", "sparkly"
        ).save(str(tmp_path / "bad"))


def test_no_pushdown_no_cross_query_leak(spark, tmp_path):
    """Regression: with default options, interleaving filtered and
    unfiltered queries on the SAME DataFrame must never leak one query's
    filters into another (Spark's python-datasource planner reuses the
    cached scan blob — the reason pushdown is opt-in)."""
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(400)
    p = str(tmp_path / "leak_x")
    src.write.format("xlsx").mode("overwrite").save(p)
    df = spark.read.format("xlsx").load(p)
    n_all = df.count()
    n_o = df.filter(F.col("o_orderstatus") == "O").count()
    assert df.count() == n_all  # the leak made this return n_o
    assert n_o == src.filter(F.col("o_orderstatus") == "O").count()
    assert df.count() == n_all


# --- columnar batch scanner vs row reader (batch_scan.py) ------------------

def _rows_via_row_reader(path, sheet, schema, header):
    from excelstream_spark.sources.xlsx.datasource import XlsxPartition, XlsxReader

    r = XlsxReader(schema, {"path": path, "header": str(header).lower()})
    return [tuple(row) for row in r._read_rows(XlsxPartition(path, sheet))]


def _rows_via_batch(path, sheet, schema, header):
    from excelstream_spark.sources.xlsx.batch_scan import BatchSheetReader

    out = []
    with WorkbookReader(path) as wb:
        for batch in BatchSheetReader(wb, sheet, schema, header).batches():
            cols = batch.to_pydict()
            out.extend(zip(*(cols[n] for n in batch.schema.names)))
    return [tuple(r) for r in out]


def test_batch_reader_matches_row_reader(tmp_path):
    """The fast columnar scanner is a pure optimization: byte-identical
    results vs the per-cell row reader on writer-generated workbooks
    (typed cells, nulls incl. whole-null rows, entities, both string
    modes)."""
    schema = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("joined", T.TimestampNTZType()),
    ])
    rows = [
        ['a<b>&"c\'d', 30, 1234.56, True, dt.datetime(2023, 1, 1, 12, 0, 0)],
        ["line1\nline2\ttab", -1, -0.5, False, dt.datetime(1900, 2, 15)],
        [None, None, None, None, None],
        ["dup", 7, 0.0, True, dt.datetime(1900, 2, 28)],
        ["dup", None, 2.5, None, dt.datetime(2100, 12, 31, 23, 59, 59, 250000)],
    ]
    for use_sst in (False, True):
        p = str(tmp_path / f"eq_{use_sst}.xlsx")
        with WorkbookWriter(p, use_shared_strings=use_sst) as wb:
            wb.add_sheet("S")
            wb.write_header([f.name for f in schema.fields])
            for r in rows:
                wb.write_row(list(r))
        a = _rows_via_row_reader(p, "S", schema, header=True)
        b = _rows_via_batch(p, "S", schema, header=True)
        assert len(a) == len(rows)
        assert b == a, f"use_sst={use_sst}"


def _craft_xlsx(path, sheet_xml, sst_items=None, date_xf=False):
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}"><sheets>'
            '<sheet name="S" sheetId="1"/></sheets></workbook>',
        )
        if sst_items:
            z.writestr(
                "xl/sharedStrings.xml",
                f'<sst xmlns="{ns}">' + "".join(sst_items) + "</sst>",
            )
        if date_xf:  # xf index 1 -> builtin date numFmt 14
            z.writestr(
                "xl/styles.xml",
                f'<styleSheet xmlns="{ns}"><cellXfs count="2">'
                '<xf numFmtId="0"/><xf numFmtId="14"/></cellXfs></styleSheet>',
            )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>' + sheet_xml
            + "</sheetData></worksheet>",
        )


def test_batch_reader_fast_path_semantics(tmp_path, monkeypatch):
    """Rectangular third-party-shaped XML stays on the vectorized path
    (no ET fallback) and still types t="n" cells, date styles, shared /
    rich-text / inline strings, and mixed-kind columns correctly."""
    from excelstream_spark.sources.xlsx import batch_scan

    p = str(tmp_path / "fast.xlsx")
    _craft_xlsx(
        p,
        '<row r="1"><c r="A1" t="n"><v>10</v></c>'
        '<c r="B1" s="1" t="n"><v>25569</v></c>'
        '<c r="C1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2"><v>11</v></c>'
        '<c r="B2" s="1"><v>44562.25</v></c>'
        '<c r="C2" t="inlineStr"><is><t>a&#10;b&quot;c</t></is></c></row>',
        sst_items=["<si><t>hello</t></si>",
                   "<si><r><t>rich</t></r><r><t> text</t></r></si>"],
        date_xf=True,
    )
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.TimestampNTZType()),
        T.StructField("c", T.StringType()),
    ])
    expected = _rows_via_row_reader(p, "S", schema, header=False)
    monkeypatch.setattr(
        batch_scan.BatchSheetReader, "_rows_via_et",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("ET fallback used")),
    )
    got = _rows_via_batch(p, "S", schema, header=False)
    assert got == expected
    assert got[0] == (10, dt.datetime(1970, 1, 1), "hello")
    assert got[1] == (11, dt.datetime(2022, 1, 1, 6, 0, 0), 'a\nb"c')


def test_batch_reader_fallback_equivalence(tmp_path):
    """Shapes the regex scanner cannot prove (ragged rows, reversed
    attribute order, formulas, empty/self-closed rows) fall back per
    chunk and still match the row reader exactly."""
    p = str(tmp_path / "gnarly.xlsx")
    _craft_xlsx(
        p,
        '<row r="1"><c r="A1"><v>1</v></c><c r="B1" t="s"><v>0</v></c>'
        '<c r="C1" s="1"><v>44562.5</v></c></row>'
        '<row r="2"><c r="A2"><v>2</v></c><c r="C2" s="1"><v>60</v></c></row>'
        '<row r="3"><c t="s" r="A3"><v>1</v></c>'
        '<c r="B3" t="inlineStr"><is><t>x&#9;y</t></is></c></row>'
        '<row r="4"><c r="A4"><f>SUM(1,2)</f><v>3</v></c>'
        '<c r="B4" t="b"><v>1</v></c></row>'
        '<row r="5"/>',
        sst_items=["<si><t>hello</t></si>", "<si><t>world</t></si>"],
        date_xf=True,
    )
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.TimestampNTZType()),
    ])
    expected = _rows_via_row_reader(p, "S", schema, header=False)
    got = _rows_via_batch(p, "S", schema, header=False)
    assert got == expected
    assert len(got) == 5
    assert got[1] == (2, None, dt.datetime(1900, 2, 28))  # leap-bug serial 60
    assert got[4] == (None, None, None)  # self-closed <row/>


def test_batch_reader_spark_surface(spark, tmp_path):
    """spark.read xlsx: batchReader default and =false agree."""
    schema = "s string, n long, d double, t timestamp_ntz"
    df = spark.createDataFrame(
        [("a&b", 1, 1.5, dt.datetime(2020, 5, 17, 1, 2, 3)),
         (None, None, None, None),
         ('q"r\'s', -3, 2.25, dt.datetime(1999, 12, 31))],
        schema,
    )
    out = str(tmp_path / "surface")
    df.coalesce(1).write.mode("overwrite").format("xlsx").save(out)
    fast = sorted([tuple(r) for r in
                   spark.read.format("xlsx").load(out).collect()], key=repr)
    slow = sorted([tuple(r) for r in
                   spark.read.format("xlsx").option("batchReader", "false")
                   .load(out).collect()], key=repr)
    assert fast == slow
    assert len(fast) == 3


# --- sheetSchemaMode policies ---------------------------------------------

def _mismatched_workbook(tmp_path):
    p = str(tmp_path / "mismatch.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("A")
        wb.write_row(["id", "name"])
        wb.write_row([1, "alpha"])
        wb.add_sheet("B")  # overlapping but different column set
        wb.write_row(["name", "extra"])
        wb.write_row(["beta", 9.5])
    return p


def test_all_sheets_union_mode(spark, tmp_path):
    """sheetSchemaMode=union: schema is the by-name union across sheets;
    columns a sheet lacks read as null instead of silent mis-typing."""
    p = _mismatched_workbook(tmp_path)
    df = (spark.read.format("xlsx").option("allSheets", True)
          .option("sheetSchemaMode", "union").load(p))
    assert [f.name for f in df.schema.fields] == ["id", "name", "extra"]
    rows = sorted([tuple(r) for r in df.collect()], key=repr)
    assert rows == sorted([(1, "alpha", None), (None, "beta", 9.5)], key=repr)


def test_all_sheets_strict_mode_fails_fast(spark, tmp_path):
    """sheetSchemaMode=strict: mismatched sheet headers raise instead of
    silently coercing."""
    p = _mismatched_workbook(tmp_path)
    with pytest.raises(Exception, match="sheetSchemaMode=strict"):
        (spark.read.format("xlsx").option("allSheets", True)
         .option("sheetSchemaMode", "strict").load(p).collect())


def test_union_mode_type_widening(tmp_path, spark):
    """Union inference widens long|double -> double and conflicts -> string."""
    p = str(tmp_path / "widen.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("A")
        wb.write_row(["v", "w"])
        wb.write_row([1, "x"])
        wb.add_sheet("B")
        wb.write_row(["v", "w"])
        wb.write_row([2.5, 7])
    df = (spark.read.format("xlsx").option("allSheets", True)
          .option("sheetSchemaMode", "union").load(p))
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds == {"v": "double", "w": "string"}
    rows = sorted([tuple(r) for r in df.collect()])
    assert rows == [(1.0, "x"), (2.5, "7")]


# --- columnar batch writer (batch_write.py) -------------------------------


def _nasty_rows_and_batch():
    """Fixture covering every vectorized type + the per-row special paths:
    escaping, formulas, control chars, leap-bug dates, NaN/inf, decimals,
    float32 widening, all-null rows."""
    import decimal
    import pyarrow as pa

    schema = T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("dec", T.DecimalType(10, 2)),
        T.StructField("f32", T.FloatType()),
    ])
    rows = [
        ["plain", 42, 1.5, True, dt.date(2024, 2, 29),
         dt.datetime(2024, 2, 29, 13, 45, 30, 123456),
         decimal.Decimal("12.34"), 0.25],
        ["a&b<c>\"'", -7, 0.1, False, dt.date(1900, 2, 28),
         dt.datetime(1900, 1, 1), decimal.Decimal("-5.00"), 1e10],
        [None, None, None, None, None, None, None, None],
        ["=SUM(A1:A2)", 2 ** 62, float("nan"), True, dt.date(1899, 12, 31),
         dt.datetime(1969, 12, 31, 23, 59, 59), decimal.Decimal("0.01"),
         float("inf")],
        ["ctrl\x01char\rline", 0, float("inf"), False, dt.date(9999, 12, 31),
         dt.datetime(2024, 1, 1), decimal.Decimal("999.99"), -0.0],
        ["tab\tand\nnl", 1, -2.5e-8, True, dt.date(1970, 1, 1),
         dt.datetime(2024, 6, 15, 6, 0), decimal.Decimal("1.10"), 3.5],
    ]
    pa_schema = pa.schema([
        pa.field("s", pa.string()), pa.field("i", pa.int64()),
        pa.field("f", pa.float64()), pa.field("b", pa.bool_()),
        pa.field("d", pa.date32()), pa.field("ts", pa.timestamp("us")),
        pa.field("dec", pa.decimal128(10, 2)), pa.field("f32", pa.float32()),
    ])
    batch = pa.RecordBatch.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(zip(*rows), pa_schema)],
        schema=pa_schema,
    )
    return schema, rows, batch


def test_batch_writer_bytes_identical_to_row_writer():
    """batch_to_rows_xml produces byte-for-byte the row writer's XML for
    every scalar type, including the special-string and null paths."""
    import io

    from excelstream_spark.sources.xlsx.batch_write import batch_to_rows_xml

    schema, rows, batch = _nasty_rows_and_batch()
    b1, b2 = io.BytesIO(), io.BytesIO()
    with WorkbookWriter(b1) as wb:
        wb.add_sheet("S")
        for r in rows:
            wb.write_row(list(r))
    with WorkbookWriter(b2) as wb:
        wb.add_sheet("S")
        wb.write_rows_xml(
            batch_to_rows_xml(batch, schema, wb.next_row_index), batch.num_rows
        )
    x1 = zipfile.ZipFile(b1).read("xl/worksheets/sheet1.xml")
    x2 = zipfile.ZipFile(b2).read("xl/worksheets/sheet1.xml")
    assert x1 == x2


def test_batch_writer_float_repr_parity():
    """ndarray.astype('U') must format float64 exactly like Python repr()
    — the guarantee the vectorized <v> text relies on."""
    import random

    import numpy as np

    vals = [0.1, 2.0, 1e-9, 1e16, 1.5e-5, float("nan"), float("inf"),
            -0.0, 3.141592653589793, 2.2250738585072014e-308]
    rng = random.Random(42)
    vals += [rng.uniform(-1e12, 1e12) for _ in range(5000)]
    vals += [rng.random() for _ in range(5000)]
    formatted = np.array(vals, dtype=np.float64).astype("U32")
    assert all(repr(v) == s for v, s in zip(vals, formatted))


def test_arrow_writer_spark_roundtrip_matches_row_writer(spark, tmp_path):
    """format('xlsx') default (Arrow batch write) and batchWriter=false
    (row write) produce equal data; read-back equals the source."""
    df = spark.createDataFrame(
        [(i, f"name{i}" + ("&<>" if i % 7 == 0 else ""),
          i * 1.25, i % 2 == 0,
          dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
         for i in range(500)],
        "id long, name string, x double, flag boolean, ts timestamp_ntz",
    )
    a, b = str(tmp_path / "arrow"), str(tmp_path / "rows")
    df.repartition(2).write.format("xlsx").mode("overwrite").save(a)
    df.repartition(2).write.format("xlsx").option("batchWriter", "false").mode("overwrite").save(b)
    da = spark.read.format("xlsx").load(a)
    db = spark.read.format("xlsx").load(b)
    assert da.schema == db.schema
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0
    assert da.exceptAll(df).count() == 0 and df.exceptAll(da).count() == 0


def test_arrow_writer_autosplit_at_max_rows(spark, tmp_path):
    """The Arrow write path slices batches at the maxRowsPerSheet boundary
    (continuation sheets carry the re-emitted header)."""
    out = str(tmp_path / "split")
    df = spark.range(250).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    (df.coalesce(1).write.format("xlsx").mode("overwrite")
     .option("maxRowsPerSheet", 100).save(out))
    import glob as g

    [f] = g.glob(out + "/part-*.xlsx")
    with WorkbookReader(f) as wb:
        names = wb.sheet_names()
        assert len(names) == 3  # 99+99+52 data rows + header each
        counts = [sum(1 for _ in wb.iter_rows(s)) for s in names]
    assert counts == [100, 100, 53]
    back = (spark.read.format("xlsx").option("allSheets", True).load(out))
    assert back.count() == 250
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(250))


def test_arrow_writer_column_styles_and_height(spark, tmp_path):
    """columnStyles / rowHeight options render identically on both write
    paths."""
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    df = spark.createDataFrame(
        [(1.5, "x"), (2.5, "y")], "amount double, label string"
    )
    for out, bw in ((out_a, "true"), (out_b, "false")):
        (df.coalesce(1).write.format("xlsx").mode("overwrite")
         .option("batchWriter", bw)
         .option("columnStyles", "currency,")
         .option("rowHeight", "18").save(out))
    import glob as g

    [fa] = g.glob(out_a + "/part-*.xlsx")
    [fb] = g.glob(out_b + "/part-*.xlsx")
    xa = zipfile.ZipFile(fa).read("xl/worksheets/sheet1.xml")
    xb = zipfile.ZipFile(fb).read("xl/worksheets/sheet1.xml")
    assert xa == xb
    assert b'ht="18"' in xa and b's="' in xa


# --- columns pruning + limitRows early-stop -------------------------------


def test_columns_pruning_option(spark, tmp_path):
    """option('columns') narrows the schema and realigns by header name,
    independent of requested order."""
    out = str(tmp_path / "prune")
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", 2.5, False)],
        "k long, name string, x double, flag boolean",
    )
    df.coalesce(1).write.format("xlsx").mode("overwrite").save(out)
    got = (spark.read.format("xlsx").option("columns", "x,k").load(out))
    assert [f.name for f in got.schema.fields] == ["x", "k"]
    assert sorted(tuple(r) for r in got.collect()) == [(1.5, 1), (2.5, 2)]
    with pytest.raises(Exception, match="unknown columns"):
        spark.read.format("xlsx").option("columns", "nope").load(out).collect()


def test_columns_pruning_headerless(spark, tmp_path):
    """Headerless pruned reads recover source positions from the _cN
    names (no header row to realign by)."""
    p = str(tmp_path / "nohdr.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("S")
        for i in range(5):
            wb.write_row([i, f"s{i}", i * 10])
    got = (spark.read.format("xlsx").option("header", "false")
           .option("columns", "_c2,_c0").load(p))
    assert sorted(tuple(r) for r in got.collect()) == [
        (0, 0), (10, 1), (20, 2), (30, 3), (40, 4)]


def test_limit_rows_early_stop(spark, tmp_path):
    """limitRows stops each partition's scan after N rows — on both the
    batch scanner and the row reader."""
    out = str(tmp_path / "lim")
    spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    ).coalesce(1).write.format("xlsx").mode("overwrite").save(out)
    for batch in ("true", "false"):
        got = (spark.read.format("xlsx").option("limitRows", 5)
               .option("batchReader", batch).load(out))
        rows = got.collect()
        assert len(rows) == 5
        assert sorted(r.id for r in rows) == [0, 1, 2, 3, 4]


def test_property_batch_writer_equals_row_writer():
    """Property-based byte equality: for ANY column of each vectorized
    type (with nulls, specials, extremes), batch_to_rows_xml emits
    exactly the row writer's worksheet XML."""
    import io

    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from excelstream_spark.sources.xlsx.batch_write import batch_to_rows_xml

    text = st.text(
        max_size=30,
        alphabet=st.characters(exclude_categories=("Cs",)),
    )
    col_strategies = {
        "string": (T.StringType(), pa.string(), text),
        "long": (T.LongType(), pa.int64(),
                 st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        "double": (T.DoubleType(), pa.float64(),
                   st.floats(allow_nan=True, allow_infinity=True, width=64)),
        "bool": (T.BooleanType(), pa.bool_(), st.booleans()),
        "date": (T.DateType(), pa.date32(),
                 st.dates(min_value=dt.date(1890, 1, 1),
                          max_value=dt.date(2300, 1, 1))),
        "ts": (T.TimestampNTZType(), pa.timestamp("us"),
               st.datetimes(min_value=dt.datetime(1890, 1, 1),
                            max_value=dt.datetime(2300, 1, 1))),
    }

    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def run(data):
        kinds = data.draw(
            st.lists(st.sampled_from(sorted(col_strategies)),
                     min_size=1, max_size=4)
        )
        n = data.draw(st.integers(min_value=1, max_value=8))
        cols, fields, pa_fields = [], [], []
        for j, k in enumerate(kinds):
            spark_t, pa_t, strat = col_strategies[k]
            cols.append(data.draw(
                st.lists(st.one_of(st.none(), strat), min_size=n, max_size=n)
            ))
            fields.append(T.StructField(f"c{j}", spark_t))
            pa_fields.append(pa.field(f"c{j}", pa_t))
        schema = T.StructType(fields)
        batch = pa.RecordBatch.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, pa_fields)],
            schema=pa.schema(pa_fields),
        )
        rows = [list(t) for t in zip(*cols)]
        b1, b2 = io.BytesIO(), io.BytesIO()
        with WorkbookWriter(b1) as wb:
            wb.add_sheet("S")
            for r in rows:
                wb.write_row(r)
        with WorkbookWriter(b2) as wb:
            wb.add_sheet("S")
            wb.write_rows_xml(
                batch_to_rows_xml(batch, schema, wb.next_row_index), n
            )
        x1 = zipfile.ZipFile(b1).read("xl/worksheets/sheet1.xml")
        x2 = zipfile.ZipFile(b2).read("xl/worksheets/sheet1.xml")
        assert x1 == x2

    run()


def test_header_consumes_sheet_raises_not_spins(spark, tmp_path):
    """maxRowsPerSheet=1 with a header cannot make progress after a
    split; both write paths must raise, not loop forever."""
    df = spark.range(5).select(F.col("id"))
    for bw in ("true", "false"):
        out = str(tmp_path / f"tiny_{bw}")
        with pytest.raises(Exception, match="maxRowsPerSheet|no room"):
            (df.coalesce(1).write.format("xlsx").mode("overwrite")
             .option("batchWriter", bw)
             .option("maxRowsPerSheet", 1).save(out))


def test_batch_writer_style_zero_on_dates_matches_row_writer():
    """columnStyles index 0 ('default') on date/timestamp columns emits
    s=\"0\" on both paths (truthiness regression)."""
    import io

    import pyarrow as pa

    from excelstream_spark.sources.xlsx.batch_write import batch_to_rows_xml

    schema = T.StructType([
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampNTZType()),
    ])
    rows = [[dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5)]]
    batch = pa.RecordBatch.from_arrays(
        [pa.array([rows[0][0]], type=pa.date32()),
         pa.array([rows[0][1]], type=pa.timestamp("us"))],
        schema=pa.schema([pa.field("d", pa.date32()),
                          pa.field("ts", pa.timestamp("us"))]),
    )
    b1, b2 = io.BytesIO(), io.BytesIO()
    with WorkbookWriter(b1) as wb:
        wb.add_sheet("S")
        for r in rows:
            wb.write_row(list(r), styles=[0, 0])
    with WorkbookWriter(b2) as wb:
        wb.add_sheet("S")
        wb.write_rows_xml(
            batch_to_rows_xml(batch, schema, wb.next_row_index,
                              col_styles=[0, 0]),
            1,
        )
    x1 = zipfile.ZipFile(b1).read("xl/worksheets/sheet1.xml")
    x2 = zipfile.ZipFile(b2).read("xl/worksheets/sheet1.xml")
    assert x1 == x2 and b's="0"' in x1


# --- foreign-writer interop ------------------------------------------------


def _foreign_workbook(path: str) -> None:
    """Hand-built workbook imitating OTHER writers' XML shapes: namespace
    prefixes on worksheet elements, attribute order s= before r=, a
    dimension element, cached-formula cells (t="str"), inline strings
    with rich-text runs, and cells with no r= attribute at all."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<x:worksheet xmlns:x="{ns}"><x:dimension ref="A1:C4"/>'
        "<x:sheetData>"
        '<x:row r="1"><x:c r="A1" t="inlineStr"><x:is><x:t>id</x:t></x:is></x:c>'
        '<x:c r="B1" t="inlineStr"><x:is><x:t>name</x:t></x:is></x:c>'
        '<x:c r="C1" t="inlineStr"><x:is><x:t>x</x:t></x:is></x:c></x:row>'
        # attr order reversed (s before r), one gap (B2 absent)
        '<x:row r="2"><x:c s="0" r="A2"><x:v>1</x:v></x:c>'
        '<x:c r="C2"><x:v>1.5</x:v></x:c></x:row>'
        # cached formula result: t="str" + <f> element
        '<x:row r="3"><x:c r="A3"><x:v>2</x:v></x:c>'
        '<x:c r="B3" t="str"><x:f>CONCAT("a","b")</x:f><x:v>ab</x:v></x:c>'
        '<x:c r="C3"><x:v>2.5</x:v></x:c></x:row>'
        # no r= attributes: cells assigned sequentially; rich-text runs
        '<x:row><x:c><x:v>3</x:v></x:c>'
        '<x:c t="inlineStr"><x:is><x:r><x:t>ri</x:t></x:r><x:r><x:t>ch</x:t></x:r></x:is></x:c>'
        "<x:c><x:v>3.5</x:v></x:c></x:row>"
        "</x:sheetData></x:worksheet>"
    )
    wb_xml = (
        '<?xml version="1.0"?>'
        f'<workbook xmlns="{ns}" xmlns:r="{rns}">'
        '<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_foreign_writer_shapes(spark, tmp_path):
    """Files from other xlsx producers read correctly: the regex fast
    path rejects unknown shapes and the exact fallback handles them."""
    p = str(tmp_path / "foreign.xlsx")
    _foreign_workbook(p)
    with WorkbookReader(p) as rb:
        assert rb.sheet_names() == ["Data"]
        rows = list(rb.iter_rows("Data"))
    assert rows[0] == ["id", "name", "x"]
    assert rows[1] == [1, None, 1.5]          # gap -> None
    assert rows[2] == [2, "ab", 2.5]          # cached formula value
    assert rows[3] == [3, "rich", 3.5]        # sequential cells + runs
    # Spark surface, both reader paths
    for batch in ("true", "false"):
        df = (spark.read.format("xlsx").option("batchReader", batch).load(p))
        got = sorted(tuple(r) for r in df.collect())
        assert got == [(1, None, 1.5), (2, "ab", 2.5), (3, "rich", 3.5)]
        assert df.schema.simpleString() == "struct<id:bigint,name:string,x:double>"


# --- error-message quality (reference integration_test.rs:330-354) --------


def test_error_message_quality(spark, tmp_path):
    """Errors name the problem and the remedy: unknown sheet lists the
    available ones; a non-xlsx file names the missing member."""
    p = str(tmp_path / "one.xlsx")
    with WorkbookWriter(p) as wb:
        wb.add_sheet("Only")
        wb.write_row(["a"])
    with WorkbookReader(p) as rb:
        with pytest.raises(ValueError, match=r"not found.*Only"):
            rb.resolve_sheet("Nope")
        with pytest.raises(ValueError, match="out of range"):
            rb.resolve_sheet(5)
    bad = str(tmp_path / "not_excel.xlsx")
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("random.txt", "hi")
    with pytest.raises(ValueError, match="missing xl/workbook.xml"):
        WorkbookReader(bad)
    notzip = str(tmp_path / "plain.xlsx")
    with open(notzip, "w") as f:
        f.write("csv,not,zip")
    with pytest.raises(zipfile.BadZipFile):
        WorkbookReader(notzip)
