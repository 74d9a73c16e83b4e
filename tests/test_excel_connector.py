"""Excel connector unit tests.

Resurrects the reference's six *disabled* tests as real ones (its
``tests/test_excel_connector.py:73-216`` define them but never run them,
SURVEY.md §5.1) and adds the coverage the reference lacks: error paths,
no-header mode, the type matrix, Arrow/row equivalence, chunked partitions
and multi-partition writes.
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from pyspark_excel_datasource_spark.sources.excel import register_excel
from pyspark_excel_datasource_spark.sources import minixlsx


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_excel(spark)


def _write(path, rows, columns, header=True):
    minixlsx.write_xlsx(path, pd.DataFrame(rows, columns=columns), header=header)


def test_directory_scan_union(spark, tmp_path):
    """Reference's one live test: 3 files (2+2+1 rows) → 5 rows, exact set."""
    d = tmp_path / "people"
    d.mkdir()
    _write(str(d / "f1.xlsx"), [(1, "Alice"), (2, "Bob")], ["id", "name"])
    _write(str(d / "f2.xlsx"), [(3, "Charlie"), (4, "David")], ["id", "name"])
    _write(str(d / "F3.XLSX"), [(5, "Eve")], ["id", "name"])  # case-insensitive ext
    df = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", str(d))
        .load()
    )
    assert sorted(map(tuple, df.collect())) == [
        (1, "Alice"), (2, "Bob"), (3, "Charlie"), (4, "David"), (5, "Eve"),
    ]


def test_partition_per_file(spark, tmp_path):
    d = tmp_path / "five"
    d.mkdir()
    for i in range(5):
        _write(str(d / f"f{i}.xlsx"), [(i, f"Name_{i}")], ["id", "name"])
    df = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", str(d))
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 5


def test_user_schema_extra_column_ignored(spark, tmp_path):
    p = str(tmp_path / "extra.xlsx")
    _write(p, [(1, "Alice", "X")], ["id", "name", "extra"])
    df = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", p)
        .load()
    )
    assert df.columns == ["id", "name"]
    assert df.collect()[0] == (1, "Alice")


def test_user_schema_missing_column_errors(spark, tmp_path):
    p = str(tmp_path / "missing.xlsx")
    _write(p, [(1,)], ["id"])
    df = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", p)
        .load()
    )
    with pytest.raises(Exception, match="(?i)missing|name"):
        df.collect()


def test_infer_schema_types(spark, tmp_path):
    """Sample-based inference (fixes reference Q1-Q3: zero-row peek made
    everything a string; int mapped to 32-bit)."""
    p = str(tmp_path / "typed.xlsx")
    frame = pd.DataFrame(
        {
            "c_int": [1, 2, None],
            "c_float": [1.5, None, 2.5],
            "c_bool": [True, False, None],
            "c_ts": [dt.datetime(2024, 1, 1, 12, 0, 0), None, dt.datetime(2024, 6, 1)],
            "c_date": [dt.date(2024, 1, 1), dt.date(2024, 2, 2), None],
            "c_str": ["a", None, "c"],
        },
        dtype=object,
    )
    minixlsx.write_xlsx(p, frame)
    df = spark.read.format("excel").option("path", p).load()
    got = dict(df.dtypes)
    assert got["c_int"] == "bigint"
    assert got["c_float"] == "double"
    assert got["c_bool"] == "boolean"
    assert got["c_ts"] == "timestamp"
    assert got["c_date"] == "date"
    assert got["c_str"] == "string"
    rows = df.filter("c_int = 1").collect()
    assert rows[0]["c_int"] == 1 and rows[0]["c_ts"] == dt.datetime(2024, 1, 1, 12)


def test_infer_schema_false_all_strings(spark, tmp_path):
    p = str(tmp_path / "strs.xlsx")
    _write(p, [(1, "Alice")], ["id", "name"])
    df = (
        spark.read.format("excel")
        .option("path", p)
        .option("inferSchema", "false")
        .load()
    )
    assert dict(df.dtypes) == {"id": "string", "name": "string"}
    assert df.collect()[0] == ("1", "Alice")


def test_no_header_positional_columns(spark, tmp_path):
    p = str(tmp_path / "nohdr.xlsx")
    _write(p, [(1, "Alice"), (2, "Bob")], ["x", "y"], header=False)
    df = (
        spark.read.format("excel")
        .option("path", p)
        .option("header", "false")
        .load()
    )
    assert df.columns == ["_c0", "_c1"]
    assert df.count() == 2


def test_roundtrip_multi_partition_write(spark, tmp_path):
    """Reference R9 is last-partition-wins on multi-partition input
    (connector.py:296-319); ours must keep every row."""
    out = str(tmp_path / "rt.xlsx")
    df = spark.range(0, 100).selectExpr("id", "concat('n', id) as name")
    df.repartition(7).write.format("excel").option("path", out).mode("overwrite").save()
    back = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", out)
        .load()
    )
    assert sorted(r.id for r in back.collect()) == list(range(100))


def test_write_without_overwrite_errors(spark, tmp_path):
    out = str(tmp_path / "exists.xlsx")
    df = spark.range(3).selectExpr("id")
    df.write.format("excel").option("path", out).mode("overwrite").save()
    with pytest.raises(Exception, match="(?i)overwrite|exists"):
        df.write.format("excel").option("path", out).save()


def test_arrow_and_row_paths_equal(spark, tmp_path):
    p = str(tmp_path / "modes.xlsx")
    _write(p, [(i, f"v{i}", i * 1.5) for i in range(20)], ["id", "s", "v"])
    arrow = spark.read.format("excel").option("path", p).load()
    rowmode = (
        spark.read.format("excel")
        .option("path", p)
        .option("enableArrow", "false")
        .load()
    )
    assert sorted(map(tuple, arrow.collect())) == sorted(map(tuple, rowmode.collect()))


def test_chunked_partitions(spark, tmp_path):
    p = str(tmp_path / "big.xlsx")
    _write(p, [(i, i * 2) for i in range(100)], ["a", "b"])
    df = (
        spark.read.format("excel")
        .option("path", p)
        .option("chunkRows", "30")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4  # 30+30+30+10
    assert df.count() == 100
    assert sorted(r.a for r in df.collect()) == list(range(100))


def test_filter_pushdown_correctness(spark, tmp_path):
    p = str(tmp_path / "flt.xlsx")
    _write(p, [(i, f"s{i}") for i in range(50)], ["id", "s"])
    df = spark.read.format("excel").option("path", p).load()
    got = df.filter("id >= 40 and id < 45").collect()
    assert sorted(r.id for r in got) == [40, 41, 42, 43, 44]


def test_empty_directory_errors(spark, tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(Exception, match="(?i)no .xlsx"):
        spark.read.format("excel").schema("id long").option("path", str(d)).load().collect()


def test_bad_path_errors(spark, tmp_path):
    with pytest.raises(Exception, match="(?i)does not exist"):
        (
            spark.read.format("excel")
            .schema("id long")
            .option("path", str(tmp_path / "nope.xlsx"))
            .load()
            .collect()
        )


def test_multifile_directory_write(spark, tmp_path):
    out = str(tmp_path / "outdir")
    df = spark.range(0, 40).selectExpr("id")
    (
        df.repartition(4)
        .write.format("excel")
        .option("path", out)
        .option("multiFile", "true")
        .mode("overwrite")
        .save()
    )
    parts = [f for f in os.listdir(out) if f.endswith(".xlsx")]
    assert len(parts) == 4
    back = spark.read.format("excel").schema("id long").option("path", out).load()
    assert sorted(r.id for r in back.collect()) == list(range(40))


def test_error_contract_analysis_exception(spark, tmp_path):
    """Reference error contract: reader/writer/schema failures surface as
    AnalysisException (reference connector.py:93-94,202-203,276-277,
    321-322). Driver-side (planning) failures keep the type at the user
    API; executor-side ones are wrapped by Spark's Python worker but
    originate from AnalysisException in the connector."""
    from pyspark.errors import AnalysisException

    # planning-time: nonexistent path → AnalysisException at the API
    with pytest.raises(AnalysisException, match="(?i)does not exist"):
        (
            spark.read.format("excel")
            .option("path", str(tmp_path / "ghost.xlsx"))
            .load()
        )

    # planning-time: empty directory → AnalysisException at the API
    d = tmp_path / "empty_contract"
    d.mkdir()
    with pytest.raises(AnalysisException, match="(?i)no .xlsx"):
        spark.read.format("excel").option("path", str(d)).load()

    # executor-time: missing schema column — Spark wraps worker errors,
    # but the connector's AnalysisException is the recorded cause
    p = str(tmp_path / "contract.xlsx")
    _write(p, [(1,)], ["id"])
    df = (
        spark.read.format("excel")
        .schema("id long, ghost_col string")
        .option("path", p)
        .load()
    )
    with pytest.raises(Exception, match="AnalysisException") as exc_info:
        df.collect()
    assert "ghost_col" in str(exc_info.value)


def test_error_contract_unit_level(tmp_path):
    """The connector itself raises AnalysisException (not ValueError) on
    every reader/writer/schema failure path."""
    import pandas as pd
    from pyspark.errors import AnalysisException

    from pyspark_excel_datasource_spark.sources.excel import (
        ExcelOptions,
        ExcelStreamReader,
        _frame_to_batches,
        _list_input_files,
    )
    from pyspark.sql import types as T

    with pytest.raises(AnalysisException):
        ExcelOptions.from_options({})  # no path
    with pytest.raises(AnalysisException):
        _list_input_files(str(tmp_path / "nope"))
    schema = T.StructType([T.StructField("missing", T.StringType())])
    with pytest.raises(AnalysisException):
        list(_frame_to_batches(pd.DataFrame({"other": [1]}), schema))
    rdr = ExcelStreamReader(
        schema, ExcelOptions.from_options({"path": str(tmp_path / "not_a_dir")})
    )
    with pytest.raises(AnalysisException):
        rdr._current_files()


# ---------------------------------------------------------------------------
# Column-pruned decode (SURVEY §4.2 — the reference decodes every column
# unconditionally, connector.py:185-200)
# ---------------------------------------------------------------------------


def test_minixlsx_usecols_prunes_columns(tmp_path):
    p = str(tmp_path / "wide.xlsx")
    cols = [f"c{i}" for i in range(6)]
    _write(p, [(0, 1, 2, 3, 4, 5), (10, 11, 12, 13, 14, 15)], cols)
    frame = minixlsx.read_xlsx(p, usecols=["c1", "c4"])
    assert list(frame.columns) == ["c1", "c4"]
    assert frame["c1"].tolist() == [1, 11]
    assert frame["c4"].tolist() == [4, 14]
    # names absent from the sheet are ignored here (schema binding owns
    # the missing-column error)
    frame = minixlsx.read_xlsx(p, usecols=["c2", "ghost"])
    assert list(frame.columns) == ["c2"]


def test_minixlsx_usecols_no_header_positional(tmp_path):
    p = str(tmp_path / "nohdr_wide.xlsx")
    _write(p, [(1, "a", True), (2, "b", False)], ["x", "y", "z"], header=False)
    frame = minixlsx.read_xlsx(p, header=False, usecols=["_c0", "_c2"])
    assert list(frame.columns) == ["_c0", "_c2"]
    assert frame["_c2"].tolist() == [True, False]


def test_parse_row_want_skips_decode(tmp_path):
    """_parse_row with a want-set never decodes unselected cells — the
    skipped shared-string index is left unresolved, proving the decode
    (not just the output projection) is pruned."""
    import xml.etree.ElementTree as ET

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    # B1 points at shared-string slot 99 which does NOT exist: decoding it
    # would raise IndexError
    row = ET.fromstring(
        f'<row xmlns="{ns}" r="1">'
        '<c r="A1"><v>42</v></c>'
        '<c r="B1" t="s"><v>99</v></c>'
        "</row>"
    )
    cells = minixlsx._parse_row(row, shared=[], date_xfs={}, want={0})
    assert cells == {0: 42}
    with pytest.raises(IndexError):
        minixlsx._parse_row(row, shared=[], date_xfs={}, want=None)


def test_connector_pruned_read_narrow_schema(spark, tmp_path):
    """User-bound 2-column schema over a 6-column sheet: pruned decode,
    same results, filters on pruned columns impossible by construction
    (Spark only knows the bound schema)."""
    p = str(tmp_path / "wide2.xlsx")
    cols = [f"c{i}" for i in range(6)]
    _write(p, [(i, i * 10, i * 100, f"s{i}", float(i), i % 2 == 0) for i in range(20)],
           cols)
    df = (
        spark.read.format("excel")
        .schema("c0 long, c3 string")
        .option("path", p)
        .load()
        .filter("c0 >= 18")
    )
    assert sorted(map(tuple, df.collect())) == [(18, "s18"), (19, "s19")]


def test_columns_option_prunes_inferred_schema(spark, tmp_path):
    """The `columns` read option narrows schema inference AND the decode,
    in option order; unknown names raise."""
    p = str(tmp_path / "colopt.xlsx")
    _write(p, [(1, "a", 1.5, True), (2, "b", 2.5, False)],
           ["id", "name", "score", "flag"])
    df = (
        spark.read.format("excel")
        .option("path", p)
        .option("columns", "score, id")
        .load()
    )
    assert df.columns == ["score", "id"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "double", "bigint",
    ]
    assert sorted(map(tuple, df.collect())) == [(1.5, 1), (2.5, 2)]

    with pytest.raises(Exception, match="ghost"):
        (
            spark.read.format("excel")
            .option("path", p)
            .option("columns", "id,ghost")
            .load()
        )


def test_chunk_scale_staged_write_and_chunked_readback(spark, tmp_path):
    """Chunk-scale writer pin (round-6): a 100k-row × 4-col frame across
    16 partitions through the staged-parts commit path, then a chunked
    (chunkRows) multi-partition readback. Pins (a) every row surviving
    the merge with no cross-part duplication, (b) per-task staging
    actually cleaned up, (c) the reader's chunk planner splitting the
    merged workbook. Multi-file mode avoids the driver-side merge for
    the big frame; the single-file merge path is separately covered at
    100 rows above — at real scale multi-file IS the writer contract
    (one workbook per task, renamed atomically)."""
    out_dir = str(tmp_path / "big_excel")
    n = 100_000
    df = spark.range(0, n).selectExpr(
        "id",
        "concat('name_', id) AS name",
        "cast(id % 97 AS double) / 7.0 AS val",
        "concat('grp', id % 13) AS grp",
    )
    (
        df.repartition(16)
        .write.format("excel")
        .option("path", out_dir)
        .option("multiFile", "true")
        .mode("overwrite")
        .save()
    )
    import glob
    import os

    parts = sorted(glob.glob(os.path.join(out_dir, "part-*.xlsx")))
    assert len(parts) == 16
    assert not glob.glob(str(tmp_path / "big_excel.__staging__*")), (
        "staging dir leaked"
    )
    back = (
        spark.read.format("excel")
        .schema("id long, name string, val double, grp string")
        .option("path", os.path.join(out_dir, "*.xlsx"))
        .option("chunkRows", "4096")
        .load()
    )
    assert back.rdd.getNumPartitions() > 16  # chunk planner split the parts
    total, distinct = back.count(), back.select("id").distinct().count()
    assert total == n and distinct == n


def test_multisheet_workbook_roundtrip(spark, tmp_path):
    """write_xlsx_multi produces a workbook whose sheets resolve by name
    AND by 0-based index through the datasource."""
    import pandas as pd

    from pyspark_excel_datasource_spark.sources import minixlsx
    from pyspark_excel_datasource_spark.sources.excel import register_excel

    path = str(tmp_path / "multi.xlsx")
    minixlsx.write_xlsx_multi(
        path,
        {
            "alpha": pd.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "z"]}),
            "beta": pd.DataFrame({"b": [10.5, 20.25], "t": ["p", "q"]}),
        },
    )
    register_excel(spark)
    by_name = (
        spark.read.format("excel").option("path", path)
        .option("sheetName", "beta").load()
    )
    assert sorted(r.b for r in by_name.collect()) == [10.5, 20.25]
    by_index = (
        spark.read.format("excel").option("path", path)
        .option("sheetName", "0").load()
    )
    assert sorted(r.a for r in by_index.collect()) == [1, 2, 3]


def test_recursive_lookup_walks_nested_dirs(spark, tmp_path):
    """recursiveFileLookup=true unions workbooks from nested directories;
    the default (reference parity, connector.py:148-156) sees only the
    top level."""
    d = tmp_path / "drop"
    (d / "2026" / "08").mkdir(parents=True)
    _write(str(d / "top.xlsx"), [(1, "top")], ["id", "name"])
    _write(str(d / "2026" / "mid.xlsx"), [(2, "mid")], ["id", "name"])
    _write(str(d / "2026" / "08" / "leaf.xlsx"), [(3, "leaf")], ["id", "name"])
    (d / "2026" / "notes.txt").write_text("decoy")

    flat = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", str(d))
        .load()
    )
    assert sorted(r.id for r in flat.collect()) == [1]

    deep = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", str(d))
        .option("recursiveFileLookup", "true")
        .load()
    )
    assert sorted(map(tuple, deep.collect())) == [
        (1, "top"), (2, "mid"), (3, "leaf"),
    ]
    assert deep.rdd.getNumPartitions() == 3  # one per discovered file


def test_recursive_glob_double_star(spark, tmp_path):
    """A ``**`` glob pattern resolves through the recursive lister."""
    d = tmp_path / "g"
    (d / "a" / "b").mkdir(parents=True)
    _write(str(d / "a" / "x.xlsx"), [(1, "x")], ["id", "name"])
    _write(str(d / "a" / "b" / "y.xlsx"), [(2, "y")], ["id", "name"])
    df = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", str(d / "**" / "*.xlsx"))
        .option("recursiveFileLookup", "true")
        .load()
    )
    assert sorted(r.id for r in df.collect()) == [1, 2]


def test_all_sheets_union(spark, tmp_path):
    """sheetName="*" unions every sheet; one partition per (file, sheet);
    inferred schema comes from the first sheet."""
    path = str(tmp_path / "wb.xlsx")
    minixlsx.write_xlsx_multi(
        path,
        {
            "jan": pd.DataFrame({"id": [1, 2], "name": ["a", "b"]}),
            "feb": pd.DataFrame({"id": [3], "name": ["c"]}),
            "mar": pd.DataFrame({"id": [4, 5], "name": ["d", "e"]}),
        },
    )
    df = (
        spark.read.format("excel")
        .option("path", path)
        .option("sheetName", "*")
        .load()
    )
    assert df.schema.simpleString() == "struct<id:bigint,name:string>"
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4, 5]
    assert df.rdd.getNumPartitions() == 3


def test_all_sheets_chunked_partitions(spark, tmp_path):
    """chunkRows composes with all-sheets: row-range chunks are planned
    per sheet, and the union stays exact."""
    path = str(tmp_path / "wbc.xlsx")
    minixlsx.write_xlsx_multi(
        path,
        {
            "s1": pd.DataFrame({"id": list(range(5))}),
            "s2": pd.DataFrame({"id": list(range(5, 8))}),
        },
    )
    df = (
        spark.read.format("excel")
        .option("path", path)
        .option("sheetName", "*")
        .option("chunkRows", "2")
        .load()
    )
    # s1: ceil(5/2)=3 chunks, s2: ceil(3/2)=2 chunks
    assert df.rdd.getNumPartitions() == 5
    assert sorted(r.id for r in df.collect()) == list(range(8))


def test_all_sheets_across_files(spark, tmp_path):
    """all-sheets × multi-file directory: every sheet of every workbook."""
    d = tmp_path / "many"
    d.mkdir()
    minixlsx.write_xlsx_multi(
        str(d / "w1.xlsx"),
        {
            "a": pd.DataFrame({"id": [1]}),
            "b": pd.DataFrame({"id": [2]}),
        },
    )
    minixlsx.write_xlsx_multi(
        str(d / "w2.xlsx"),
        {"only": pd.DataFrame({"id": [3]})},
    )
    df = (
        spark.read.format("excel")
        .schema("id long")
        .option("path", str(d))
        .option("sheetName", "*")
        .load()
    )
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]
    assert df.rdd.getNumPartitions() == 3


# ---------------------------------------------------------------------------
# Dialect guards: unsupported workbook features fail loudly, naming the
# feature (README "Excel dialect"; openpyxl accepts these, minixlsx
# refuses rather than misread)
# ---------------------------------------------------------------------------


def _patch_zip_member(path: str, member: str, transform) -> None:
    """Rewrite one member of an xlsx zip in place (test fixture forge)."""
    import zipfile

    src = zipfile.ZipFile(path)
    items = {n: src.read(n) for n in src.namelist()}
    src.close()
    items[member] = transform(items[member])
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as out:
        for n, data in items.items():
            out.writestr(n, data)


@pytest.mark.parametrize("flag", ["1", "true", "on", "TRUE", "On"])
def test_minixlsx_1904_date_system_reads_correctly(tmp_path, flag):
    """A workbook in the Mac-legacy 1904 date system reads with the
    1904-01-01 epoch (a 1,462-day offset vs the 1900 system): the writer
    emits 1900-system serials, so after stamping date1904 the same serial
    must decode 1,462 days LATER — proving the epoch switch is applied,
    for every ST_OnOff spelling of the flag."""
    p = str(tmp_path / "mac.xlsx")
    ts = dt.datetime(2024, 3, 1, 12, 0)
    _write(p, [(1, ts)], ["id", "ts"])
    _patch_zip_member(
        p,
        "xl/workbook.xml",
        lambda b: b.replace(
            b"<sheets>", f'<workbookPr date1904="{flag}"/><sheets>'.encode(), 1
        ),
    )
    out = minixlsx.read_xlsx(p)
    assert out["ts"][0] == ts + dt.timedelta(days=1462)


def test_minixlsx_1904_roundtrip_serial(tmp_path):
    """A 1904-system serial decodes to the calendar date it means: serial
    0 is 1904-01-01 (vs 1899-12-30 in the 1900 system)."""
    p = str(tmp_path / "mac0.xlsx")
    _write(p, [(1, dt.date(1904, 1, 2))], ["id", "d"])  # 1900-serial 1464
    _patch_zip_member(
        p,
        "xl/workbook.xml",
        lambda b: b.replace(b"<sheets>", b'<workbookPr date1904="1"/><sheets>', 1),
    )
    out = minixlsx.read_xlsx(p)
    # 1900-serial 1464 re-read as a 1904 serial: 1904-01-01 + 1464 days
    assert out["d"][0] == dt.date(1904, 1, 2) + dt.timedelta(days=1462)


def test_minixlsx_date1904_unrecognized_value_fails_loudly(tmp_path):
    """An ST_OnOff value outside 1/true/on/0/false/off must raise naming
    the attribute — guessing the epoch would silently shift every date by
    ~4 years."""
    p = str(tmp_path / "mac3.xlsx")
    _write(p, [(1, dt.datetime(2024, 3, 1))], ["id", "ts"])
    _patch_zip_member(
        p,
        "xl/workbook.xml",
        lambda b: b.replace(
            b"<sheets>", b'<workbookPr date1904="yes"/><sheets>', 1
        ),
    )
    with pytest.raises(ValueError, match="date1904"):
        minixlsx.read_xlsx(p)


def test_minixlsx_date1904_false_spellings_keep_1900_epoch(tmp_path):
    """Explicit off/false/0 keep the 1900 epoch — values read unchanged."""
    ts = dt.datetime(2024, 3, 1, 6, 30)
    for i, flag in enumerate(["0", "false", "off"]):
        p = str(tmp_path / f"win{i}.xlsx")
        _write(p, [(1, ts)], ["id", "ts"])
        _patch_zip_member(
            p,
            "xl/workbook.xml",
            lambda b, flag=flag: b.replace(
                b"<sheets>", f'<workbookPr date1904="{flag}"/><sheets>'.encode(), 1
            ),
        )
        assert minixlsx.read_xlsx(p)["ts"][0] == ts


def test_minixlsx_uncached_formula_fails_loudly(tmp_path):
    """A formula cell with no cached value must raise naming the cell —
    minixlsx does not evaluate formulas, and returning null would be a
    silent data change."""
    p = str(tmp_path / "formula.xlsx")
    _write(p, [(1, 2.0)], ["id", "v"])
    _patch_zip_member(
        p,
        "xl/worksheets/sheet1.xml",
        lambda b: b.replace(
            b'<c r="B2"><v>2.0</v></c>', b'<c r="B2"><f>A2*2</f></c>', 1
        ),
    )
    with pytest.raises(ValueError, match="formula cell"):
        minixlsx.read_xlsx(p)


def test_connector_reads_1904_workbook(spark, tmp_path):
    """Through the connector a 1904-system workbook reads with the epoch
    switch applied (the writer emitted 1900-system serials, so the stamped
    re-read lands 1,462 days later) — no dialect error."""
    p = str(tmp_path / "mac2.xlsx")
    ts = dt.datetime(2024, 3, 1, 12, 0)
    _write(p, [(1, ts)], ["id", "ts"])
    _patch_zip_member(
        p,
        "xl/workbook.xml",
        lambda b: b.replace(b"<sheets>", b'<workbookPr date1904="1"/><sheets>', 1),
    )
    rows = (
        spark.read.format("excel")
        .schema("id long, ts timestamp")
        .option("path", p)
        .load()
        .collect()
    )
    assert rows[0]["ts"] == ts + dt.timedelta(days=1462)


def test_connector_surfaces_dialect_error_as_analysis_exception(spark, tmp_path):
    """Through the connector the dialect guard keeps the reference's error
    contract: AnalysisException text naming the feature and the file, not
    a parse crash. (The guard now fires only on an UNRECOGNIZED date1904
    value — both real date systems are supported.)"""
    p = str(tmp_path / "mac4.xlsx")
    _write(p, [(1, "x")], ["id", "name"])
    _patch_zip_member(
        p,
        "xl/workbook.xml",
        lambda b: b.replace(b"<sheets>", b'<workbookPr date1904="maybe"/><sheets>', 1),
    )
    df = (
        spark.read.format("excel")
        .schema("id long, name string")
        .option("path", p)
        .load()
    )
    with pytest.raises(Exception, match="date1904") as exc_info:
        df.collect()
    assert "AnalysisException" in str(exc_info.value) or "unsupported xlsx" in str(
        exc_info.value
    )
