"""Property-based round-trip tests for the stdlib xlsx codec (hypothesis).

The codec is the connector's decode/encode foundation, so it gets the
heaviest-duty correctness treatment: arbitrary typed frames must round-trip
exactly (floats bit-exact, datetimes to the microsecond, any XML-hostile
string content)."""

from __future__ import annotations

import datetime as dt
import math
import os
import tempfile

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark_excel_datasource_spark.sources import minixlsx

# XML 1.0 forbids most control chars; the writer targets valid XML, so the
# string domain excludes them (real Excel has the same restriction).
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\x00\x0b\x0c"
    ).filter(lambda c: c >= " " or c in "\t\n\r"),
    max_size=40,
)
_floats = st.floats(allow_nan=False, allow_infinity=True, width=64)
_ints = st.integers(min_value=-(2**53), max_value=2**53)
_dts = st.datetimes(
    min_value=dt.datetime(1900, 3, 1), max_value=dt.datetime(2200, 1, 1)
)
_dates = st.dates(min_value=dt.date(1900, 3, 1), max_value=dt.date(2200, 1, 1))
_cell = st.one_of(
    st.none(), _text, _floats, _ints, st.booleans(), _dts, _dates
)


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(st.tuples(_cell, _cell, _cell), min_size=0, max_size=12),
)
def test_roundtrip_arbitrary_frames(rows):
    frame = pd.DataFrame(rows, columns=["a", "b", "c"], dtype=object)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.xlsx")
        minixlsx.write_xlsx(p, frame)
        back = minixlsx.read_xlsx(p)
    assert list(back.columns) == ["a", "b", "c"]
    assert len(back) == len(frame)
    for col in frame.columns:
        for orig, got in zip(frame[col], back[col]):
            orig = _norm(orig)
            got = _norm(got)
            if isinstance(orig, dt.datetime):
                assert isinstance(got, dt.datetime)
                assert abs((got - orig).total_seconds()) < 1e-5
            elif isinstance(orig, float):
                # repr round-trip: bit-exact (incl. +-inf)
                assert got == orig, (orig, got)
            else:
                assert got == orig, (orig, got)


@settings(max_examples=20, deadline=None)
@given(n=st.integers(min_value=0, max_value=50), chunk=st.integers(1, 17))
def test_chunked_reads_partition_rows_exactly(n, chunk):
    frame = pd.DataFrame({"i": list(range(n))}, dtype=object)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.xlsx")
        minixlsx.write_xlsx(p, frame)
        assert minixlsx.count_data_rows(p) == n
        seen = []
        for start in range(0, max(n, 1), chunk):
            part = minixlsx.read_xlsx(p, skip_rows=start, n_rows=chunk)
            seen.extend(part["i"].tolist() if n else [])
        assert seen == list(range(n))


@settings(max_examples=40, deadline=None)
@given(
    parts=st.lists(
        st.lists(st.tuples(_cell, _cell, _cell), min_size=0, max_size=6),
        min_size=1,
        max_size=4,
    ),
)
def test_streaming_merge_equals_concat(parts):
    """merge_xlsx_stream (the sink's constant-memory single-file commit,
    VERDICT r11 #7) must produce EXACTLY the workbook the old
    read-all-concat-write merge produced: same rows in part order, same
    value round-trip guarantees."""
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i, rows in enumerate(parts):
            p = os.path.join(d, f"part-{i:05d}.xlsx")
            minixlsx.write_xlsx(
                p, pd.DataFrame(rows, columns=["a", "b", "c"], dtype=object)
            )
            paths.append(p)
        out = os.path.join(d, "merged.xlsx")
        n = minixlsx.merge_xlsx_stream(out, paths, ["a", "b", "c"])
        back = minixlsx.read_xlsx(out)
    flat = [r for rows in parts for r in rows]
    assert n == len(flat) == len(back)
    assert list(back.columns) == ["a", "b", "c"]
    for (orig_row, got_row) in zip(flat, back.itertuples(index=False)):
        for orig, got in zip(orig_row, got_row):
            orig, got = _norm(orig), _norm(got)
            if isinstance(orig, dt.datetime):
                assert isinstance(got, dt.datetime)
                assert abs((got - orig).total_seconds()) < 1e-5
            else:
                assert got == orig, (orig, got)
