"""The reference's fread fixture corpus (round-9 verdict item 6),
table-driven through `fread` with per-file expectations derived from
the reference's own assertions in /root/reference/inst/tests/tests.Rraw
(test numbers cited per case). Fixtures are read in place from the
read-only reference tree — nothing is copied — and the module skips
wholesale if the tree is absent.

Documented divergences from the reference (asserted as OUR behavior):

- doubled quotes ("" -> ") are RFC-4180-unescaped by Spark's parser;
  the reference preserves the doubled form in a few fixtures
  (tests.Rraw 1445/1886 literals).
- blank lines: the reference's blank.lines.skip=FALSE default stops at
  the first interior blank line with a warning; a distributed scan
  cannot stop early, so fread's blank_lines_skip=True default skips
  blank lines everywhere (the behavior the reference's b=TRUE twin
  tests assert).
- nrows= is a post-parse limit, so a malformed line past it does not
  error (PERMISSIVE); the reference's streaming parser never reaches
  that line.
- sep=" " is a literal single-char separator (Spark csv); the
  reference's read.table-twin fixtures with multi-space runs
  (issue_1573_fill.txt) parse but with empty fields per extra space,
  not collapsed runs.
- utf16le/be.txt: the reference ERRORS ("File is encoded in UTF-16");
  fread reads them via encoding= (tests 1627.4/.5 exceeded).
"""

from __future__ import annotations

import os

import pytest

FIX = "/root/reference/inst/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixture tree not present"
)


@pytest.fixture(scope="module")
def rd(spark):
    from data_table_spark.sources.fread import fread

    def _read(name, **kw):
        return fread(spark, os.path.join(FIX, name), **kw).df

    return _read


def test_blank_line_fixtures(rd):
    """fread_blank{,2,3}.txt (tests.Rraw 1584.x): 8 data rows of
    (1,2,3) around interior/trailing blank runs."""
    for name, n in (
        ("fread_blank.txt", 8),   # 5 rows, blank run, 3 more rows
        ("fread_blank2.txt", 5),  # trailing blank run only
        ("fread_blank3.txt", 5),
    ):
        df = rd(name)
        assert df.columns == ["a", "b", "c"]
        rows = sorted(map(tuple, df.collect()))
        assert len(rows) == n and set(rows) == {(1, 2, 3)}, name


def test_utf8_bom(rd):
    """issue_1087_utf8_bom.csv (1627.1): the BOM must not survive into
    the first column name."""
    df = rd("issue_1087_utf8_bom.csv")
    assert df.columns == ["a", "b", "c"]
    assert [tuple(r) for r in df.collect()] == [(1, 2, 3)]


def test_utf16(rd):
    """utf16le/be.txt: readable via encoding= (the reference errors,
    1627.4/.5)."""
    for name, enc in (("utf16le.txt", "UTF-16LE"), ("utf16be.txt", "UTF-16BE")):
        df = rd(name, encoding=enc)
        assert df.columns == ["a", "b"]
        assert [tuple(r) for r in df.collect()] == [("c", "d")]


def test_pipe_sep_ragged_tail(rd):
    """issue_773_fread.txt (1558.x): '|' auto-detected although the
    tail is ragged; nrows=21 returns the clean integer block; fill
    keeps all 27 rows with the int column surviving and the
    string-contaminated ones coerced (the rbind coercion 1558.5
    shows)."""
    df = rd("issue_773_fread.txt", nrows=21)
    assert df.columns == ["AAA", "BBB", "CCC"]
    rows = df.collect()
    assert len(rows) == 21
    assert tuple(rows[0]) == (4, 5, 6)
    assert tuple(rows[19]) == (31, 32, 33)
    assert tuple(rows[20]) == (21, 22, 23)

    full = rd("issue_773_fread.txt", fill=True)
    rows = full.collect()
    assert len(rows) == 27
    got = {tuple(r) for r in rows}
    assert ("ZZZ", "YYY", None) in got
    assert dict(full.dtypes)["CCC"] in ("int", "bigint")


def test_crlf_variants(rd):
    """russellCRLF.csv / russellCRCRLF.csv (1378.x): \\r\\n and the
    \\r\\r\\r\\n download artifact both parse; row 19 'Value With
    Dividends' == 357.97."""
    for name in ("russellCRLF.csv", "russellCRCRLF.csv"):
        df = rd(name, encoding="ISO-8859-1")
        rows = df.collect()
        assert len(rows) == 19
        assert rows[18]["Value With Dividends"] == 357.97
        assert rows[0]["Index Name"] == "Russell Microcap\xae Value Index"


def test_header_encoding_latin1(rd):
    """1680-fread-header-encoding.csv (1670): Latin-1 header names
    survive; ';' auto-detected."""
    df = rd("1680-fread-header-encoding.csv", encoding="ISO-8859-1")
    assert df.columns == ["Ort", "Stra\xdfe", "Bezeichnung"]
    assert df.count() == 4


def test_utf8_values(rd):
    """issue_563_fread.txt (1548.x): UTF-8 values survive."""
    df = rd("issue_563_fread.txt")
    assert df.columns == ["A", "B"]
    rows = [tuple(r) for r in df.collect()]
    assert rows[0] == ("ą", "ž")  # ą ž


def test_no_header_naming(rd):
    """quoted_no_header.csv (1886): header auto-detects FALSE, columns
    V1..V6; quoting with embedded commas/doubled quotes; trailing int
    with leading space parses (strip.white)."""
    df = rd("quoted_no_header.csv")
    assert df.columns == [f"V{i}" for i in range(1, 7)]
    rows = df.collect()
    assert rows[0]["V1"] == "John" and rows[0]["V6"] == 8075
    # reference literal keeps the doubled quotes; Spark unescapes
    assert rows[-1]["V1"] == 'Joan "the bone", Anne'
    assert rows[-1]["V6"] == 123


def test_multiline_quoted(rd):
    """doublequote_newline.csv (1445) + quoted_multiline.csv.bz2
    (1449.1): embedded newlines inside quoted fields via
    multiline=True."""
    df = rd("doublequote_newline.csv", multiline=True)
    rows = df.collect()
    assert df.columns == ["A", "B"] and len(rows) == 36
    multi = [r["B"] for r in rows if r["B"] and "\n" in r["B"]]
    assert len(multi) == 1 and multi[0].count("\n") == 2
    assert multi[0].startswith('embedded "field"')  # unescaped form

    big = rd("quoted_multiline.csv.bz2", multiline=True)
    rows = big.collect()
    assert (len(rows), len(big.columns)) == (44, 24)
    assert rows[0]["GPMLHTLN"] == 3308386085360  # 1449.1 first row


def test_winallquoted(rd):
    """winallquoted.csv.bz2 (1757): all-quoted fields + \\r\\n; typed
    columns come out int."""
    df = rd("winallquoted.csv.bz2")
    rows = df.collect()
    assert len(rows) == 4999
    assert tuple(rows[0]) == (2, 2, 25, "2013/08/29 12:06:01")
    assert tuple(rows[-1])[:3] == (2, 11, 16)


def test_fill_widening_noquote(rd):
    """noquote.csv.gz (2028.2): fill=TRUE widens to the widest row
    (10 columns, V-named), quote='' disables quoting."""
    df = rd("noquote.csv.gz", fill=True, quote="", header=False)
    assert df.columns == [f"V{i}" for i in range(1, 11)]
    rows = df.collect()
    assert len(rows) == 2095
    assert rows[0]["V1"] == "H" and rows[0]["V2"] == "Locate Reply"
    assert rows[-1]["V1"] == "T"


def test_fill_short_rows(rd):
    """536_fread_fill_1.txt (1585.x): short rows null-fill under the
    header width; blank lines skipped."""
    df = rd("536_fread_fill_1.txt", fill=True)
    assert df.columns == ["a", "b", "c"]
    rows = df.collect()
    assert len(rows) == 22
    assert tuple(rows[-1]) == (1, 2, "er")
    assert (1, None, None) in {tuple(r) for r in rows}


def test_interior_blank_tab(rd):
    """issue_1330_fread.txt (1556.x): tab sep with an interior blank
    line; blank_lines_skip reads all 5 rows (the reference's default
    stops early with a warning — divergence documented in the module
    docstring)."""
    df = rd("issue_1330_fread.txt")
    assert df.columns == ["a", "b"]
    assert sorted(map(tuple, df.collect())) == [(i, i) for i in range(1, 6)]


def test_wide_and_narrow_extremes(rd):
    """colnames4096.csv.bz2 / onecol4096.csv.bz2 (1869.6/.7): a
    header-only 586-column file yields 0 rows; the one-column file
    keeps its 256 non-blank values."""
    wide = rd("colnames4096.csv.bz2")
    assert len(wide.columns) == 586 and wide.count() == 0
    assert wide.columns[0] == "Foo000" and wide.columns[1] == "Bar001"

    one = rd("onecol4096.csv.bz2")
    assert one.columns == ["A"]
    vals = [r["A"] for r in one.collect()]
    assert len(vals) == 256
    assert vals[0] == "FooBarBazQux000" and vals[-1] == "FooBarBazQux256"


def test_allchar_and_grr(rd):
    """allchar.csv.gz (1754) + grr.csv.gz (1834.1): all-character
    corpora at size; grr reads headerless to the reference's exact
    dims."""
    ac = rd("allchar.csv.gz")
    rows = ac.collect()
    assert len(rows) == 17576
    col2 = [r[1] for r in rows]
    assert (col2[0], col2[1], col2[-2], col2[-1]) == ("AAN", "BAN", "YZZ", "ZZZ")

    grr = rd("grr.csv.gz", header=False)
    assert (grr.count(), len(grr.columns)) == (2839, 12)
    assert grr.columns[:2] == ["V1", "V2"]


def test_gz_wide_typed(rd):
    """issue_2051.csv.gz (1753.6): 50 columns through the gz codec;
    row 2's COLUMN50 is the 'Our ... tool' text field."""
    df = rd("issue_2051.csv.gz")
    rows = df.collect()
    assert (len(rows), len(df.columns)) == (2, 50)
    assert rows[1]["COLUMN50"].startswith("Our Stock Screen")


def test_backslash_in_quotes(rd):
    """issue_1164_json.txt: a backslash-escaped quote inside a quoted
    JSON field parses as 2 columns, 1 row."""
    df = rd("issue_1164_json.txt")
    rows = df.collect()
    assert (len(rows), len(df.columns)) == (1, 2)
    assert rows[0][0].startswith('{"f1":"value1"')


def test_fill_space_sep_parses(rd):
    """issue_1573_fill.txt (1622.x): multi-space layout under a literal
    single-char sep parses (names sanitized, widest-row widening) —
    run-collapsing is read.table semantics Spark csv lacks; this pins
    that the file at least round-trips without error."""
    df = rd("issue_1573_fill.txt", fill=True, na_strings=("",))
    rows = df.collect()
    assert len(rows) == 7
    assert len(df.columns) >= 12
