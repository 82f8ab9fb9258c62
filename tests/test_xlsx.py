"""Dependency-free SpreadsheetML codec (sources/xlsx.py): round-trip,
byte-determinism, and a foreign-convention workbook the writer would
never produce (shared strings, rich-text runs, namespace prefixes,
missing r attributes, absolute rel targets)."""

from __future__ import annotations

import io
import zipfile

import pandas as pd
import pytest

from mex_extractors_spark.sources.xlsx import (
    _col_to_index,
    _index_to_col,
    read_xlsx,
    write_xlsx,
    xlsx_bytes,
)

MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def _frames():
    a = pd.DataFrame(
        {
            "name": ['quote" <tag> & amp', " padded ", "plain", None],
            "n": [1, 2, None, -4],
            "f": [1.5, -2.25, 3.0, None],
            "ok": [True, False, True, None],
        }
    )
    b = pd.DataFrame({"x": ["only"], "y": [42]})
    return {"first": a, "second sheet": b}


def test_round_trip_values_and_types():
    raw = xlsx_bytes(_frames())
    out = read_xlsx(raw, sheet_name=None)
    assert list(out) == ["first", "second sheet"]
    first = out["first"]
    assert first.loc[0, "name"] == 'quote" <tag> & amp'
    assert first.loc[1, "name"] == " padded "  # xml:space="preserve"
    assert pd.isna(first.loc[3, "name"]) and pd.isna(first.loc[2, "n"])
    assert first.loc[3, "n"] == -4 and first.loc[1, "f"] == -2.25
    assert first.loc[0, "ok"] is True and first.loc[1, "ok"] is False
    assert read_xlsx(raw, "second sheet").loc[0, "y"] == 42
    # int index and name address the same sheet
    assert read_xlsx(raw, 1).equals(out["second sheet"])


def test_bytes_are_deterministic(tmp_path):
    assert xlsx_bytes(_frames()) == xlsx_bytes(_frames())
    p = str(tmp_path / "w.xlsx")
    write_xlsx(p, _frames())
    assert open(p, "rb").read() == xlsx_bytes(_frames())


def test_wide_sheet_column_refs_past_z():
    cols = [f"c{i}" for i in range(30)]
    pdf = pd.DataFrame([[f"v{i}" for i in range(30)]], columns=cols)
    out = read_xlsx(xlsx_bytes({"wide": pdf}))
    assert list(out.columns) == cols
    assert out.loc[0, "c29"] == "v29"
    # A1-reference helpers agree in both directions incl. AA+
    for i in (0, 25, 26, 27, 701, 702):
        assert _col_to_index(_index_to_col(i)) == i


def test_sheet_name_with_double_quote_round_trips():
    # sheet names flow in from group values (write_group_reports); a
    # '"' is legal in a sheet name and must not break workbook.xml
    name = 'he said "hi" & <more>'
    raw = xlsx_bytes({name: pd.DataFrame({"a": [1]})})
    out = read_xlsx(raw, sheet_name=None)
    assert list(out) == [name]
    assert out[name].loc[0, "a"] == 1


def test_xml_invalid_control_char_fails_loudly():
    with pytest.raises(ValueError, match="control character"):
        xlsx_bytes({"s": pd.DataFrame({"a": ["bad\x0bvalue"]})})
    with pytest.raises(ValueError, match="control character"):
        xlsx_bytes({"s": pd.DataFrame({"a": ["nul\x00"]})})
    # \t \n \r are XML-legal and must still round-trip
    out = read_xlsx(xlsx_bytes({"s": pd.DataFrame({"a": ["tab\there"]})}))
    assert out.loc[0, "a"] == "tab\there"
    # sheet NAMES come from the same untrusted group values as cells:
    # quoteattr cannot represent XML-forbidden control chars, so the
    # same fail-loudly guard must cover them (silent corruption class)
    with pytest.raises(ValueError, match="sheet name"):
        xlsx_bytes({"bad\x0bname": pd.DataFrame({"a": [1]})})


def test_nonfinite_float_fails_loudly():
    with pytest.raises(ValueError, match="non-finite"):
        xlsx_bytes({"s": pd.DataFrame({"a": [float("inf")]})})
    with pytest.raises(ValueError, match="non-finite"):
        xlsx_bytes({"s": pd.DataFrame({"a": [float("-inf")]})})
    # NaN stays the documented blank-cell encoding
    out = read_xlsx(xlsx_bytes({"s": pd.DataFrame({"a": [float("nan"), 1.5]})}))
    assert pd.isna(out.loc[0, "a"]) and out.loc[1, "a"] == 1.5


def test_missing_sheet_raises_with_names():
    with pytest.raises(KeyError, match="no sheet named 'zzz'"):
        read_xlsx(xlsx_bytes({"only": pd.DataFrame({"a": [1]})}), "zzz")
    with pytest.raises(ValueError, match="at least one sheet"):
        xlsx_bytes({})


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _cell = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        # any printable text incl. XML-active chars; strip XML-invalid
        # control chars the codec (like Excel) does not round-trip
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
            ),
            max_size=12,
        ),
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.lists(_cell, min_size=3, max_size=3), min_size=1, max_size=8)
    )
    def test_property_round_trip(rows):
        pdf = pd.DataFrame(rows, columns=["a", "b", "c"])
        out = read_xlsx(xlsx_bytes({"s": pdf}))
        assert out.shape == pdf.shape
        for i in range(pdf.shape[0]):
            for j in range(pdf.shape[1]):
                want, got = pdf.iat[i, j], out.iat[i, j]
                if want is None or (isinstance(want, float) and want != want):
                    assert got is None or (isinstance(got, float) and got != got)
                elif isinstance(want, bool):
                    assert got is want
                elif isinstance(want, float) and want == int(want):
                    # 2.0 serializes as "2.0" and parses as float; -0.0
                    # and 0.0 compare equal by design
                    assert float(got) == want
                else:
                    assert got == want, (want, got)

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_reads_foreign_convention_workbook():
    """A workbook written with conventions our writer never uses —
    proves the reader parses the spec, not just its own output."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("_rels/.rels", "<R/>")
        zf.writestr(
            "xl/workbook.xml",
            f'<x:workbook xmlns:x="{MAIN}" xmlns:r="{REL}"><x:sheets>'
            '<x:sheet name="data" sheetId="1" r:id="rId9"/>'
            "</x:sheets></x:workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{PKG}"><Relationship Id="rId9" Type="t"'
            ' Target="/xl/worksheets/zzz.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{MAIN}"><si><t>colA</t></si>'
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/zzz.xml",
            f'<x:worksheet xmlns:x="{MAIN}"><x:sheetData>'
            # header row: no r attrs anywhere -> sequential placement
            '<x:row><x:c t="s"><x:v>0</x:v></x:c>'
            '<x:c t="inlineStr"><x:is><x:t>colB</x:t></x:is></x:c>'
            "<x:c><x:v>3</x:v></x:c></x:row>"
            # sparse row: B2 skipped, formula cell with cached value
            '<x:row r="2"><x:c r="A2" t="s"><x:v>1</x:v></x:c>'
            '<x:c r="C2"><f>1+1.5</f><x:v>2.5</x:v></x:c></x:row>'
            # row 3 entirely absent; bool + error cells in row 4
            '<x:row r="4"><x:c r="B4" t="b"><x:v>1</x:v></x:c>'
            '<x:c r="C4" t="e"><x:v>#DIV/0!</x:v></x:c></x:row>'
            "</x:sheetData></x:worksheet>",
        )
    df = read_xlsx(buf.getvalue(), "data")
    assert list(df.columns) == ["colA", "colB", "3"]
    assert df.loc[0, "colA"] == "rich"  # rich-text runs concatenated
    assert df.loc[0, "3"] == 2.5  # formula cached value
    assert pd.isna(df.loc[1, "colA"])  # absent row -> all null
    assert df.loc[2, "colB"] is True
    assert pd.isna(df.loc[2, "3"])  # error cell -> null
