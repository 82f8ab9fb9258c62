"""Generic vectorized scan adapter (S4/S5/S9 shape) — unit-list →
mapInPandas with declared schema + quarantine."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from mex_extractors_spark.sources.file_scan import (
    read_csv_files_pandas,
    read_excel_files,
    read_paged_source,
    scan_units_vectorized,
    split_scan_errors,
)

SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("amount", IntegerType()),
    ]
)


def _write_csvs(tmp_path, bad_file: bool = False) -> list[str]:
    a = tmp_path / "a.csv"
    a.write_text("name,amount\nalpha,1\nbeta,2\n")
    b = tmp_path / "b.csv"
    b.write_text("name,amount,extra\ngamma,3,ignored\n")  # extra col pruned
    paths = [str(a), str(b)]
    if bad_file:
        # never created -> FileNotFoundError inside the executor callback
        paths.append(str(tmp_path / "c.csv"))
    return paths


def test_csv_scan_aligns_schema_and_prunes_extra_columns(spark, tmp_path):
    df = read_csv_files_pandas(spark, _write_csvs(tmp_path), SCHEMA)
    good, bad = split_scan_errors(df)
    rows = {(r.name, r.amount) for r in good.collect()}
    assert rows == {("alpha", 1), ("beta", 2), ("gamma", 3)}
    assert bad.count() == 0
    # declared contract, plus source lineage
    assert good.columns == ["name", "amount", "_source_unit"]


def test_bad_unit_quarantined_not_fatal(spark, tmp_path):
    paths = _write_csvs(tmp_path, bad_file=True)
    df = read_csv_files_pandas(spark, paths, SCHEMA)
    good, bad = split_scan_errors(df)
    assert good.count() == 3
    q = bad.collect()
    assert len(q) == 1
    assert q[0]._source_unit.endswith("c.csv")
    assert q[0]._scan_error


def test_missing_declared_column_becomes_null(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("name\nsolo\n")
    df = read_csv_files_pandas(spark, [str(p)], SCHEMA)
    good, _ = split_scan_errors(df)
    row = good.collect()[0]
    assert row.name == "solo" and row.amount is None


def test_paged_scan_fetches_windows_in_parallel(spark, tmp_path):
    # network-free stand-in for a paginated REST endpoint: each "page"
    # slices a local csv by (offset, limit) — voxco/grippeweb shape
    src = tmp_path / "remote.csv"
    src.write_text("name,amount\n" + "".join(f"r{i},{i}\n" for i in range(10)))

    def fetch(unit):
        import pandas as pd

        full = pd.read_csv(src)
        return full.iloc[unit["offset"] : unit["offset"] + unit["limit"]]

    df = read_paged_source(spark, fetch, SCHEMA, num_pages=4, page_size=3)
    good, bad = split_scan_errors(df)
    assert bad.count() == 0
    assert {r.name for r in good.collect()} == {f"r{i}" for i in range(10)}


def test_generator_callback_streams_chunks(spark, tmp_path):
    paths = _write_csvs(tmp_path)

    def chunked(unit):
        import pandas as pd

        yield from pd.read_csv(unit["path"], chunksize=1)

    df = scan_units_vectorized(spark, paths, SCHEMA, chunked)
    good, _ = split_scan_errors(df)
    assert good.count() == 3


def _write_workbooks(tmp_path) -> list[str]:
    import pandas as pd

    from mex_extractors_spark.sources.xlsx import write_xlsx

    w1 = str(tmp_path / "w1.xlsx")
    write_xlsx(
        w1,
        {
            "projects": pd.DataFrame({"name": ["alpha", "beta"], "amount": [1, 2]}),
            "archive": pd.DataFrame({"name": ["old"], "amount": [9]}),
        },
    )
    w2 = str(tmp_path / "w2.xlsx")
    write_xlsx(
        w2,
        {
            # extra column pruned by schema alignment, blank amount -> null
            "projects": pd.DataFrame(
                {"name": ["gamma"], "amount": [3], "extra": ["x"]}
            ),
            "archive": pd.DataFrame({"name": ["older"], "amount": [None]}),
        },
    )
    return [w1, w2]


def test_excel_scan_reads_real_workbooks(spark, tmp_path):
    paths = _write_workbooks(tmp_path)
    df = read_excel_files(spark, paths, SCHEMA, sheet_names=["projects"])
    good, bad = split_scan_errors(df)
    rows = {(r.name, r.amount) for r in good.collect()}
    assert rows == {("alpha", 1), ("beta", 2), ("gamma", 3)}
    assert bad.count() == 0


def test_excel_scan_multi_sheet_fanout_and_default_sheet(spark, tmp_path):
    paths = _write_workbooks(tmp_path)
    df = read_excel_files(spark, paths, SCHEMA, sheet_names=["projects", "archive"])
    good, _ = split_scan_errors(df)
    rows = {(r.name, r.amount) for r in good.collect()}
    assert rows == {
        ("alpha", 1),
        ("beta", 2),
        ("gamma", 3),
        ("old", 9),
        ("older", None),
    }
    # sheet_names=None -> first sheet of each workbook only
    first = read_excel_files(spark, paths, SCHEMA)
    good_first, _ = split_scan_errors(first)
    assert {r.name for r in good_first.collect()} == {"alpha", "beta", "gamma"}


def test_excel_scan_quarantines_bad_workbook(spark, tmp_path):
    paths = _write_workbooks(tmp_path)
    corrupt = tmp_path / "corrupt.xlsx"
    corrupt.write_bytes(b"this is not a zip archive")
    df = read_excel_files(spark, [*paths, str(corrupt)], SCHEMA)
    good, bad = split_scan_errors(df)
    assert good.count() == 3
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert "corrupt.xlsx" in quarantined[0][0]


def test_excel_blank_string_cells_read_as_empty_string(spark, tmp_path):
    # pd.read_excel(keep_default_na=False) gives '' for blank string
    # cells; the stdlib fallback must match (the reference's
    # ff_projects extract depends on blanks == '' not null)
    import pandas as pd

    from mex_extractors_spark.sources.xlsx import write_xlsx

    p = str(tmp_path / "blanks.xlsx")
    write_xlsx(
        p, {"projects": pd.DataFrame({"name": [None, "x"], "amount": [1, None]})}
    )
    good, _ = split_scan_errors(read_excel_files(spark, [p], SCHEMA))
    rows = {(r.name, r.amount) for r in good.collect()}
    # blank STRING cell -> ''; blank INT cell stays null (typed schema)
    assert rows == {("", 1), ("x", None)}


def test_excel_scan_fallback_rejects_unsupported_kwargs(spark, tmp_path):
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; fallback kwarg guard not applicable")
    except ImportError:
        pass
    with pytest.raises(ValueError, match="skiprows"):
        read_excel_files(spark, ["x.xlsx"], SCHEMA, skiprows=2)
    # keep_default_na is the semantic our parser already provides
    paths = _write_workbooks(tmp_path)
    df = read_excel_files(spark, paths, SCHEMA, keep_default_na=False)
    good, _ = split_scan_errors(df)
    assert good.count() == 3
