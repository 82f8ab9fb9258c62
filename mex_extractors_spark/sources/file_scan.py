"""Generic vectorized scan adapter (SURVEY.md §2.1 S4/S5/S9/S10/S12).

The reference ingests several sources through driver-side pandas loops:
Excel workbooks (ff_projects/extract.py:28-49, biospecimen/extract.py:
66-91, odk/extract.py:18-56, sumo/extract.py:97-125) and paginated REST
endpoints (voxco, grippeweb, igs). The cluster-shaped re-expression is
ONE adapter: a DataFrame of *work units* (file path / sheet name / page
range), spread across executors, each unit read by a pandas callback
inside ``mapInPandas`` (Arrow-batched — never row-at-a-time), with a
declared output StructType and per-unit error quarantine instead of
fail-on-first-file.

At 100 TB the work-unit list is itself a DataFrame (millions of files/
pages); partitioning the unit list IS the parallelism — each task owns
a few units, the heavy byte-reading happens executor-side, and a bad
unit poisons only its own quarantine row, not the job.

Excel reads prefer ``pd.read_excel`` when openpyxl is installed and
fall back to the dependency-free SpreadsheetML parser in
``sources/xlsx.py`` otherwise — the Spark-side plumbing (unit list,
partitioning, mapInPandas signature, schema alignment, quarantine) is
identical either way and shared with the CSV and paged scans.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

SOURCE_COL = "_source_unit"
ERROR_COL = "_scan_error"


def _units_df(spark: SparkSession, units) -> DataFrame:
    if isinstance(units, DataFrame):
        return units
    rows = [{"path": u} if isinstance(u, str) else dict(u) for u in units]
    return spark.createDataFrame(rows)


def scan_units_vectorized(
    spark: SparkSession,
    units: DataFrame | list,
    schema: StructType,
    read_unit: Callable[[dict[str, Any]], Any],
    num_partitions: int | None = None,
) -> DataFrame:
    """Scan a collection of work units with a pandas callback.

    - ``units``: DataFrame or list of paths/dicts; each row is one unit
      (file, sheet, page …) and is passed to ``read_unit`` as a dict.
    - ``schema``: declared output columns (the data contract). The
      result additionally carries ``_source_unit`` (the unit's ``path``
      or its dict repr) and ``_scan_error`` (null for good rows; a
      failed unit yields exactly one all-null row with the error).
    - ``read_unit``: returns a ``pandas.DataFrame`` or an iterator of
      them. Runs executor-side inside ``mapInPandas`` — vectorized,
      Arrow-batched; missing columns become null, extra columns are
      dropped (scan-time column pruning).
    """
    import pandas as pd  # executor-side import kept local

    units_df = _units_df(spark, units)
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # spread units across tasks — unit lists arrive in few partitions
    # (a driver list is ONE), and each unit may expand to many rows
    units_df = units_df.repartition(num_partitions)

    data_cols = [f.name for f in schema.fields]
    out_schema = StructType(
        [*schema.fields, StructField(SOURCE_COL, StringType()), StructField(ERROR_COL, StringType())]
    )

    def _scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for unit in pdf.to_dict("records"):
                if "path" in unit and len(unit) > 1:
                    # attribute errors to the whole unit, not just the
                    # file — a bad sheet must not implicate its siblings
                    extras = ",".join(
                        f"{k}={unit[k]}" for k in sorted(unit) if k != "path"
                    )
                    tag = f"{unit['path']}#{extras}"
                else:
                    tag = str(unit.get("path", unit))
                try:
                    out = read_unit(unit)
                    if isinstance(out, pd.DataFrame):
                        chunks = [out]
                    elif isinstance(out, dict):  # pd.read_excel(sheet_name=None)
                        chunks = list(out.values())
                    else:
                        chunks = out
                    for chunk in chunks:
                        aligned = chunk.reindex(columns=data_cols)
                        aligned[SOURCE_COL] = tag
                        aligned[ERROR_COL] = None
                        yield aligned
                except Exception as exc:  # noqa: BLE001 — quarantine, don't poison the job
                    bad = pd.DataFrame([dict.fromkeys(data_cols)])
                    bad[SOURCE_COL] = tag
                    bad[ERROR_COL] = f"{type(exc).__name__}: {exc}"
                    yield bad

    return units_df.mapInPandas(_scan, schema=out_schema)


def split_scan_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without bookkeeping columns intact, quarantine)."""
    good = df.where(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
    bad = df.where(F.col(ERROR_COL).isNotNull()).select(SOURCE_COL, ERROR_COL)
    return good, bad


def read_csv_files_pandas(
    spark: SparkSession,
    paths: list[str],
    schema: StructType,
    num_partitions: int | None = None,
    **read_csv_kwargs: Any,
) -> DataFrame:
    """S3-via-adapter demo: per-file pandas.read_csv through the
    vectorized scan (the exact plumbing Excel uses — openpyxl is the
    only missing piece there)."""

    def _read(unit: dict[str, Any]):
        import pandas as pd

        return pd.read_csv(unit["path"], **read_csv_kwargs)

    return scan_units_vectorized(spark, paths, schema, _read, num_partitions)


def read_excel_files(
    spark: SparkSession,
    paths: list[str],
    schema: StructType,
    sheet_names: list[str] | None = None,
    num_partitions: int | None = None,
    **read_excel_kwargs: Any,
) -> DataFrame:
    """S4/S5: Excel workbook scan — one unit per (file, sheet).

    Mirrors ff_projects/extract.py:38-42 (``keep_default_na=False``)
    and odk/extract.py:29-41 (multi-sheet parse). When openpyxl is
    installed the read goes through ``pd.read_excel``; otherwise the
    dependency-free SpreadsheetML parser (sources/xlsx.py) reads the
    workbook directly — either way the unit expansion, mapInPandas,
    schema alignment and quarantine are the same code path the CSV and
    paged scans exercise. ``read_excel_kwargs`` are forwarded to
    ``pd.read_excel`` only; the stdlib parser rejects kwargs it cannot
    honor instead of silently changing semantics. Both branches agree
    on blank string cells: ``pd.read_excel(keep_default_na=False)``
    yields ``''`` there, so the stdlib fallback (whose parser reports
    blanks as None/NaN) post-fills ``''`` into every column the caller
    declared as a string in ``schema``.
    """
    try:
        import openpyxl  # noqa: F401

        use_pandas = True
    except ImportError:
        use_pandas = False
        unsupported = set(read_excel_kwargs) - {"keep_default_na"}
        if unsupported:
            raise ValueError(
                "stdlib xlsx fallback (openpyxl absent) does not support "
                f"read_excel kwargs: {sorted(unsupported)}"
            )

    # all-null columns defeat createDataFrame type inference — a unit
    # with no sheet request simply has no "sheet" key
    units = [
        ({"path": p, "sheet": s} if s is not None else {"path": p})
        for p in paths
        for s in (sheet_names if sheet_names is not None else [None])
    ]

    def _read(unit: dict[str, Any]):
        sheet = unit.get("sheet")
        if use_pandas:  # pragma: no cover - openpyxl absent in container
            import pandas as pd

            kwargs = dict(read_excel_kwargs)
            if sheet is not None:
                kwargs["sheet_name"] = sheet
            return pd.read_excel(unit["path"], keep_default_na=False, **kwargs)
        from mex_extractors_spark.sources.xlsx import read_xlsx

        pdf = read_xlsx(unit["path"], sheet_name=sheet if sheet is not None else 0)
        # match pd.read_excel(keep_default_na=False): blank cells in
        # string-typed columns are '' there, None/NaN from the stdlib
        # parser — fill via the declared schema so the two branches
        # return identical data for the same workbook
        string_cols = {
            f.name for f in schema.fields if isinstance(f.dataType, StringType)
        }
        for col in pdf.columns:
            if col in string_cols:
                pdf[col] = pdf[col].where(pdf[col].notna(), "")
        return pdf

    return scan_units_vectorized(spark, units, schema, _read, num_partitions)


def read_paged_source(
    spark: SparkSession,
    fetch_page: Callable[[dict[str, Any]], Any],
    schema: StructType,
    num_pages: int,
    page_size: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """S9/S10/S12 shape: paginated scan — one unit per page window.

    The reference pages REST endpoints with (offset, limit) loops
    (voxco/extract.py, grippeweb/connector.py fetch loops); here the
    page windows ARE the unit list, so pages fetch concurrently across
    executors instead of serially on the driver. ``fetch_page`` gets
    {"page": i, "offset": o, "limit": n} (network-free substitutes in
    this sandbox: slice a local file)."""
    units = [
        {"page": i, "offset": i * page_size, "limit": page_size}
        for i in range(num_pages)
    ]
    return scan_units_vectorized(spark, units, schema, fetch_page, num_partitions)
