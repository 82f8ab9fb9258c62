"""Per-group report export — the S3 XLSX sink shape (SURVEY.md §2.2 K3).

The reference collects all items of one entity/unit into pandas and
uploads one XLSX per group to S3 (sinks/s3.py:136-193, file name
``{Entity}_{primary_source}_{unit}.xlsx``). Cluster shape: the group
is the unit of work, so ``groupBy(group).applyInPandas`` renders and
writes each group's file ON THE EXECUTOR (to shared storage — a local
directory stands in for the S3 bucket here) and only a one-row
manifest (file name, row count, content sha256) returns to the plan.
Nothing is collected to the driver; a skewed group costs one task,
not the job.

The file format is an explicit ``file_format='csv'|'xlsx'`` parameter:
``csv`` renders canonical RFC-4180 bytes, ``xlsx`` renders a real
workbook through the dependency-free SpreadsheetML writer
(sources/xlsx.py, deterministic bytes — no openpyxl needed). Both
branches share the naming and sha256-manifest contract.
"""

from __future__ import annotations

import hashlib
import os
import re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame

MANIFEST_SCHEMA = "file_name string, n_rows long, content_sha256 string"


def _safe(name: object) -> str:
    """Group value → filename fragment: path separators and every other
    non-filename character become '_' (a group like 'a/b' or '..' must
    not escape the output directory or poison the writing task).
    Sanitization is lossy, so whenever it ALTERS the name an 8-hex
    sha256 suffix of the raw value disambiguates it — otherwise
    distinct groups 'a/b' and 'a_b' would collide on one file and one
    group's report would silently overwrite the other's."""
    raw = str(name)
    safe = re.sub(r"[^A-Za-z0-9._-]", "_", raw).strip(".") or "group"
    if safe != raw:
        safe = f"{safe}-{hashlib.sha256(raw.encode('utf-8')).hexdigest()[:8]}"
    return safe


def _csv_field(v: object) -> str:
    """RFC-4180 field escaping: values containing the delimiter, a
    quote, or a line break are quoted with doubled inner quotes; clean
    values pass through byte-identical (keeps the SQL-expressible
    sha256 oracle valid for clean data)."""
    # pandas represents nullable numeric/timestamp nulls as NaN/NaT,
    # not None — both must render as the empty field, never 'nan'
    s = "" if v is None or (v != v) or v is pd.NaT else str(v)
    if any(ch in s for ch in (",", '"', "\n", "\r")):
        s = '"' + s.replace('"', '""') + '"'
    return s


def _sort_cols(order_col: str, row_cols: Sequence[str]) -> list[str]:
    return [order_col, *[c for c in row_cols if c != order_col]]


def render_csv_bytes(pdf: pd.DataFrame, row_cols: Sequence[str], order_col: str) -> bytes:
    """Canonical CSV rendering: fixed column order, rows sorted by
    ``order_col`` with the remaining row columns as tiebreak — rows
    tied on order_col alone would otherwise keep the shuffle's
    nondeterministic arrival order, and the manifest sha256 would not
    be byte-stable across re-runs as documented."""
    body = pdf.sort_values(_sort_cols(order_col, row_cols), kind="mergesort")[
        list(row_cols)
    ]
    lines = [",".join(_csv_field(c) for c in row_cols)]
    lines += [
        ",".join(_csv_field(v) for v in row) for row in body.itertuples(index=False)
    ]
    return "\n".join(lines).encode("utf-8")


def write_group_reports(
    df: DataFrame,
    out_dir: str,
    group_col: str,
    entity_name: str,
    row_cols: Sequence[str],
    order_col: str,
    file_format: str = "csv",
) -> DataFrame:
    """One report file per ``group_col`` value; returns the manifest
    DataFrame (file_name, n_rows, content_sha256).

    ``file_format="xlsx"`` writes real workbooks through the
    dependency-free SpreadsheetML writer (sources/xlsx.py) — the
    reference's primary report format (sinks/s3.py:136-193), with
    byte-deterministic output so the manifest sha256 is reproducible.
    The default stays ``"csv"`` because its canonical bytes are also
    expressible as a SQL oracle (k3_group_reports)."""
    if file_format not in ("csv", "xlsx"):
        raise ValueError(f"file_format must be 'csv' or 'xlsx', got {file_format!r}")
    os.makedirs(out_dir, exist_ok=True)
    row_cols = list(row_cols)

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        group = pdf[group_col].iloc[0]
        if file_format == "xlsx":
            from mex_extractors_spark.sources.xlsx import xlsx_bytes

            file_name = f"{entity_name}_{_safe(group)}.xlsx"
            body = pdf.sort_values(
                _sort_cols(order_col, row_cols), kind="mergesort"
            )[row_cols].reset_index(drop=True)
            payload = xlsx_bytes({entity_name: body})
        else:
            file_name = f"{entity_name}_{_safe(group)}.csv"
            payload = render_csv_bytes(pdf, row_cols, order_col)
        with open(os.path.join(out_dir, file_name), "wb") as fh:
            fh.write(payload)
        return pd.DataFrame(
            {
                "file_name": [file_name],
                "n_rows": [len(pdf)],
                "content_sha256": [hashlib.sha256(payload).hexdigest()],
            }
        )

    # the sort column must ride along even when it is not reported
    cols = list(dict.fromkeys([group_col, *row_cols, order_col]))
    return (
        df.select(*cols)
        .groupBy(group_col)
        .applyInPandas(render, MANIFEST_SCHEMA)
    )
