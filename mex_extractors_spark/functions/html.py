"""HTML scrape as pure expressions (SURVEY.md §2.1 S11).

The reference logs into the datscha web registry, scrapes item URLs
from the index page, then parses each item page's field table
(datscha_web/connector.py:18-50, datscha_web/extract.py:18-31). The
FETCH side of that is S9-shaped (``sources/paginated.py`` — a page
fan-out through mapInPandas); what matters at 100 TB is the PARSE
side, which here is codegen'd regexp expressions over an html string
column — no Python parser in the loop, so scraping N pages costs one
scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_item_urls(html: str | Column, pattern: str = r'href="([^"]+)"') -> Column:
    """All link targets in the page (array<string>) — the
    ``get_item_urls`` index-page scrape re-expressed as one
    ``regexp_extract_all``."""
    return F.regexp_extract_all(_c(html), F.lit(pattern), 1)


def extract_field(html: str | Column, field: str) -> Column:
    """One field from an item page's ``<td id="...">value</td>`` table
    (the ``parse_single_item_html`` analog, one expression per field).
    The field name is regex-escaped: an id containing ``(``/``.``/``+``
    would otherwise shift capture-group numbering or match wrong ids."""
    return F.regexp_extract(
        _c(html), f'<td id="{re.escape(field)}">([^<]*)</td>', 1
    )


def url_item_id(url: str | Column) -> Column:
    """Numeric item id from an item URL (``item_show.php?id=N``)."""
    return F.regexp_extract(_c(url), r"id=(\d+)", 1).cast("long")
