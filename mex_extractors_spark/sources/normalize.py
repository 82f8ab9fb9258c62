"""Normalization layer: heterogeneous raw records → common schema.

The reference's transform contract: every source's raw shape becomes a
common MEx model (seq_repo/transform.py, synopse/transform.py, …) —
row-at-a-time Python over Pydantic. Here each source gets a declarative
adapter (rename + cast + expression columns), and the few genuinely
irregular string transforms are VECTORIZED pandas UDFs (Arrow batches,
no per-row Python — BASELINE input_hint).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from mex_extractors_spark.functions.ids import stable_id

# Text {value, language} / Link {url, title} — SURVEY.md §1.2 types
TEXT_TYPE = ArrayType(
    StructType([StructField("value", StringType()), StructField("language", StringType())])
)
LINK_TYPE = StructType([StructField("url", StringType()), StructField("title", StringType())])


def text_value(value: Column | str, language: str | None = "de") -> Column:
    """Build a single-element Text[] (seq_repo/transform.py:154-166)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.when(
        v.isNotNull(),
        F.array(F.struct(v.alias("value"), F.lit(language).cast("string").alias("language"))),
    ).otherwise(F.array().cast(TEXT_TYPE))


def link_value(url: Column | str, title: Column | str | None = None) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    t = (F.col(title) if isinstance(title, str) else title) if title is not None else F.lit(None)
    return F.struct(u.alias("url"), t.cast("string").alias("title"))


def windows_path_to_uri(col: Column | str) -> Column:
    """PureWindowsPath(...).as_uri() (synopse/transform.py:617-625) as an
    expression: backslashes → slashes, drive letter → file:/// prefix."""
    c = F.col(col) if isinstance(col, str) else col
    fwd = F.regexp_replace(c, "\\\\", "/")
    return (
        F.when(fwd.rlike("^[A-Za-z]:"), F.concat(F.lit("file:///"), fwd))
        # UNC \\\\server\\share -> //server/share: as_uri() renders it
        # file://server/share (the authority IS the server) — a blanket
        # file:// prefix would double the slashes into file:////server
        .when(fwd.rlike("^//"), F.concat(F.lit("file:"), fwd))
        .otherwise(F.concat(F.lit("file://"), fwd))
    )


_PERSON_TYPE = ArrayType(
    StructType(
        [StructField("surname", StringType()), StructField("givenname", StringType())]
    )
)

# the lookahead is load-bearing: without a boundary AFTER the token,
# 'Ing' would strip the front of 'Ingrid', 'Med' of 'Medina', 'Dr' of
# 'Drew' — a title counts only as a whole token ending in '.', space,
# or end-of-part
_TITLE_RE = re.compile(
    r"\b(?:Dr|Prof|Med|Dipl|Ing|MSc|BSc|PhD|MD)(?:\.|(?=\s|$))\s*",
    re.IGNORECASE,
)


@pandas_udf(_PERSON_TYPE)
def analyse_person_string(names: pd.Series) -> pd.Series:
    """Vectorized person-string analysis (SURVEY.md §2.8 C17): split
    "Dr. Ada Lovelace, Charles Babbage" into (surname, givenname) pairs.
    Genuinely irregular string logic → the sanctioned pandas-UDF path
    (Arrow batch transfer), mirroring mex.common's analyse_person_string
    consumed at synopse/extract.py:118-124."""

    def one(s: str | None) -> list[dict] | None:
        if s is None or not s.strip():
            return []
        out = []
        for part in re.split(r"[,;]", s):
            part = _TITLE_RE.sub("", part).strip()
            if not part:
                continue
            tokens = part.split()
            if len(tokens) == 1:
                out.append({"surname": tokens[0], "givenname": None})
            else:
                out.append({"surname": tokens[-1], "givenname": " ".join(tokens[:-1])})
        return out

    return names.map(one)


def normalize_raw_events(raw: DataFrame, alias_map: dict[str, str] | None = None) -> DataFrame:
    """Adapter for kebab-aliased raw change events → canonical CDC schema
    (repo, path, commit, lang, content, seq:long, op). Mirrors the
    reference's alias-based scan mapping (seq_repo/model.py:16-29)."""
    aliases = alias_map or {
        "repo-name": "repo",
        "file-path": "path",
        "commit-sha": "commit",
        "language": "lang",
        "file-content": "content",
        "sequence": "seq",
        "operation": "op",
    }
    df = raw.withColumnsRenamed({k: v for k, v in aliases.items() if k in raw.columns})
    return df.withColumns(
        {
            "seq": F.col("seq").cast("long"),
            "op": F.upper(F.col("op").cast("string")),
        }
    )


#: canonical lang vocabulary (mapping-rule style: raw extension → label),
#: applied as a broadcast-map lookup with passthrough fallback (C12/C16)
LANG_VOCAB = {
    "py": "python",
    "rs": "rust",
    "go": "go",
    "ts": "typescript",
    "java": "java",
    "md": "markdown",
    "yaml": "yaml",
}


def normalize_change_events(df: DataFrame) -> DataFrame:
    """The transform stage of the replayed extract→transform→load
    contract, run on EVERY event before the merge (expression-only —
    whole-stage codegen, no Python in the hot path):

    - ``content_sha``: per-row sha256 of content, the verification
      substrate of the commit manifest (sinks/s3.py:106-109 / C13-C14);
    - ``size_bytes``: content length (derived metric column);
    - ``lang`` normalized through the vocabulary map with passthrough
      for unknown values (mapping-rule setValues/forValues, C16).
    """
    lang_map = F.create_map(
        *[F.lit(x) for kv in LANG_VOCAB.items() for x in kv]
    )
    return df.withColumns(
        {
            "lang": F.coalesce(
                F.element_at(lang_map, F.col("lang")), F.col("lang")
            ),
            "content_sha": F.when(
                F.col("content").isNotNull(), F.sha2(F.col("content"), 256)
            ),
            # octet_length, NOT length: char count undercounts any
            # multi-byte UTF-8 content vs the bytes actually stored
            "size_bytes": F.octet_length(F.col("content")).cast("long"),
        }
    )


def to_common_model(
    df: DataFrame,
    primary_source: str,
    natural_key_col: str,
    title_col: str | None = None,
    language: str = "de",
) -> DataFrame:
    """Attach the common-model identity + Text columns: deterministic
    identifier/stableTargetId from (hadPrimarySource,
    identifierInPrimarySource) — SURVEY.md §1.1."""
    # common-model identity requires a TOTAL natural key: stable_id
    # null-propagates (functions/ids.py), so a NULL key would yield a
    # NULL identifier that silently drops out of downstream equi-joins.
    # Fail loudly at execution instead — the reference's pydantic
    # validation rejects a missing identifierInPrimarySource the same
    # way (models via mex.common, SURVEY.md §1.1).
    key = F.col(natural_key_col).cast("string")
    key = F.when(
        key.isNull(),
        F.raise_error(
            F.lit(
                f"to_common_model: NULL {natural_key_col} — the common-model "
                "identity needs a total natural key; filter or quarantine "
                "null-keyed rows first"
            )
        ),
    ).otherwise(key)
    out = df.withColumns(
        {
            "hadPrimarySource": F.lit(primary_source),
            "identifierInPrimarySource": key,
        }
    )
    out = out.withColumns(
        {
            "identifier": stable_id(
                F.lit("identifier"), "hadPrimarySource", "identifierInPrimarySource"
            ),
            "stableTargetId": stable_id(
                F.lit("stableTargetId"), "hadPrimarySource", "identifierInPrimarySource"
            ),
        }
    )
    if title_col is not None:
        out = out.withColumn("title", text_value(title_col, language))
    return out
