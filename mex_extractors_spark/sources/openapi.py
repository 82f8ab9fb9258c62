"""S13 — OpenAPI schema scan (igs/extract.py:31-46).

The reference fetches an OpenAPI document and classifies
``components.schemas`` entries into enum schemas vs properties schemas
(IGSEnumSchema / IGSPropertiesSchema). Schema-as-data re-expression:
the document becomes a DataFrame of (schema_name, kind, fields,
required, enum_values) — joinable against mapping rules and model
expectations like any other dimension.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

SCHEMA = (
    "schema_name string, kind string, fields array<string>, "
    "required array<string>, enum_values array<string>"
)


def openapi_schemas_df(spark: SparkSession, raw_json: dict[str, Any]) -> DataFrame:
    """Classify components.schemas into one row per schema.

    kind: 'enum' for enum schemas, 'properties' for object schemas
    (same precedence as igs/extract.py:40-45 — a schema carrying both
    lands as 'properties', matching the reference's dict overwrite).
    Unclassifiable schemas are skipped, as in the reference.
    """
    schemas = raw_json.get("components", {}).get("schemas", {})
    rows = []
    for name, spec in sorted(schemas.items()):
        row = None
        if "enum" in spec:
            row = (name, "enum", [], [], [str(v) for v in spec["enum"]])
        if "properties" in spec:
            row = (
                name,
                "properties",
                sorted(spec["properties"]),
                sorted(spec.get("required", [])),
                [],
            )
        if row is not None:
            rows.append(row)
    return spark.createDataFrame(rows, SCHEMA)
