"""Declarative mapping-rule engine: YAML rules → column expressions.

The reference drives per-field normalization from YAML mapping files:
``mappingRules[*].setValues`` are defaults, ``forValues → setValues``
are conditional value maps (seq_repo/transform.py:49,93-118,
ifsg/transform.py:97-122, loaded via utils.py:12-15 load_yaml).

Spark re-expression: each field's rules compile to ONE column
expression — a broadcast literal map lookup (``element_at``) with a
``coalesce`` default — so the whole rule engine runs inside codegen.

Rule document shape (same semantics as the reference's):

    fields:
      <out_col>:
        - forValues: ["a", "b"]     # optional condition on source col
          setValues: "X"
        - setValues: "DEFAULT"      # no forValues => default
        fieldInPrimarySource: <src_col>   # optional, per-field
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # PyYAML is commonly available; gate per environment rules
    import yaml  # type: ignore
except ImportError:  # pragma: no cover
    yaml = None


def load_rules(path: str) -> dict:
    if yaml is None:
        raise ImportError("PyYAML not available; pass rules as a dict instead")
    with open(path) as fh:
        return yaml.safe_load(fh)


def _lit_value(v) -> Column:
    """setValues literal → Column: scalars, Text-shaped dicts
    ({value, language} — seq_repo mapping defaults consumed at
    seq_repo/transform.py:93-118), and lists of either (theme/keyword
    vocab lists, transform.py:49 ``setValues`` list indexing)."""
    if isinstance(v, dict):
        keys = ("value", "language") if set(v) <= {"value", "language"} else sorted(v)
        return F.struct(
            *[F.lit(v.get(k)).cast("string").alias(k) for k in keys]
        )
    if isinstance(v, list):
        return F.array(*[_lit_value(x) for x in v])
    return F.lit(v)


def compile_field(rules: list[dict], source_col: str | None) -> Column:
    """Compile one field's rule list into a single expression.

    ``setValues`` may be a scalar, a Text object ({value, language}),
    or a list of either — matching the reference's mapping models. All
    rules of one field must use one consistent shape (the reference's
    Pydantic mapping models enforce the same)."""
    mapping: dict[str, object] = {}
    default = None
    for rule in rules:
        set_values = rule.get("setValues")
        for_values = rule.get("forValues")
        if for_values:
            for v in for_values:
                mapping[str(v)] = set_values
        else:
            default = set_values
    if mapping and source_col is None:
        # conditional (forValues) rules are keyed on the source column —
        # a missing/typo'd fieldInPrimarySource would silently drop them
        # all and hand every row the default (the reference's Pydantic
        # models fail loudly on the same misconfiguration)
        raise ValueError(
            "mapping rules use forValues but the field declares no "
            "fieldInPrimarySource to match against"
        )
    expr = None
    if mapping and source_col is not None:
        lookup = F.create_map(
            *[x for k, sv in mapping.items() for x in (F.lit(k), _lit_value(sv))]
        )
        expr = lookup[F.col(source_col)]
    if default is not None:
        d = _lit_value(default)
        expr = F.coalesce(expr, d) if expr is not None else d
    return expr if expr is not None else F.lit(None).cast("string")


def apply_mapping(df: DataFrame, doc: dict) -> DataFrame:
    """Apply a whole rule document: one withColumns pass."""
    new_cols: dict[str, Column] = {}
    for out_col, spec in doc.get("fields", {}).items():
        if isinstance(spec, dict):
            rules = spec.get("mappingRules", [])
            src = spec.get("fieldInPrimarySource")
        else:
            rules, src = spec, None
        new_cols[out_col] = compile_field(rules, src)
    return df.withColumns(new_cols)
