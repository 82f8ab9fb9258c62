"""J7 — the publisher's correlated actor-reference rewrite.

Re-expresses mex-extractors' publisher transform
(``mex/extractors/publisher/transform.py:54-111`` +
``publisher/fields.py`` REFERENCED_ENTITY_TYPES_BY_FIELD_BY_CLASS_NAME;
tests mirrored from ``tests/publisher/test_transform.py``) as one
distributed plan instead of a per-item Python loop:

for every reference field of every item that may hold Person ids
  1. keep refs that are in the allowed-actor set (order preserved);
  2. if the field may hold OrganizationalUnit ids, non-allowed person
     refs are substituted by that person's unit ids (units with an
     email address, themselves allowed) — the substitution set is
     SORTED and appended after the kept refs;
  3. a field left empty that may hold ContactPoint ids gets the
     fallback contact list;
  4. a REQUIRED field still empty keeps its original (broken) refs —
     the item is not dropped (that would cascade de-publication) — and
     the (item, field) lands in a broken-refs side output (the
     reference logs an error; lineage-as-data here).

Spark shape: all person-bearing fields are melted in ONE pass via
``inline`` (no per-field scan), refs check membership through a
broadcast join against the allowed-actor dimension, person→unit
substitutions come from a second broadcast join, and the per-(item,
field) re-aggregation shuffles only the exploded (item, field, ref)
rows. The FOLD-BACK is the honest extra cost: rewritten field maps are
re-attached with an id-keyed join against the items, so the fact is
scanned twice and its payload columns shuffle once on id (per_item is
fact-row-sized, not broadcastable). At lake scale the mitigation is
layout, not plan surgery — store items bucketed by id (LakeTable's
native layout) and the fold-back join becomes storage-partitioned,
moving only the rewrite map.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RefFieldSpec:
    """Which merged-identifier types a reference field admits, per the
    reference's REFERENCED_ENTITY_TYPES_BY_FIELD_BY_CLASS_NAME."""

    entity_type: str
    field: str
    allows_person: bool = True
    allows_unit: bool = False
    allows_contact_point: bool = False
    required: bool = False


# Full reference-field registry — the Spark-side encoding of
# publisher/fields.py REFERENCED_ENTITY_TYPES_BY_FIELD_BY_CLASS_NAME,
# which the reference computes from the public mex-model schema
# (mex.common REFERENCE_FIELDS_BY_CLASS_NAME × MERGED_IDENTIFIER_CLASSES).
# One row per reference field of every merged class; flags mark which
# merged-identifier families the field admits. The rewrite only acts on
# Person-admitting fields (transform.py:78-80 ``continue``) — the
# non-person rows are still listed so the registry is the single source
# of truth for "is this column a reference field at all".
REF_FIELD_SPECS_BY_CLASS: dict[str, list[RefFieldSpec]] = {
    "MergedAccessPlatform": [
        RefFieldSpec("MergedAccessPlatform", "contact", True, True, True),
        RefFieldSpec("MergedAccessPlatform", "unitInCharge", False, True, False),
    ],
    "MergedActivity": [
        RefFieldSpec("MergedActivity", "contact", True, True, True, required=True),
        RefFieldSpec("MergedActivity", "involvedPerson", True, False, False),
        RefFieldSpec("MergedActivity", "externalAssociate", True, False, False),
        RefFieldSpec("MergedActivity", "responsibleUnit", False, True, False, required=True),
        RefFieldSpec("MergedActivity", "involvedUnit", False, True, False),
        RefFieldSpec("MergedActivity", "funderOrCommissioner", False, False, False),
        RefFieldSpec("MergedActivity", "succeeds", False, False, False),
    ],
    "MergedBibliographicResource": [
        RefFieldSpec("MergedBibliographicResource", "creator", True, False, False, required=True),
        RefFieldSpec("MergedBibliographicResource", "editor", True, False, False),
        RefFieldSpec("MergedBibliographicResource", "editorOfSeries", True, False, False),
        RefFieldSpec("MergedBibliographicResource", "contributingUnit", False, True, False),
        RefFieldSpec("MergedBibliographicResource", "publisher", False, False, False),
    ],
    "MergedConsent": [
        RefFieldSpec("MergedConsent", "hasDataSubject", True, False, False, required=True),
    ],
    "MergedContactPoint": [],
    "MergedDistribution": [
        RefFieldSpec("MergedDistribution", "accessService", False, False, False),
    ],
    "MergedOrganization": [],
    "MergedOrganizationalUnit": [
        RefFieldSpec("MergedOrganizationalUnit", "parentUnit", False, True, False),
        RefFieldSpec("MergedOrganizationalUnit", "unitOf", False, False, False),
    ],
    "MergedPerson": [
        RefFieldSpec("MergedPerson", "memberOf", False, True, False),
        RefFieldSpec("MergedPerson", "affiliation", False, False, False),
    ],
    "MergedPrimarySource": [
        RefFieldSpec("MergedPrimarySource", "contact", True, True, True),
        RefFieldSpec("MergedPrimarySource", "unitInCharge", False, True, False),
    ],
    "MergedResource": [
        RefFieldSpec("MergedResource", "contact", True, True, True, required=True),
        RefFieldSpec("MergedResource", "contributor", True, False, False),
        RefFieldSpec("MergedResource", "creator", True, False, False),
        RefFieldSpec("MergedResource", "contributingUnit", False, True, False),
        RefFieldSpec("MergedResource", "unitInCharge", False, True, False, required=True),
        RefFieldSpec("MergedResource", "externalPartner", False, False, False),
        RefFieldSpec("MergedResource", "publisher", False, False, False),
        RefFieldSpec("MergedResource", "wasGeneratedBy", False, False, False),
        RefFieldSpec("MergedResource", "accessPlatform", False, False, False),
        RefFieldSpec("MergedResource", "distribution", False, False, False),
    ],
    "MergedVariable": [
        RefFieldSpec("MergedVariable", "belongsTo", False, False, False),
        RefFieldSpec("MergedVariable", "usedIn", False, False, False, required=True),
    ],
    "MergedVariableGroup": [
        RefFieldSpec("MergedVariableGroup", "containedBy", False, False, False, required=True),
    ],
}

ALL_SPECS: list[RefFieldSpec] = [
    s for specs in REF_FIELD_SPECS_BY_CLASS.values() for s in specs
]


def person_bearing_specs(*classes: str) -> list[RefFieldSpec]:
    """The specs the rewrite acts on — Person-admitting reference
    fields, optionally restricted to the given merged classes."""
    wanted = set(classes) or set(REF_FIELD_SPECS_BY_CLASS)
    return [
        s
        for cls in sorted(wanted)
        for s in REF_FIELD_SPECS_BY_CLASS.get(cls, [])
        if s.allows_person
    ]


# the MergedActivity slice of publisher/fields.py that the reference's
# own tests exercise (contact: Person|Unit|ContactPoint required;
# involvedPerson / externalAssociate: Person-bearing; responsibleUnit
# has no Person type so the rewrite must leave it untouched)
ACTIVITY_SPECS: list[RefFieldSpec] = person_bearing_specs("MergedActivity")


def unit_ids_per_person(
    persons: DataFrame,
    units: DataFrame,
    person_id: str = "identifier",
    member_of: str = "memberOf",
    unit_id: str = "identifier",
    unit_email: str = "email",
) -> DataFrame:
    """(person_id, unit_id) pairs for units that have an email address
    — transform.py:25-50 ``get_unit_id_per_person``. Both inputs are
    dimensions; the explode+join stays broadcast-sized."""
    units_with_email = units.where(
        F.col(unit_email).isNotNull() & (F.length(unit_email) > 0)
    ).select(F.col(unit_id).alias("_unit_id"))
    return (
        persons.select(
            F.col(person_id).alias("_person_id"),
            # plain explode: the inner join below drops null-unit rows,
            # so explode_outer's preserved nulls would be wasted work
            F.explode(member_of).alias("_unit_id"),
        )
        .join(F.broadcast(units_with_email), "_unit_id")
        .select("_person_id", "_unit_id")
    )


def rewrite_actor_references(
    items: DataFrame,
    specs: list[RefFieldSpec],
    allowed_actors: DataFrame,
    person_units: DataFrame,
    fallback_contacts: list[str],
    id_col: str = "identifier",
    type_col: str = "entity_type",
) -> tuple[DataFrame, DataFrame]:
    """Rewrite actor references on ``items``; returns (rewritten_items,
    broken_refs).

    - ``items``: one row per merged item; every field in ``specs`` is
      an ``array<string>`` column (null ≡ empty).
    - ``allowed_actors``: single-column DF of publishable actor ids
      (dimension — broadcast).
    - ``person_units``: (_person_id, _unit_id) substitution pairs from
      :func:`unit_ids_per_person` (dimension — broadcast). Only unit
      ids that are themselves allowed are used.
    - ``broken_refs``: (identifier, entity_type, field, refs) for
      required fields left with no valid reference.
    """
    # the rewrite only acts on Person-admitting fields — non-person
    # reference fields (responsibleUnit, publisher, …) flow through
    # untouched exactly like the reference's ``continue`` at
    # transform.py:78-80, so callers may pass the full registry
    specs = [s for s in specs if s.allows_person]
    field_names = sorted({s.field for s in specs})
    spark = items.sparkSession
    spec_df = F.broadcast(
        spark.createDataFrame(
            [
                (s.entity_type, s.field, s.allows_unit, s.allows_contact_point, s.required)
                for s in specs
            ],
            f"{type_col} string, _field string, _allows_unit boolean, "
            "_allows_contact boolean, _required boolean",
        )
    )
    # distinct: duplicate ids in the allowed dimension (union/append
    # builds commonly carry them) would multiply matched ref rows and
    # publish duplicated references — set membership keeps each ref once
    allowed = F.broadcast(
        allowed_actors.toDF("_ref").distinct().withColumn("_allowed", F.lit(True))
    )
    # substitution units must themselves be allowed actors
    subs = F.broadcast(
        person_units.join(
            allowed.select(F.col("_ref").alias("_unit_id")), "_unit_id"
        ).groupBy("_person_id")
        .agg(F.collect_set("_unit_id").alias("_sub_units"))
    )

    # melt: one scan, one inline() over an array of (field, refs) structs
    melted = items.select(
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_etype"),
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("_field"),
                        F.coalesce(F.col(f), F.array().cast("array<string>")).alias(
                            "_refs"
                        ),
                    )
                    for f in field_names
                ]
            )
        ),
    ).join(spec_df.withColumnRenamed(type_col, "_etype"), ["_etype", "_field"])

    exploded = melted.select(
        "_id",
        "_etype",
        "_field",
        "_allows_unit",
        "_allows_contact",
        "_required",
        F.posexplode_outer("_refs").alias("_pos", "_ref"),
    )
    flagged = (
        exploded.join(allowed, "_ref", "left")
        .join(subs, exploded["_ref"] == subs["_person_id"], "left")
    )

    is_ref = F.col("_ref").isNotNull()
    kept_entry = F.when(
        is_ref & (F.col("_allowed") == True),  # noqa: E712
        F.struct(F.col("_pos"), F.col("_ref")),
    )
    sub_units = F.when(
        is_ref & F.col("_allowed").isNull() & (F.col("_allows_unit") == True),  # noqa: E712
        F.coalesce(F.col("_sub_units"), F.array().cast("array<string>")),
    ).otherwise(F.array().cast("array<string>"))

    grouped = flagged.groupBy(
        "_id", "_etype", "_field", "_allows_contact", "_required"
    ).agg(
        F.array_sort(F.collect_list(kept_entry)).alias("_kept"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(sub_units)))).alias(
            "_repl"
        ),
        F.array_sort(
            F.collect_list(F.when(is_ref, F.struct(F.col("_pos"), F.col("_ref"))))
        ).alias("_orig"),
    )

    # substitutions already present among the kept refs must not
    # duplicate (a unit that is BOTH directly referenced and the
    # substitute of a blocked person appears once)
    kept_refs = F.transform(F.col("_kept"), lambda s: s["_ref"])
    rewritten = F.concat(kept_refs, F.array_except(F.col("_repl"), kept_refs))
    fallback = F.array(*[F.lit(c) for c in fallback_contacts])
    # the fallback only rescues a field if there IS a fallback contact
    # (transform.py:99-101 sets then re-checks emptiness before :102)
    has_fallback = len(fallback_contacts) > 0
    orig_refs = F.transform(F.col("_orig"), lambda s: s["_ref"])
    final = F.when(F.size(rewritten) > 0, rewritten)
    if has_fallback:
        final = final.when(F.col("_allows_contact"), fallback)
    final = final.when(F.col("_required"), orig_refs).otherwise(  # broken, kept
        F.array().cast("array<string>")
    )
    is_broken = (
        (F.size(rewritten) == 0)
        & ~(F.col("_allows_contact") & F.lit(has_fallback))
        & F.col("_required")
    )
    resolved = grouped.select(
        "_id",
        "_etype",
        "_field",
        final.alias("_new_refs"),
        is_broken.alias("_broken"),
        orig_refs.alias("_orig_refs"),
    )

    broken_refs = resolved.where("_broken").select(
        F.col("_id").alias(id_col),
        F.col("_etype").alias(type_col),
        F.col("_field").alias("field"),
        F.col("_orig_refs").alias("refs"),
    )

    # fold the per-field rewrites back onto the item rows
    per_item = resolved.groupBy("_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_field"), F.col("_new_refs")))
        ).alias("_rw")
    )
    out = items.join(
        per_item, items[id_col] == per_item["_id"], "left"
    )
    for f in field_names:
        # only fields the item's spec covers appear in the map; others
        # keep their original value (incl. responsibleUnit-style fields)
        out = out.withColumn(
            f,
            F.when(
                F.col("_rw").isNotNull() & F.map_contains_key(F.col("_rw"), f),
                F.col("_rw")[f],
            ).otherwise(F.col(f)),
        )
    return out.drop("_id", "_rw"), broken_refs
