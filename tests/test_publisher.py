"""J7 publisher actor-reference rewrite — goldens mirrored from the
reference's tests/publisher/test_transform.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mex_extractors_spark.operators.publisher import (
    ACTIVITY_SPECS,
    rewrite_actor_references,
    unit_ids_per_person,
)

PERSON_SCHEMA = "identifier string, memberOf array<string>"
UNIT_SCHEMA = "identifier string, email string"
ITEM_SCHEMA = (
    "identifier string, entity_type string, contact array<string>, "
    "involvedPerson array<string>, externalAssociate array<string>, "
    "responsibleUnit array<string>"
)


def _person_units(spark):
    persons = spark.createDataFrame(
        [
            ("PersonWithFallbackUnit", ["ValidUnitWithEmail", "InvalidUnitNoEmail"]),
            ("PersonWithoutFallback", ["InvalidUnitNoEmail"]),
        ],
        PERSON_SCHEMA,
    )
    units = spark.createDataFrame(
        [("ValidUnitWithEmail", "unit@example.org"), ("InvalidUnitNoEmail", None)],
        UNIT_SCHEMA,
    )
    return persons, units


def test_unit_ids_per_person(spark):
    # mirrors tests/publisher/test_transform.py::test_get_unit_id_per_person
    persons, units = _person_units(spark)
    got = {
        (r._person_id, r._unit_id)
        for r in unit_ids_per_person(persons, units).collect()
    }
    assert got == {("PersonWithFallbackUnit", "ValidUnitWithEmail")}


def _rewrite(spark, items_rows, allowed, fallback):
    items = spark.createDataFrame(items_rows, ITEM_SCHEMA)
    persons, units = _person_units(spark)
    pu = unit_ids_per_person(persons, units)
    allowed_df = spark.createDataFrame([(a,) for a in allowed], "id string")
    out, broken = rewrite_actor_references(
        items, ACTIVITY_SPECS, allowed_df, pu, fallback
    )
    return (
        {r.identifier: r.asDict() for r in out.collect()},
        [(r.identifier, r.field, r.refs) for r in broken.collect()],
    )


def test_rewrite_with_contactpoint_fallback(spark):
    # mirrors ..._with_contactpoint_fallback
    out, broken = _rewrite(
        spark,
        [
            (
                "activityCPointFallback",
                "MergedActivity",
                ["thisIdIsBlocked"],
                ["thisIdentifierIsOkay"],
                ["thisIdIsBlocked", "thisIdentifierIsOkay"],
                ["thisUnitIsResponsible"],
            )
        ],
        allowed=["thisIdentifierIsOkay", "thisIdWouldBeOkayToo"],
        fallback=["thisIsTheFallbackId"],
    )
    item = out["activityCPointFallback"]
    assert item["contact"] == ["thisIsTheFallbackId"]
    assert item["externalAssociate"] == ["thisIdentifierIsOkay"]
    assert item["involvedPerson"] == ["thisIdentifierIsOkay"]
    assert item["responsibleUnit"] == ["thisUnitIsResponsible"]  # untouched
    assert broken == []


def test_rewrite_duplicate_allowed_ids_keep_refs_once(spark):
    """Set membership: duplicate ids in the allowed-actor dimension
    (union/append builds carry them) must not multiply the matched refs
    in the rewritten arrays."""
    out, broken = _rewrite(
        spark,
        [
            (
                "activityDupAllowed",
                "MergedActivity",
                ["thisIdentifierIsOkay"],
                ["thisIdentifierIsOkay"],
                ["thisIdentifierIsOkay"],
                ["thisUnitIsResponsible"],
            )
        ],
        allowed=["thisIdentifierIsOkay", "thisIdentifierIsOkay"],
        fallback=["thisIsTheFallbackId"],
    )
    item = out["activityDupAllowed"]
    assert item["contact"] == ["thisIdentifierIsOkay"]
    assert item["externalAssociate"] == ["thisIdentifierIsOkay"]
    assert item["involvedPerson"] == ["thisIdentifierIsOkay"]
    assert broken == []


def test_rewrite_with_unit_fallback(spark):
    # mirrors ..._with_unit_fallback
    out, broken = _rewrite(
        spark,
        [
            (
                "activityUnitFallback",
                "MergedActivity",
                ["PersonWithFallbackUnit", "PersonWithoutFallback"],
                ["thisIdentifierIsOkay"],
                ["thisIdIsBlocked", "thisIdentifierIsOkay", "PersonWithFallbackUnit"],
                ["thisUnitIsResponsible"],
            )
        ],
        allowed=[
            "thisIdentifierIsOkay",
            "thisIdWouldBeOkayToo",
            "ValidUnitWithEmail",
            "InvalidUnitNoEmail",
        ],
        fallback=["thisIsTheFallbackId"],
    )
    item = out["activityUnitFallback"]
    # non-consenting person replaced by their (allowed, has-email) unit
    assert item["contact"] == ["ValidUnitWithEmail"]
    # externalAssociate allows no units -> just filtered
    assert item["externalAssociate"] == ["thisIdentifierIsOkay"]
    assert item["involvedPerson"] == ["thisIdentifierIsOkay"]
    assert item["responsibleUnit"] == ["thisUnitIsResponsible"]
    assert broken == []


def test_rewrite_keeps_broken_refs_on_required_field(spark):
    # transform.py:102-110 — required field with no valid refs keeps the
    # broken originals and reports them (side output instead of a log)
    out, broken = _rewrite(
        spark,
        [
            (
                "activityBroken",
                "MergedActivity",
                ["thisIdIsBlocked"],
                ["thisIdIsBlocked"],
                [],
                ["thisUnitIsResponsible"],
            )
        ],
        allowed=["somebodyElse"],
        fallback=[],  # no fallback contact configured
    )
    item = out["activityBroken"]
    assert item["contact"] == ["thisIdIsBlocked"]  # kept broken on purpose
    assert item["involvedPerson"] == []  # optional -> emptied
    assert item["externalAssociate"] == []
    assert broken == [("activityBroken", "contact", ["thisIdIsBlocked"])]


def test_rewrite_preserves_kept_order_and_sorts_substitutions(spark):
    items = [
        (
            "act1",
            "MergedActivity",
            ["z-ok", "PersonWithFallbackUnit", "a-ok"],
            [],
            [],
            None,
        )
    ]
    out, _ = _rewrite(
        spark,
        items,
        allowed=["z-ok", "a-ok", "ValidUnitWithEmail"],
        fallback=["fb"],
    )
    # kept refs preserve ORIGINAL order; substitutions sorted + appended
    assert out["act1"]["contact"] == ["z-ok", "a-ok", "ValidUnitWithEmail"]


# ---------------------------------------------- full field-spec registry


def test_registry_covers_every_merged_class():
    """publisher/fields.py REFERENCED_ENTITY_TYPES_BY_FIELD_BY_CLASS_NAME
    iterates ALL merged classes; the Spark registry mirrors that."""
    from mex_extractors_spark.operators.publisher import (
        REF_FIELD_SPECS_BY_CLASS,
        person_bearing_specs,
    )

    expected_classes = {
        "MergedAccessPlatform", "MergedActivity", "MergedBibliographicResource",
        "MergedConsent", "MergedContactPoint", "MergedDistribution",
        "MergedOrganization", "MergedOrganizationalUnit", "MergedPerson",
        "MergedPrimarySource", "MergedResource", "MergedVariable",
        "MergedVariableGroup",
    }
    assert set(REF_FIELD_SPECS_BY_CLASS) == expected_classes
    # contact fields always admit Person|Unit|ContactPoint
    for s in person_bearing_specs():
        if s.field == "contact":
            assert s.allows_unit and s.allows_contact_point
    # person-bearing slice per class used by the rewrite
    by_class = {}
    for s in person_bearing_specs():
        by_class.setdefault(s.entity_type, set()).add(s.field)
    assert by_class == {
        "MergedAccessPlatform": {"contact"},
        "MergedActivity": {"contact", "involvedPerson", "externalAssociate"},
        "MergedBibliographicResource": {"creator", "editor", "editorOfSeries"},
        "MergedConsent": {"hasDataSubject"},
        "MergedPrimarySource": {"contact"},
        "MergedResource": {"contact", "contributor", "creator"},
    }


def test_multiclass_rewrite_resource_consent_biblio(spark):
    """One rewrite pass over a mixed three-class corpus: per-class specs
    apply independently; a required person-only field with a blocked ref
    keeps the broken refs (Consent.hasDataSubject, Biblio.creator) while
    Resource.contact escalates person -> unit -> contact-point."""
    from mex_extractors_spark.operators.publisher import person_bearing_specs

    schema = (
        "identifier string, entity_type string, contact array<string>, "
        "contributor array<string>, creator array<string>, "
        "editor array<string>, editorOfSeries array<string>, "
        "hasDataSubject array<string>, unitInCharge array<string>"
    )
    blocked = "PersonWithFallbackUnit"   # not allowed; unit sub exists
    ok = "allowedPerson"
    items = spark.createDataFrame(
        [
            # Resource: contact escalates to the person's unit; creator
            # emptied (person-only, optional); unitInCharge untouched
            ("res1", "MergedResource", [blocked], [blocked], [blocked],
             None, None, None, ["rawUnitRef"]),
            # Consent: required, person-only, no fallback type -> broken
            ("con1", "MergedConsent", None, None, None, None, None,
             [blocked], None),
            # Biblio: required creator broken; optional editor emptied
            ("bib1", "MergedBibliographicResource", None, None, [blocked],
             [blocked, ok], None, None, None),
        ],
        schema,
    )
    persons, units = _person_units(spark)
    allowed_df = spark.createDataFrame(
        [(ok,), ("ValidUnitWithEmail",)], "id string"
    )
    out, broken = rewrite_actor_references(
        items,
        person_bearing_specs(
            "MergedResource", "MergedConsent", "MergedBibliographicResource"
        ),
        allowed_df,
        unit_ids_per_person(persons, units),
        ["cp-fallback"],
    )
    got = {r.identifier: r.asDict() for r in out.collect()}
    assert got["res1"]["contact"] == ["ValidUnitWithEmail"]  # unit sub
    assert got["res1"]["contributor"] == []
    assert got["res1"]["creator"] == []
    assert got["res1"]["unitInCharge"] == ["rawUnitRef"]  # non-person field
    assert got["con1"]["hasDataSubject"] == [blocked]  # broken, kept
    assert got["bib1"]["creator"] == [blocked]  # broken, kept
    assert got["bib1"]["editor"] == [ok]
    broken_set = {(r.identifier, r.field) for r in broken.collect()}
    assert broken_set == {("con1", "hasDataSubject"), ("bib1", "creator")}
