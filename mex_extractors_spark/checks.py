"""Count-based data-quality checks (SURVEY.md §2.5 A6, §2.9 T4).

The reference defines YAML rules (`fail_if` ∈ {not_exactly_x_items,
x_percent_less_than, …}) evaluated against the current count and
materialization history (pipeline/checks/main.py:152-215, rule schema
pipeline/checks/models/check.py:9-30), with blocking checks aborting
downstream assets (pipeline/base.py:113).

Here each rule is a pure function over (current_count, history) and the
blocking behavior is the ReplayEngine's pre_commit_checks hook: a
failing check returns an error string and the batch never commits.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


# rules that compare the current count against materialization history
# (reference pipeline/checks/main.py:26-31 HISTORICAL_RULES)
HISTORICAL_RULES = {
    "x_items_less_than",
    "x_items_more_than",
    "x_percent_less_than",
    "x_percent_more_than",
    "x_percent_less_than_history",  # engine-native aliases
    "x_percent_more_than_history",
}


@dataclass
class CheckRule:
    fail_if: str  # not_exactly_x_items | fewer_than_x_items | more_than_x_items
    #             | x_items_less_than | x_items_more_than
    #             | x_percent_less_than[_history] | x_percent_more_than[_history]
    value: float
    name: str = ""
    # reference rule schema carries a time frame ("10d"/"2m"/"1y",
    # check.py:21-22) selecting WHICH historic count to compare against;
    # the engine's history list is already scoped by the caller, so the
    # frame is carried for provenance/logging only
    time_frame: str | None = None

    def evaluate(self, current: int, history: list[int] | None = None) -> str | None:
        """None = pass; otherwise the failure reason."""
        v = self.value
        if self.fail_if == "not_exactly_x_items" and current != v:
            return f"{self.name}: expected exactly {v} items, got {current}"
        if self.fail_if == "fewer_than_x_items" and current < v:
            return f"{self.name}: expected >= {v} items, got {current}"
        if self.fail_if == "more_than_x_items" and current > v:
            return f"{self.name}: expected <= {v} items, got {current}"
        if self.fail_if in HISTORICAL_RULES:
            if not history:
                return None  # no history yet — vacuously passing, like the reference
            ref = history[-1]
            if ref == 0:
                return None  # main.py:268-269: historic_count <= 0 passes
            if self.fail_if == "x_items_less_than" and current < ref - v:
                return (
                    f"{self.name}: count {current} fell more than {v:g} items "
                    f"below history ({ref})"
                )
            if self.fail_if == "x_items_more_than" and current > ref + v:
                return (
                    f"{self.name}: count {current} rose more than {v:g} items "
                    f"above history ({ref})"
                )
            delta_pct = (current - ref) / ref * 100.0
            if (
                self.fail_if in ("x_percent_less_than", "x_percent_less_than_history")
                and -delta_pct > v
            ):
                return f"{self.name}: count dropped {-delta_pct:.1f}% > {v}% vs history"
            if (
                self.fail_if in ("x_percent_more_than", "x_percent_more_than_history")
                and delta_pct > v
            ):
                return f"{self.name}: count grew {delta_pct:.1f}% > {v}% vs history"
        return None


def count_check(
    rule: CheckRule, history_provider: Callable[[], list[int]] | None = None
) -> Callable[[DataFrame], str | None]:
    """Adapt a rule into a ReplayEngine pre-commit check (blocking)."""

    def check(batch: DataFrame) -> str | None:
        current = batch.count()
        history = history_provider() if history_provider else None
        return rule.evaluate(current, history)

    return check


def rules_to_checks(
    rules: list[CheckRule], metrics_log=None, field: str = "rows_after"
) -> list[Callable[[DataFrame], str | None]]:
    """Bind loaded rules to a :class:`~mex_extractors_spark.streaming.
    metrics.MetricsLog` so each historical rule compares against the
    count closest to ``now - time_frame`` (the reference's historic
    selection, pipeline/checks/main.py:130-155). Static rules ignore the
    provider. Pass the result to ``ReplayEngine(pre_commit_checks=)``.

    Returns ONE composite check: the batch is counted exactly once per
    micro-batch however many rules are bound (N independent checks
    would run N count jobs over the same uncached lineage), and the
    metrics-ledger read happens only for the historical rules that
    actually consult it. Failures of several rules join into one
    blocking message."""
    def composite(batch: DataFrame) -> str | None:
        current = batch.count()
        errs = []
        for r in rules:
            history = (
                metrics_log.counts_at(field=field, time_frame=r.time_frame)
                if metrics_log is not None and r.fail_if in HISTORICAL_RULES
                else None
            )
            err = r.evaluate(current, history)
            if err:
                errs.append(err)
        return "; ".join(errs) if errs else None

    return [composite] if rules else []


_VALID_FAIL_IF = {
    "not_exactly_x_items",
    "fewer_than_x_items",
    "more_than_x_items",
    # reference static rules the engine has no graph for are rejected
    # explicitly below (less_than_x_inbound / less_than_x_outbound)
} | HISTORICAL_RULES


def load_check_rules(path: str, name: str | None = None) -> list[CheckRule]:
    """Parse an asset-check YAML file into :class:`CheckRule`s.

    Mirrors the reference's dynamic check creation
    (pipeline/checks/main.py:38-45 ``load_asset_check_from_settings`` +
    rule schema pipeline/checks/models/check.py:9-30): the document is
    ``{rules: [{fail_if, value, time_frame?, target_type?}, ...]}``.
    Unknown ``fail_if`` values raise (main.py:243-245); the two
    graph-topology rules (``less_than_x_inbound``/``_outbound``) are
    Dagster-asset-graph specific and raise with a pointer to the
    engine's aggregate operators instead of being silently skipped.
    """
    from mex_extractors_spark.sources.mapping_rules import load_rules

    doc = load_rules(path)
    if not isinstance(doc, dict) or "rules" not in doc:
        raise ValueError(f"check YAML {path!r} must have a top-level 'rules' list")
    label = name or path
    out: list[CheckRule] = []
    for i, r in enumerate(doc["rules"]):
        fail_if = r.get("fail_if")
        if fail_if in ("less_than_x_inbound", "less_than_x_outbound"):
            raise ValueError(
                f"{label} rule {i}: {fail_if} checks the asset graph's "
                "connection counts — express it over the engine's "
                "outbound_connection_counts aggregate instead"
            )
        if fail_if not in _VALID_FAIL_IF:
            raise ValueError(f"{label} rule {i}: unknown fail_if {fail_if!r}")
        if r.get("value") is None:
            raise ValueError(f"{label} rule {i}: 'value' is required")
        out.append(
            CheckRule(
                fail_if=fail_if,
                value=float(r["value"]),
                name=f"{label}#{i}:{fail_if}",
                time_frame=r.get("time_frame"),
            )
        )
    return out
