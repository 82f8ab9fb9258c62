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


@dataclass
class CheckRule:
    fail_if: str  # not_exactly_x_items | fewer_than_x_items | more_than_x_items
    #             | x_percent_less_than_history | x_percent_more_than_history
    value: float
    name: str = ""

    def evaluate(self, current: int, history: list[int] | None = None) -> str | None:
        """None = pass; otherwise the failure reason."""
        v = self.value
        if self.fail_if == "not_exactly_x_items" and current != v:
            return f"{self.name}: expected exactly {v} items, got {current}"
        if self.fail_if == "fewer_than_x_items" and current < v:
            return f"{self.name}: expected >= {v} items, got {current}"
        if self.fail_if == "more_than_x_items" and current > v:
            return f"{self.name}: expected <= {v} items, got {current}"
        if self.fail_if.endswith("_history"):
            if not history:
                return None  # no history yet — vacuously passing, like the reference
            ref = history[-1]
            if ref == 0:
                return None
            delta_pct = (current - ref) / ref * 100.0
            if self.fail_if == "x_percent_less_than_history" and -delta_pct > v:
                return f"{self.name}: count dropped {-delta_pct:.1f}% > {v}% vs history"
            if self.fail_if == "x_percent_more_than_history" and delta_pct > v:
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
