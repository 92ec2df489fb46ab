"""Cross-field validation rules engine.

Mirrors the reference's declarative rules layer
(``/root/reference/src/validation/cross_field.py:142-1105`` — operators
EQUALS/NOT_EQUALS/GT/LT/GE/LE/DATE_BEFORE/DATE_AFTER/REQUIRES/REQUIRES_IF/
SUM_EQUALS with 0.01 money tolerance; tri-state passed/failed/skipped/
inconclusive; per-doc-type rule packs :914-1068) and the tool-validation
helpers (``src/validation/tool_validation.py:45-120`` — ``sum_reconcile``
line-items vs total, ``validate_date_ordering``). Pure per-record functions
→ stateless ``map_batches`` column transforms.
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Callable

from .currency import clean_currency
from .dates import parse_date

PASSED = "passed"
FAILED = "failed"
SKIPPED = "skipped"          # referenced field absent
INCONCLUSIVE = "inconclusive"  # present but unparseable for the operator

MONEY_TOLERANCE = Decimal("0.01")


@dataclass(frozen=True)
class Rule:
    rule_id: str
    op: str                   # EQUALS | NOT_EQUALS | GT | LT | GE | LE |
    #                           DATE_BEFORE | DATE_AFTER | REQUIRES |
    #                           REQUIRES_IF | SUM_EQUALS | CUSTOM
    fields: tuple[str, ...]
    blocking: bool = False    # advisory vs blocking (profile packs)
    predicate: Callable[[dict[str, str]], str] | None = None  # CUSTOM


@dataclass(frozen=True)
class RuleResult:
    rule_id: str
    status: str
    detail: str = ""


def _num(v: str | None) -> Decimal | None:
    if v is None:
        return None
    return clean_currency(v)


def evaluate_rule(rule: Rule, fields: dict[str, str]) -> RuleResult:
    """Tri-state evaluation of one rule against a record's fields."""
    if rule.op == "CUSTOM":
        if rule.predicate is None:
            return RuleResult(rule.rule_id, INCONCLUSIVE, "no predicate")
        return RuleResult(rule.rule_id, rule.predicate(fields))

    vals = [fields.get(f) for f in rule.fields]

    if rule.op == "REQUIRES":
        # fields[0] present → fields[1:] must be present
        if vals[0] is None:
            return RuleResult(rule.rule_id, SKIPPED, "antecedent absent")
        missing = [f for f, v in zip(rule.fields[1:], vals[1:]) if v is None]
        return RuleResult(rule.rule_id, FAILED if missing else PASSED,
                          f"missing={missing}" if missing else "")
    if rule.op == "REQUIRES_IF":
        # fields[0] == fields[1](literal in rule id convention) style is
        # simplified: antecedent is a (field, value) pair packed in fields
        if len(rule.fields) < 3:
            return RuleResult(rule.rule_id, INCONCLUSIVE, "needs 3 fields")
        cond_field, cond_value, target = rule.fields[0], rule.fields[1], rule.fields[2]
        if fields.get(cond_field) != cond_value:
            return RuleResult(rule.rule_id, SKIPPED, "condition not met")
        return RuleResult(rule.rule_id,
                          PASSED if fields.get(target) is not None else FAILED)

    if any(v is None for v in vals):
        return RuleResult(rule.rule_id, SKIPPED, "field absent")

    if rule.op == "SUM_EQUALS":
        # fields[:-1] sum to fields[-1] within money tolerance
        nums = [_num(v) for v in vals]
        if any(n is None for n in nums):
            return RuleResult(rule.rule_id, INCONCLUSIVE, "unparseable amount")
        total = sum(nums[:-1], Decimal("0"))
        ok = abs(total - nums[-1]) <= MONEY_TOLERANCE
        return RuleResult(rule.rule_id, PASSED if ok else FAILED,
                          f"sum={total} expected={nums[-1]}")

    if rule.op in ("DATE_BEFORE", "DATE_AFTER"):
        d1, d2 = parse_date(vals[0]), parse_date(vals[1])
        if d1 is None or d2 is None:
            return RuleResult(rule.rule_id, INCONCLUSIVE, "unparseable date")
        ok = d1 <= d2 if rule.op == "DATE_BEFORE" else d1 >= d2
        return RuleResult(rule.rule_id, PASSED if ok else FAILED)

    if rule.op in ("GT", "LT", "GE", "LE"):
        n1, n2 = _num(vals[0]), _num(vals[1])
        if n1 is None or n2 is None:
            return RuleResult(rule.rule_id, INCONCLUSIVE, "unparseable number")
        ok = {"GT": n1 > n2, "LT": n1 < n2, "GE": n1 >= n2, "LE": n1 <= n2}[rule.op]
        return RuleResult(rule.rule_id, PASSED if ok else FAILED)

    if rule.op == "EQUALS":
        return RuleResult(rule.rule_id,
                          PASSED if vals[0] == vals[1] else FAILED)
    if rule.op == "NOT_EQUALS":
        return RuleResult(rule.rule_id,
                          PASSED if vals[0] != vals[1] else FAILED)
    return RuleResult(rule.rule_id, INCONCLUSIVE, f"unknown op {rule.op}")


def evaluate_rules(rules: list[Rule],
                   fields: dict[str, str]) -> list[RuleResult]:
    return [evaluate_rule(r, fields) for r in rules]


def sum_reconcile(line_items: list[str], total: str) -> RuleResult:
    """Line items vs total (tool_validation sum_reconcile)."""
    rule = Rule("sum_reconcile", "SUM_EQUALS",
                tuple(f"li_{i}" for i in range(len(line_items))) + ("total",))
    fields = {f"li_{i}": v for i, v in enumerate(line_items)}
    fields["total"] = total
    return evaluate_rule(rule, fields)


def validate_date_ordering(dob: str | None, service: str | None,
                           discharge: str | None = None) -> list[RuleResult]:
    """DOB before service; admit ≤ discharge (tool_validation)."""
    out = [evaluate_rule(Rule("dob_before_service", "DATE_BEFORE",
                              ("dob", "service")),
                         {"dob": dob, "service": service})]
    if discharge is not None:
        out.append(evaluate_rule(Rule("admit_before_discharge", "DATE_BEFORE",
                                      ("service", "discharge")),
                                 {"dob": dob, "service": service,
                                  "discharge": discharge}))
    return out


# Declarative rule pack example (doc-type pack analogue, cross_field:914-1068)
TRANSCRIPT_RULE_PACK: list[Rule] = [
    Rule("dates_ordered", "DATE_BEFORE", ("date_0", "date_1")),
    Rule("npi_requires_name", "REQUIRES", ("npi_0", "name_0")),
    Rule("amounts_sum", "SUM_EQUALS", ("amount_0", "amount_1", "amount_2")),
]
