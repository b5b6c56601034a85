"""On-chain verdict DSL (SURVEY.md §2.10 R6) and GoPlus-style risk
labeling (R7), compiled to shared SQL.

Reference: api/onchain/rules_engine.py:13-265 (parse 106-124, verdict
243-261), rules/onchain.yml; api/providers/goplus_provider.py:343-399,
rules/risk_rules.yml.

Verdict semantics: ALL downgrade conditions true → 'downgrade' (priority),
else ALL upgrade conditions true → 'upgrade', else 'hold'; any referenced
field NULL → 'insufficient'; confidence = min(1, 0.6 + 0.4 * ratio) where
ratio = satisfied upgrade conditions / total upgrade conditions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_COND_RE = re.compile(
    r"^\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*(>=|<=|>|<|==|!=)\s*([a-zA-Z_][a-zA-Z0-9_]*|-?\d+(?:\.\d+)?)\s*$"
)

_OP_MAP = {">=": ">=", "<=": "<=", ">": ">", "<": "<", "==": "=", "!=": "<>"}


@dataclass
class OnchainRules:
    windows: list[int] = field(default_factory=lambda: [30, 60, 180])
    thresholds: dict[str, float] = field(default_factory=dict)
    upgrade_if: list[str] = field(default_factory=list)
    downgrade_if: list[str] = field(default_factory=list)

    def _compile_cond(self, cond: str) -> tuple[str, str]:
        """Returns (sql_condition, field). Named thresholds resolve to
        literal values at compile time (rules_engine.py:106-124)."""
        m = _COND_RE.match(cond)
        if not m:
            raise ValueError(f"bad onchain condition: {cond!r}")
        fld, op, rhs = m.group(1), _OP_MAP[m.group(2)], m.group(3)
        if re.fullmatch(r"-?\d+(?:\.\d+)?", rhs):
            value = rhs
        else:
            if rhs not in self.thresholds:
                raise ValueError(f"unknown threshold {rhs!r} in {cond!r}")
            value = repr(float(self.thresholds[rhs]))
        return f"{fld} {op} {value}", fld

    def verdict_sql(self) -> dict[str, str]:
        """Compiled SQL fragments: verdict + confidence (dialect-neutral)."""
        up = [self._compile_cond(c) for c in self.upgrade_if]
        down = [self._compile_cond(c) for c in self.downgrade_if]
        fields = sorted({f for _, f in up + down})
        any_null = " OR ".join(f"{f} IS NULL" for f in fields) or "FALSE"
        all_down = " AND ".join(f"({c})" for c, _ in down) or "FALSE"
        all_up = " AND ".join(f"({c})" for c, _ in up) or "FALSE"
        n_up = max(len(up), 1)
        ratio = (
            "("
            + (" + ".join(f"(CASE WHEN {c} THEN 1 ELSE 0 END)" for c, _ in up) or "0")
            + f") * 1.0 / {n_up}"
        )
        verdict = (
            f"CASE WHEN {any_null} THEN 'insufficient' "
            f"WHEN {all_down} THEN 'downgrade' "
            f"WHEN {all_up} THEN 'upgrade' "
            f"ELSE 'hold' END"
        )
        confidence = (
            f"CASE WHEN {any_null} THEN 0.0 "
            f"ELSE least(1.0, 0.6 + 0.4 * ({ratio})) END"
        )
        return {"verdict": verdict, "confidence": confidence}


def load_onchain_rules(doc: dict) -> OnchainRules:
    return OnchainRules(
        windows=[int(w) for w in doc.get("windows", [30, 60, 180])],
        thresholds={k: float(v) for k, v in (doc.get("thresholds") or {}).items()},
        upgrade_if=[str(c) for c in doc.get("upgrade_if", [])],
        downgrade_if=[str(c) for c in doc.get("downgrade_if", [])],
    )


def risk_label_sql(
    honeypot: str = "honeypot",
    buy_tax: str = "buy_tax",
    sell_tax: str = "sell_tax",
    lp_lock_days: str = "lp_lock_days",
) -> str:
    """R7 GoPlus risk label: honeypot → red; tax >= 10 → red;
    lp_lock_days < 30 → yellow; any of (buy_tax, sell_tax, honeypot)
    present → green; else unknown.

    Reference: api/providers/goplus_provider.py:343-399 — note the green
    gate is `any(v is not None for v in (buy_tax, sell_tax, honeypot))`:
    lp_lock_days ALONE (even a long lock) never upgrades unknown→green
    there, so it is excluded from the presence disjunction here too.
    """
    return (
        f"CASE WHEN {honeypot} = TRUE THEN 'red' "
        f"WHEN {buy_tax} >= 10 OR {sell_tax} >= 10 THEN 'red' "
        f"WHEN {lp_lock_days} IS NOT NULL AND {lp_lock_days} < 30 THEN 'yellow' "
        f"WHEN {honeypot} IS NOT NULL OR {buy_tax} IS NOT NULL "
        f"OR {sell_tax} IS NOT NULL THEN 'green' "
        f"ELSE 'unknown' END"
    )
