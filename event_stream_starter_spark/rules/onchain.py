"""On-chain verdict DSL (SURVEY.md §2.10 R6) and GoPlus-style risk
labeling (R7), compiled to shared SQL.

Reference: api/onchain/rules_engine.py:13-265 (parse 106-124, verdict
243-261), rules/onchain.yml; api/providers/goplus_provider.py:343-399,
rules/risk_rules.yml.

Verdict semantics: ALL downgrade conditions true → 'downgrade' (priority),
else ALL upgrade conditions true → 'upgrade', else 'hold'; any referenced
field NULL or out of its declared range → 'insufficient'
(rules_engine.py:186-221 feature_out_of_range guards). Confidence: the
reference computes min(1, 0.6 + 0.4 * ratio) over the DECIDED branch's
conditions, which are all true at decision time — so decided verdicts are
exactly 1.0, 'hold' is 0.5, 'insufficient' is 0.0
(rules_engine.py:243-261).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_COND_RE = re.compile(
    r"^\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*(>=|<=|>|<|==|!=)\s*([a-zA-Z_][a-zA-Z0-9_]*|-?\d+(?:\.\d+)?)\s*$"
)

_OP_MAP = {">=": ">=", "<=": "<=", ">": ">", "<": "<", "==": "=", "!=": "<>"}

# Feature sanity ranges (rules_engine.py:186-221): a value outside its
# physical range means the enrichment is corrupt — verdict 'insufficient',
# never a decision on garbage. Applied to whichever of these fields the
# loaded rules actually reference.
_RANGE_GUARDS = {
    "addr_active": "{f} < 0",
    "tx_count": "{f} < 0",
    "growth_ratio": "{f} < 0",
    "top10_share": "({f} < 0 OR {f} > 1)",
    "self_loop_ratio": "({f} < 0 OR {f} > 1)",
    "active_addr_pctl": "({f} < 0 OR {f} > 1)",
}


@dataclass
class OnchainRules:
    windows: list[int] = field(default_factory=lambda: [30, 60, 180])
    # Flat {name: value} or reference-shaped nested {field: {name: value}}
    # (rules/onchain.yml nests threshold names under their feature field).
    thresholds: dict = field(default_factory=dict)
    upgrade_if: list[str] = field(default_factory=list)
    downgrade_if: list[str] = field(default_factory=list)

    def _resolve_threshold(self, fld: str, name: str) -> float:
        """Field-scoped lookup first (reference grammar: in
        `"growth_ratio>=fast"` the name `fast` resolves inside
        thresholds[growth_ratio], rules_engine.py:106-124), then flat."""
        scoped = self.thresholds.get(fld)
        if isinstance(scoped, dict) and name in scoped:
            return float(scoped[name])
        v = self.thresholds.get(name)
        if isinstance(v, (int, float)):
            return float(v)
        raise ValueError(f"unknown threshold {name!r} for field {fld!r}")

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
            value = repr(self._resolve_threshold(fld, rhs))
        return f"{fld} {op} {value}", fld

    def verdict_sql(self, window_col: str | None = None) -> dict[str, str]:
        """Compiled SQL fragments: verdict + confidence + note
        (dialect-neutral).

        `window_col`: when given, an unsupported window (value not in
        `self.windows`) yields 'insufficient' with note
        'window_unsupported' BEFORE any feature evaluation — the
        reference checks the window first (rules_engine.py:243-261,
        asserted by its test_insufficient_window vector)."""
        up = [self._compile_cond(c) for c in self.upgrade_if]
        down = [self._compile_cond(c) for c in self.downgrade_if]
        fields = sorted({f for _, f in up + down})
        guards = [f"{f} IS NULL" for f in fields] + [
            _RANGE_GUARDS[f].format(f=f) for f in fields if f in _RANGE_GUARDS
        ]
        insufficient = " OR ".join(guards) or "FALSE"
        if window_col and not self.windows:
            raise ValueError("window_col given but the rules declare no windows")
        window_bad = (
            f"({window_col} IS NULL OR {window_col} NOT IN "
            f"({', '.join(str(w) for w in self.windows)}))"
            if window_col
            else "FALSE"
        )
        all_down = " AND ".join(f"({c})" for c, _ in down) or "FALSE"
        all_up = " AND ".join(f"({c})" for c, _ in up) or "FALSE"
        verdict = (
            f"CASE WHEN {window_bad} THEN 'insufficient' "
            f"WHEN {insufficient} THEN 'insufficient' "
            f"WHEN {all_down} THEN 'downgrade' "
            f"WHEN {all_up} THEN 'upgrade' "
            f"ELSE 'hold' END"
        )
        # min(1, 0.6 + 0.4*ratio) over the decided branch's all-true
        # conditions collapses to 1.0; hold → 0.5; insufficient → 0.0.
        confidence = (
            f"CASE WHEN ({window_bad}) OR ({insufficient}) THEN 0.0 "
            f"WHEN ({all_down}) OR ({all_up}) THEN 1.0 "
            f"ELSE 0.5 END"
        )
        note = (
            f"CASE WHEN {window_bad} THEN 'window_unsupported' "
            f"WHEN {insufficient} THEN 'feature_missing_or_out_of_range' "
            f"ELSE NULL END"
        )
        return {"verdict": verdict, "confidence": confidence, "note": note}


def load_onchain_rules(doc: dict) -> OnchainRules:
    return OnchainRules(
        windows=[int(w) for w in doc.get("windows", [30, 60, 180])],
        thresholds={
            k: ({n: float(x) for n, x in v.items()} if isinstance(v, dict) else float(v))
            for k, v in (doc.get("thresholds") or {}).items()
        },
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
