"""Rules-YAML → SQL expression compiler (SURVEY.md §2.10 R1-R4).

Grammar (reference api/rules/eval_event.py:213-519, rules/rules.yml):
- conditions are boolean expressions over a whitelisted field set with
  comparisons (> >= < <= == !=) including Python-style chains
  (`a < b < 5`, desugared to conjunctions at compile time), string
  equality, `is null` / `is not null`, and/or/not, parentheses, numeric
  + quoted-string literals, and `${ENV:default}` substitution (folded at
  compile time — reference eval_event.py:102-125).
- each rule: {id, condition, score, reason, priority}; groups carry a
  priority; total_score = sum of matched scores; level thresholds
  (>= opportunity_threshold → 'opportunity', <= caution_threshold →
  'caution', else 'observe'); missing-source detection appends reasons at
  priority 100 (eval_event.py:423-448).

The compiler emits ANSI SQL usable verbatim by BOTH Spark SQL and DuckDB;
anything outside the token whitelist is rejected at compile time (the
AST-safety analog of eval_event.py:213-260). NULL comparisons are false
under SQL three-valued logic, matching the reference's "null field →
rule does not match" behavior (eval_event.py:467-493).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False

# Whitelisted rule fields (reference eval_event.py:267-276).
DEFAULT_FIELDS = frozenset(
    {
        "goplus_risk",
        "buy_tax",
        "sell_tax",
        "lp_lock_days",
        "dex_liquidity",
        "dex_volume_1h",
        "heat_slope",
        "last_sentiment_score",
        "honeypot",
        "last_sentiment",
        "candidate_score",
        "evidence_count",
    }
)

_ENV_RE = re.compile(r"\$\{([A-Z0-9_]+):([^}]*)\}")


def _sql_str(s: str, dialect: str = "spark") -> str:
    """Single-quoted SQL string literal with quotes doubled. Reason and
    source-name text is config-provided free text — embedding it raw
    would let a quote (or, in Spark, a backslash: the default parser
    treats ``\\`` as an escape character inside string literals, so a
    trailing backslash swallows the closing quote) break out of the
    literal, bypassing the condition grammar's whitelist. DuckDB treats
    backslash literally, so the escaping is dialect-specific — which is
    why this helper is only used from the dialect-parameterized
    emitters, never in the shared condition SQL (where backslashes are
    rejected at tokenize time instead)."""
    body = s.replace("\\", "\\\\") if dialect == "spark" else s
    return "'" + body.replace("'", "''") + "'"

_TOKEN_RE = re.compile(
    r"""
    \s*(
        is\s+not\s+null
      | is\s+null
      | >=|<=|==|!=|>|<
      | \(|\)
      | and\b|or\b|not\b
      | true\b|false\b
      | '[^']*'
      | -?\d+(?:\.\d+)?
      | [A-Za-z_][A-Za-z0-9_]*
    )""",
    re.VERBOSE | re.IGNORECASE,
)

_KEYWORD_MAP = {
    "and": "AND",
    "or": "OR",
    "not": "NOT",
    "true": "TRUE",
    "false": "FALSE",
}


class RuleCompileError(ValueError):
    pass


# Array-function name table: semantics are identical, names differ.
# slice_first(arr, 1, k) must mean "first k elements" in both dialects
# (Spark slice is (start, length); DuckDB list_slice is (begin, end),
# which coincide when start == 1).
# Order-preserving dedup per dialect. The Spark form binds {arr} ONCE
# (a fold that appends first occurrences), so the emitted SQL grows
# linearly with ruleset size; per-row evaluation stays O(n^2) in the
# reason-array length, which is capped at rule count (dozens). The
# DuckDB form still inlines {arr} twice (list_reduce can't change the
# accumulator type there) — acceptable: the oracle dialect runs only at
# test SFs, never in the scaled engine path.
_DIALECTS: dict[str, dict[str, str]] = {
    "spark": {
        "array": "array",
        "filter": "filter",
        "sort": "array_sort",
        "reverse": "reverse",
        "slice_first": "slice",
        "transform": "transform",
        "join": "array_join",
        # Order-preserving dedup: fold left, appending first occurrences
        # — references {arr} exactly once.
        "dedup": (
            "aggregate({arr}, cast(array() as array<string>), "
            "(acc, x) -> if(array_contains(acc, x), acc, array_append(acc, x)))"
        ),
    },
    "duckdb": {
        "array": "list_value",
        "filter": "list_filter",
        "sort": "list_sort",
        "reverse": "list_reverse",
        "slice_first": "list_slice",
        "transform": "list_transform",
        "join": "array_to_string",
        # DuckDB lambda index and list_position are both 1-based.
        "dedup": "list_filter({arr}, (x, i) -> list_position({arr}, x) = i)",
    },
}


def substitute_env(cond: str, env: dict[str, str] | None = None) -> str:
    """Fold ``${ENV:default}`` placeholders (reference eval_event.py:102-125)."""
    env = dict(os.environ) if env is None else env

    def repl(m: re.Match[str]) -> str:
        return env.get(m.group(1), m.group(2))

    return _ENV_RE.sub(repl, cond)


def _tokenize(
    cond: str, fields: frozenset[str] | set[str]
) -> list[tuple[str, str]]:
    """Whitelist-tokenize a condition into (kind, sql) pairs.

    Kinds: ``atom`` (field / number / string / TRUE / FALSE), ``cmp``
    (binary comparison), ``nullcheck`` (postfix IS [NOT] NULL), ``logic``
    (AND/OR/NOT), ``lparen``/``rparen``. Anything else raises."""
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(cond):
        if cond[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(cond, pos)
        if not m:
            raise RuleCompileError(f"illegal token at {pos!r} in condition: {cond!r}")
        tok = m.group(1)
        low = re.sub(r"\s+", " ", tok.lower())
        if low == "is null":
            out.append(("nullcheck", "IS NULL"))
        elif low == "is not null":
            out.append(("nullcheck", "IS NOT NULL"))
        elif low in ("true", "false"):
            out.append(("atom", _KEYWORD_MAP[low]))
        elif low in _KEYWORD_MAP:
            out.append(("logic", _KEYWORD_MAP[low]))
        elif tok == "==":
            out.append(("cmp", "="))
        elif tok == "!=":
            out.append(("cmp", "<>"))
        elif tok in {">", ">=", "<", "<="}:
            out.append(("cmp", tok))
        elif tok == "(":
            out.append(("lparen", tok))
        elif tok == ")":
            out.append(("rparen", tok))
        elif tok.startswith("'"):
            if "\\" in tok:
                # The compiled condition is ONE string evaluated by both
                # Spark (backslash = escape char) and DuckDB (literal) —
                # a backslash cannot mean the same thing in both.
                raise RuleCompileError(
                    f"backslash not allowed in string literal: {tok!r}"
                )
            out.append(("atom", tok))
        elif re.fullmatch(r"-?\d+(?:\.\d+)?", tok):
            out.append(("atom", tok))
        else:
            if tok not in fields:
                raise RuleCompileError(
                    f"field {tok!r} not in whitelist {sorted(fields)}"
                )
            out.append(("atom", tok))
        pos = m.end()
    return out


def _collapse_paren_atoms(
    toks: list[tuple[str, str]],
) -> list[tuple[str, str]]:
    """Collapse a parenthesized bare atom ``( x )`` into a single atom.

    The reference dialect is Python's ast.Compare, where a parenthesized
    operand still participates in a chain — ``(a) < b < 5`` IS a chained
    comparison (api/rules/eval_event.py). Collapsing before desugaring
    lets `_desugar_chains` recognize such chains instead of tripping the
    residual-chain guard. Atoms are pure (field refs / literals), so the
    parens are semantically inert; they are kept in the emitted SQL.
    Runs to fixpoint so nested ``((a))`` collapses too."""
    changed = True
    while changed:
        changed = False
        out: list[tuple[str, str]] = []
        i = 0
        while i < len(toks):
            if (
                i + 2 < len(toks)
                and toks[i][0] == "lparen"
                and toks[i + 1][0] == "atom"
                and toks[i + 2][0] == "rparen"
            ):
                out.append(("atom", f"({toks[i + 1][1]})"))
                i += 3
                changed = True
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def _desugar_chains(toks: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Rewrite Python-style chained comparisons to conjunctions.

    ``a < b < 5`` means ``a < b AND b < 5`` in the reference dialect
    (Python semantics, api/rules/eval_event.py:213-260) but would parse
    as ``(a < b) < 5`` in SQL. The grammar has no arithmetic, so every
    comparison operand is a single atom — a chain is exactly the token
    shape ATOM (CMP ATOM){2,}, rewritten here to a parenthesized AND of
    adjacent pairs. Re-evaluating the shared middle atom is safe (field
    refs and literals are pure).

    The rewritten run is emitted with kind ``chain`` (not ``atom``) so
    the residual-chain guard treats it like a comparison: a following
    nullcheck or cmp (``a < b < 5 is null``) is rejected, matching the
    single-comparison behavior and the reference's parse (which errors
    rather than evaluating ``(a < b AND b < 5) IS NULL``)."""
    out: list[tuple[str, str]] = []
    i = 0
    n = len(toks)
    while i < n:
        if toks[i][0] == "atom":
            j = i
            while j + 2 < n and toks[j + 1][0] == "cmp" and toks[j + 2][0] == "atom":
                j += 2
            n_cmps = (j - i) // 2
            if n_cmps >= 2:
                pieces = [
                    f"{toks[i + 2 * k][1]} {toks[i + 2 * k + 1][1]} {toks[i + 2 * k + 2][1]}"
                    for k in range(n_cmps)
                ]
                out.append(("chain", "(" + " AND ".join(pieces) + ")"))
                i = j + 1
                continue
        out.append(toks[i])
        i += 1
    return out


def compile_condition(
    cond: str,
    fields: frozenset[str] | set[str] = DEFAULT_FIELDS,
    env: dict[str, str] | None = None,
) -> str:
    """Compile one Python-dialect condition to an ANSI-SQL boolean expr.

    Chained comparisons (`a < b < 5`) are desugared to conjunctions at
    compile time (Python semantics, matching the reference's safe-eval).
    Raises RuleCompileError on any token outside the whitelist grammar.
    """
    cond = substitute_env(cond, env)
    toks = _desugar_chains(_collapse_paren_atoms(_tokenize(cond, fields)))
    # Residual-chain guard: after desugaring, any comparison still
    # adjacent to another (e.g. `(a < b) < 5` forced through parens)
    # would be a SQL type error or a silent meaning change — reject,
    # like the reference's AST guard. A desugared chain counts as a
    # comparison here, so `a < b < 5 is null` is rejected too. Resets
    # on and/or/not/(.
    cmp_seen = False
    out: list[str] = []
    for kind, sql in toks:
        out.append(sql)
        if kind in ("logic", "lparen"):
            cmp_seen = False
        elif kind in ("cmp", "nullcheck", "chain"):
            if cmp_seen:
                raise RuleCompileError(
                    f"chained comparison in condition {cond!r} — split with 'and'"
                )
            cmp_seen = True
    return " ".join(out)


@dataclass
class Rule:
    rule_id: str
    condition: str  # compiled SQL
    score: float
    reason: str
    priority: int
    group: str


@dataclass
class RuleSet:
    rules: list[Rule]
    opportunity_threshold: float = 15.0
    caution_threshold: float = -5.0
    # source name -> list of fields; all-null => missing-source reason
    missing_map: dict[str, list[str]] = field(default_factory=dict)
    missing_priority: int = 100
    version: str = "v1"

    # ---- compiled SQL fragments (shared by Spark and the DuckDB oracle) ----

    def score_sql(self) -> str:
        """total_score = sum of matched rule scores (eval_event.py:322-365)."""
        parts = [
            f"(CASE WHEN {r.condition} THEN {r.score} ELSE 0 END)" for r in self.rules
        ]
        return " + ".join(parts) if parts else "0"

    def hit_count_sql(self) -> str:
        parts = [
            f"(CASE WHEN {r.condition} THEN 1 ELSE 0 END)" for r in self.rules
        ]
        return " + ".join(parts) if parts else "0"

    def level_sql(self, score_expr: str | None = None) -> str:
        """opportunity / caution / observe thresholds (rules.yml:105-118)."""
        s = score_expr or f"({self.score_sql()})"
        return (
            f"CASE WHEN {s} >= {self.opportunity_threshold} THEN 'opportunity' "
            f"WHEN {s} <= {self.caution_threshold} THEN 'caution' "
            f"ELSE 'observe' END"
        )

    def _reason_tag(self, r: Rule) -> str:
        # Sortable tag: zero-padded (priority, |score|*10) so lexicographic
        # DESC sort == (priority DESC, abs(score) DESC) — T6 semantics.
        return f"{r.priority:03d}:{int(abs(r.score) * 10):05d}:{r.reason}"

    def reasons_sql(self, top_k: int = 3, joiner: str = ";", dialect: str = "spark") -> str:
        """Top-k reasons by (priority DESC, abs(score) DESC), joined.

        Reference: eval_event.py:521-548 (T6). Emitted per dialect (Spark
        SQL vs DuckDB list-function names; identical semantics): build
        string-tagged array → drop nulls → sort desc → take k → strip
        tags → join.
        """
        d = _DIALECTS[dialect]
        parts = [
            f"CASE WHEN {r.condition} THEN {_sql_str(self._reason_tag(r), dialect)} END"
            for r in self.rules
        ]
        for src, fields in sorted(self.missing_map.items()):
            cond_sql = " AND ".join(f"{f} IS NULL" for f in fields)
            tag = f"{self.missing_priority:03d}:00000:missing {src} data"
            parts.append(f"CASE WHEN {cond_sql} THEN {_sql_str(tag, dialect)} END")
        # join as a LIST: "elems += ', CASE ...'" on an empty rule list
        # would emit array(, CASE ...) — invalid SQL in both dialects.
        elems = ", ".join(parts)
        arr = f"{d['filter']}({d['array']}({elems}), x -> x IS NOT NULL)"
        sorted_desc = f"{d['reverse']}({d['sort']}({arr}))"
        # Strip tags BEFORE dedup: the reference dedups by reason TEXT
        # (eval_event.py:536-543 `seen_reasons`), so two rules sharing a
        # reason string keep only the higher-priority occurrence.
        stripped = f"{d['transform']}({sorted_desc}, x -> substring(x, 11))"
        deduped = d["dedup"].format(arr=stripped)
        sliced = f"{d['slice_first']}({deduped}, 1, {top_k})"
        return f"COALESCE({d['join']}({sliced}, {_sql_str(joiner, dialect)}), '')"

    def missing_sources_sql(self, joiner: str = ",", dialect: str = "spark") -> str:
        """Comma-joined missing-source names (eval_event.py:423-448)."""
        d = _DIALECTS[dialect]
        elems = ", ".join(
            f"CASE WHEN {' AND '.join(f'{f} IS NULL' for f in fields)} "
            f"THEN {_sql_str(src, dialect)} END"
            for src, fields in sorted(self.missing_map.items())
        )
        if not elems:
            return "''"
        return (
            f"COALESCE({d['join']}({d['filter']}({d['array']}({elems}), "
            f"x -> x IS NOT NULL), {_sql_str(joiner, dialect)}), '')"
        )


def load_ruleset(
    source: str | dict,
    fields: frozenset[str] | set[str] = DEFAULT_FIELDS,
    env: dict[str, str] | None = None,
) -> RuleSet:
    """Load + compile a ruleset from a YAML path or a parsed dict.

    YAML shape::

        version: v1
        thresholds: {opportunity: 15, caution: -5}
        missing_map: {dex: [dex_liquidity, dex_volume_1h], hf: [last_sentiment_score]}
        groups:
          - name: liquidity
            priority: 10
            rules:
              - id: LQ01
                condition: "dex_liquidity is not null and dex_liquidity >= 500000"
                score: 8
                reason: "deep liquidity"
    """
    if isinstance(source, str):
        if not _HAVE_YAML:  # pragma: no cover
            raise RuleCompileError("pyyaml unavailable; pass a dict")
        with open(source) as f:
            doc = yaml.safe_load(f)
    else:
        doc = source

    thresholds = doc.get("thresholds", {})
    rules: list[Rule] = []
    for group in doc.get("groups", []):
        gname = group.get("name", "default")
        gprio = int(group.get("priority", 0))
        for r in group.get("rules", []):
            rules.append(
                Rule(
                    rule_id=str(r["id"]),
                    condition=compile_condition(r["condition"], fields, env),
                    score=float(r.get("score", 0)),
                    reason=str(r.get("reason", r["id"])),
                    priority=int(r.get("priority", gprio)),
                    group=gname,
                )
            )
    missing_map = {
        str(k): [str(f) for f in v] for k, v in (doc.get("missing_map") or {}).items()
    }
    for fields_list in missing_map.values():
        for f_ in fields_list:
            if f_ not in fields:
                raise RuleCompileError(f"missing_map field {f_!r} not whitelisted")
    return RuleSet(
        rules=rules,
        opportunity_threshold=float(thresholds.get("opportunity", 15)),
        caution_threshold=float(thresholds.get("caution", -5)),
        missing_map=missing_map,
        version=str(doc.get("version", "v1")),
    )
