"""Declarative rules engine: YAML rules compiled to Catalyst expressions.

The reference evaluates Python-ish boolean expressions per row with a
restricted `eval` (api/rules/eval_event.py:263-519). This engine compiles
the same grammar ONCE into SQL expressions that run inside whole-stage
codegen — per-row cost is native, and the identical SQL strings drive the
DuckDB oracle.
"""

from .compiler import RuleSet, compile_condition, load_ruleset

__all__ = ["RuleSet", "compile_condition", "load_ruleset"]
