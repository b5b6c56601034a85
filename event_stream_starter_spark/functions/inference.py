"""Pluggable model-backed inference seam (SURVEY.md §2.12 U1-U6).

The reference wires every model call through the same degrade ladder:
try the configured backend, validate its output against a strict schema,
and fall back to a deterministic rules result on ANY failure —
exception, schema violation, or blown latency budget (api/refiner.py:
33-261; api/hf_sentiment.py:75-148; api/sentiment/router.py:39-41).
Results are memoized by input text with a 30 s TTL (api/refiner.py:252).

This module re-expresses those laws for Spark batch execution:

- **Backend registry.** Backends are named batch callables
  (``list[str] -> list[dict]``) selected per call (the analog of the
  reference's ``REFINE_BACKEND`` / ``SENTIMENT_BACKEND`` env switches).
  The default is always the deterministic rules backend, so the
  DuckDB-oracle correctness gate never depends on a model.
- **Per-row degrade.** The reference degrades a whole HTTP call; the
  batch analog degrades each failing row independently, tagging it with
  the reference's reason taxonomy (``schema`` | ``exception`` |
  ``over_budget`` — api/refiner.py:166-231 reason strings; the
  hf_sentiment auth/timeout/http_* classes collapse into ``exception``
  here because transport is the backend's concern, not the engine's).
- **Schema validation** mirrors api/schemas/refine_schema.py:1-33:
  type 1-40 chars, summary 4-80, impacted_assets <= 5, 1-4 reasons of
  4-140 chars each, confidence in [0,1].
- **TTL memoization** is executor-local and keyed by (kind, text):
  repeated evidence text within the TTL re-uses the cached dict, so a
  hot topic's evidence doesn't re-pay model latency per microbatch.
- **Budget.** A per-Arrow-batch wall-clock budget: once spent, the
  remaining uncached rows in that batch take the rules path with reason
  ``over_budget`` (the reference's in-retry over-budget degrade,
  api/refiner.py:208-215).

Spark mapping: ``mapInPandas`` over Arrow record batches. The default
(rules) backend is a pandas re-implementation of the SAME laws as the
column-expression fallbacks in :mod:`..functions.refine` — bit-parity
between the two paths is asserted in tests and by the
``u4_refine_seam`` oracle query, which certifies the whole seam against
DuckDB with the rules backend engaged.

Scale notes: memory per task is one Arrow batch; the memo cache is
per-executor-process and TTL-bounded. A real model backend would hold
its weights in a module-level singleton per executor (standard Spark
model-inference shape) — the registry gives it exactly that seam.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# Contract constants (api/schemas/refine_schema.py; api/refiner.py:33-36)
# ---------------------------------------------------------------------------

SUMMARY_MIN, SUMMARY_MAX = 4, 80
TYPE_MIN, TYPE_MAX = 1, 40
MAX_ASSETS = 5
REASON_MIN_LEN, REASON_MAX_LEN = 4, 140
MIN_REASONS, MAX_REASONS = 1, 4
FALLBACK_CONFIDENCE = 0.35
DEFAULT_BUDGET_MS = 800  # LATENCY_BUDGET_MS_REFINE
MEMO_TTL_S = 30.0  # api/refiner.py:252 memoize_ttl(30)

# Sentiment thresholds (api/hf_sentiment.py:14-15).
POS_THRESHOLD = 0.25
NEG_THRESHOLD = -0.25

# Same rule order = priority as functions/refine.py (adapted lexicon,
# declared divergence from the reference's Chinese-market patterns).
_TYPE_PATTERNS: tuple[tuple[str, str], ...] = (
    ("listing", r"listing|listed|launch"),
    ("hack", r"hack|exploit|rug|scam"),
    ("partnership", r"partner|integrat|collab"),
    ("market", r"pump|dump|moon|crash"),
)
_ASSET_RE = re.compile(r"\$[A-Z]{2,10}")
# Java/Spark `\s` is ASCII-only ([ \t\n\x0B\f\r]); Python's is
# Unicode-aware. The rules twins must match the COLUMN-EXPRESSION laws
# bit-for-bit, so the Python side pins the Java class — a NBSP must NOT
# split tokens here, exactly as it doesn't in Spark (parity vectors in
# tests cover tab/newline/NBSP).
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


class SchemaViolation(ValueError):
    """Backend output failed the refine-schema contract."""


class _OverBudget(Exception):
    """Internal: backend response arrived past the batch budget."""


def validate_refine(out: dict) -> dict:
    """Enforce the api/schemas/refine_schema.py contract; raise
    :class:`SchemaViolation` with the first failure (the reference's
    pydantic ValidationError analog)."""
    if not isinstance(out, dict):
        raise SchemaViolation("output is not a dict")
    t = out.get("type")
    if not isinstance(t, str) or not (TYPE_MIN <= len(t) <= TYPE_MAX):
        raise SchemaViolation(f"type must be a {TYPE_MIN}-{TYPE_MAX} char string")
    s = out.get("summary")
    if not isinstance(s, str) or not (SUMMARY_MIN <= len(s) <= SUMMARY_MAX):
        raise SchemaViolation(f"summary must be {SUMMARY_MIN}-{SUMMARY_MAX} chars")
    assets = out.get("impacted_assets", [])
    if not isinstance(assets, list) or len(assets) > MAX_ASSETS or any(
        not isinstance(a, str) for a in assets
    ):
        raise SchemaViolation(f"impacted_assets must be <= {MAX_ASSETS} strings")
    reasons = out.get("reasons")
    if not isinstance(reasons, list) or not (
        MIN_REASONS <= len(reasons) <= MAX_REASONS
    ):
        raise SchemaViolation(f"reasons must contain {MIN_REASONS}-{MAX_REASONS} items")
    for r in reasons:
        if not isinstance(r, str) or not (REASON_MIN_LEN <= len(r) <= REASON_MAX_LEN):
            raise SchemaViolation(
                f"each reason must be {REASON_MIN_LEN}-{REASON_MAX_LEN} chars"
            )
    try:
        conf = float(out.get("confidence"))
    except (TypeError, ValueError) as exc:
        raise SchemaViolation("confidence must be a float") from exc
    if not (0.0 <= conf <= 1.0):
        raise SchemaViolation("confidence out of range [0,1]")
    return {
        "type": t,
        "summary": s,
        "impacted_assets": assets,
        "reasons": reasons,
        "confidence": conf,
    }


# ---------------------------------------------------------------------------
# Rules backends: pandas twins of the column-expression fallbacks.
# Bit-parity with functions/refine.py + the c11 lexicon exprs is asserted
# in tests (and by the u4_refine_seam / u1_sentiment_seam oracle queries).
# ---------------------------------------------------------------------------


def rules_refine_one(text: str) -> dict:
    """Deterministic refine of ONE text — the degrade target.

    Mirrors functions/refine.py (refined_type / refined_summary /
    impacted_assets / refine_reasons) so the seam's fallback rows equal
    the column-expression path exactly.
    """
    low = text.lower()
    rtype = "other"
    for name, pat in _TYPE_PATTERNS:
        if re.search(pat, low):
            rtype = name
            break
    # .strip(" ") not .strip(): Spark F.trim removes ASCII spaces only.
    summary = _WS_RE.sub(" ", text).strip(" ")[:SUMMARY_MAX]
    # refine_schema requires summary >= 4 chars; the column path has no
    # minimum, so pad deterministically (declared: only fires on <4-char
    # docs, which the synthetic corpus doesn't contain).
    if len(summary) < SUMMARY_MIN:
        summary = (summary + "....")[:SUMMARY_MIN]
    seen: list[str] = []
    for m in _ASSET_RE.findall(text.upper()):
        if m not in seen:
            seen.append(m)
    assets = seen[:MAX_ASSETS]
    reasons = [
        f"matched:{name}" for name, pat in _TYPE_PATTERNS if re.search(pat, low)
    ][:MAX_REASONS] or ["no-pattern"]
    return {
        "type": rtype,
        "summary": summary,
        "impacted_assets": assets,
        "reasons": reasons,
        "confidence": FALLBACK_CONFIDENCE,
    }


def rules_refine_batch(texts: list[str]) -> list[dict]:
    """Vectorized batch twin of :func:`rules_refine_one` (bit-identical;
    asserted in tests). The regex passes run as four pandas
    ``str.contains`` + one ``findall`` + one ``replace`` over the whole
    batch instead of ~10 ``re.search`` per row — measured ~4x on the
    50k-doc scale-smoke corpus. Python-level list work remains only for
    the order-preserving asset dedup."""
    if not texts:
        return []
    s = pd.Series(texts, dtype="object")
    low = s.str.lower()
    masks = {name: low.str.contains(pat, regex=True) for name, pat in _TYPE_PATTERNS}
    rtype = pd.Series(["other"] * len(s), dtype="object")
    for name, _ in reversed(_TYPE_PATTERNS):
        rtype = rtype.where(~masks[name], name)
    summary = s.str.replace(_WS_RE, " ", regex=True).str.strip(" ").str.slice(
        0, SUMMARY_MAX
    )
    short = summary.str.len() < SUMMARY_MIN
    if short.any():
        summary = summary.where(~short, (summary + "....").str.slice(0, SUMMARY_MIN))
    found = s.str.upper().str.findall(_ASSET_RE)
    out: list[dict] = []
    mask_cols = [(name, masks[name]) for name, _ in _TYPE_PATTERNS]
    for i in range(len(s)):
        seen: list[str] = []
        for m in found.iloc[i]:
            if m not in seen:
                seen.append(m)
        reasons = [f"matched:{name}" for name, mk in mask_cols if mk.iloc[i]][
            :MAX_REASONS
        ] or ["no-pattern"]
        out.append(
            {
                "type": rtype.iloc[i],
                "summary": summary.iloc[i],
                "impacted_assets": seen[:MAX_ASSETS],
                "reasons": reasons,
                "confidence": FALLBACK_CONFIDENCE,
            }
        )
    return out


# Sentiment lexicons shared with the column-expression path (c11).
from .scoring import NEGATIVE_WORDS, POSITIVE_WORDS  # noqa: E402


def rules_sentiment_one(text: str) -> dict:
    """Lexicon sentiment — twin of the c11 column expressions: score =
    clamp((pos_hits - neg_hits) / n_toks * 3, -1, 1); label via the
    reference's 0.25 thresholds would be POS/NEG_THRESHOLD, but c11 uses
    +-0.1 (adapted lexicon, declared) — keep c11's so both paths agree.
    """
    # Mirror F.split(F.trim(F.lower(text)), '\\s+'): ASCII-space trim,
    # Java-\s token split (see _WS_RE note).
    trimmed = text.lower().strip(" ")
    toks = _WS_RE.split(trimmed) if trimmed else [""]
    pos = sum(1 for t in toks if t in POSITIVE_WORDS)
    neg = sum(1 for t in toks if t in NEGATIVE_WORDS)
    score = max(-1.0, min(1.0, (pos - neg) / max(len(toks), 1) * 3.0))
    label = "pos" if score > 0.1 else ("neg" if score < -0.1 else "neu")
    return {"label": label, "score": score, "backend": "rules"}


def rules_sentiment_batch(texts: list[str]) -> list[dict]:
    return [rules_sentiment_one(t) for t in texts]


# ---------------------------------------------------------------------------
# Backend registry
# ---------------------------------------------------------------------------

# kind -> name -> batch callable (list[str] -> list[dict])
_BACKENDS: dict[str, dict[str, Callable[[list[str]], list[dict]]]] = {
    "refine": {"rules": rules_refine_batch},
    "sentiment": {"rules": rules_sentiment_batch},
}


def register_backend(kind: str, name: str):
    """Register a model backend, e.g.::

        @register_backend("refine", "my_llm")
        def my_llm(texts: list[str]) -> list[dict]: ...

    The callable runs once per (deduplicated) Arrow batch on the
    executor; heavyweight state (weights, clients) belongs in a
    module-level singleton it closes over.
    """

    def deco(fn: Callable[[list[str]], list[dict]]):
        _BACKENDS.setdefault(kind, {})[name] = fn
        return fn

    return deco


def get_backend(kind: str, name: str) -> Callable[[list[str]], list[dict]]:
    try:
        return _BACKENDS[kind][name]
    except KeyError:
        raise KeyError(f"no {kind!r} backend named {name!r}; registered: "
                       f"{sorted(_BACKENDS.get(kind, {}))}") from None


# Executor-local TTL memo: (kind, backend, text) -> (deadline, result).
# The BACKEND NAME is part of the key: a rules result cached for the
# oracle query must never be served to a model-backed call (and vice
# versa) just because the same text arrived within the TTL.
_MEMO: dict[tuple[str, str, str], tuple[float, dict]] = {}
_MEMO_MAX = 65536  # bound executor memory; evict wholesale when exceeded


def _memo_get(kind: str, backend: str, text: str, now: float) -> dict | None:
    hit = _MEMO.get((kind, backend, text))
    if hit is not None and hit[0] > now:
        return hit[1]
    return None


def _memo_put(
    kind: str, backend: str, text: str, now: float, ttl_s: float, result: dict
) -> None:
    if len(_MEMO) >= _MEMO_MAX:
        # Sweep expired entries first — one high-cardinality batch must
        # not flush every hot cached result (wholesale clear caused a
        # latency spike on the batches that followed). Clear only if the
        # memo is genuinely full of LIVE entries.
        for k in [k for k, v in _MEMO.items() if v[0] <= now]:
            _MEMO.pop(k, None)
        if len(_MEMO) >= _MEMO_MAX:
            _MEMO.clear()
    _MEMO[(kind, backend, text)] = (now + ttl_s, result)


def clear_memo() -> None:
    _MEMO.clear()


# ---------------------------------------------------------------------------
# The degrade ladder, applied to one pandas batch
# ---------------------------------------------------------------------------


def infer_batch(
    kind: str,
    texts: list[str],
    backend_name: str,
    *,
    fallback: Callable[[str], dict],
    validate: Callable[[dict], dict] | None,
    backend_fn: Callable[[list[str]], list[dict]] | None = None,
    fallback_batch: Callable[[list[str]], list[dict]] | None = None,
    budget_ms: float = DEFAULT_BUDGET_MS,
    memo_ttl_s: float = MEMO_TTL_S,
    clock: Callable[[], float] = time.monotonic,
) -> list[tuple[dict, str, str | None]]:
    """Run a backend over `texts` with the reference degrade ladder.

    Returns one ``(result, backend_used, degrade_reason)`` per text.
    degrade_reason is None (clean), 'schema', 'exception', or
    'over_budget' — api/refiner.py's reason strings.

    ``backend_fn`` is the resolved callable (pass it explicitly when the
    batch runs on an executor: backends registered at runtime exist only
    in the driver's registry, so the DataFrame operators resolve the
    name driver-side and ship the callable in the task closure); when
    None it is looked up from the local registry by name.

    The backend is invoked once per batch on the UNIQUE uncached texts
    (memo + in-batch dedup); a batch-level backend exception degrades
    every uncached row (the reference's whole-call degrade), while a
    per-row schema violation degrades only that row.
    """
    t0 = clock()
    out: list[tuple[dict, str, str | None] | None] = [None] * len(texts)
    pending: dict[str, list[int]] = {}
    for i, text in enumerate(texts):
        text = text if isinstance(text, str) else ""
        cached = _memo_get(kind, backend_name, text, t0)
        if cached is not None:
            out[i] = (cached, backend_name, None)
        else:
            pending.setdefault(text, []).append(i)

    if pending:
        uniq = list(pending.keys())
        if backend_name == "rules":
            # The rules backend IS the fallback — no ladder needed. Use
            # the vectorized batch twin when the caller provides one.
            if fallback_batch is not None:
                results = [(r, "rules", None) for r in fallback_batch(uniq)]
            else:
                results = [(fallback(t), "rules", None) for t in uniq]
        elif (clock() - t0) * 1000.0 > budget_ms:
            results = [(fallback(t), "rules", "over_budget") for t in uniq]
        else:
            backend = backend_fn if backend_fn is not None else get_backend(
                kind, backend_name
            )
            try:
                raw = backend(uniq)
                # Post-call budget: a backend response that arrives past
                # the batch budget is DISCARDED and every row degrades —
                # the reference's over-budget law (api/refiner.py:208-215
                # returns the RulesRefiner result when the model blew
                # REFINE_TIMEOUT_MS, even though a response exists).
                if (clock() - t0) * 1000.0 > budget_ms:
                    raise _OverBudget()
                if len(raw) != len(uniq):
                    raise SchemaViolation(
                        f"backend returned {len(raw)} results for {len(uniq)} inputs"
                    )
                results = []
                for t, r in zip(uniq, raw):
                    try:
                        clean = validate(r) if validate is not None else r
                        results.append((clean, backend_name, None))
                    except SchemaViolation:
                        results.append((fallback(t), "rules", "schema"))
            except _OverBudget:
                results = [(fallback(t), "rules", "over_budget") for t in uniq]
            except SchemaViolation:
                results = [(fallback(t), "rules", "schema") for t in uniq]
            except Exception:
                results = [(fallback(t), "rules", "exception") for t in uniq]
        now = clock()
        for t, (res, used, reason) in zip(uniq, results):
            if reason is None:
                _memo_put(kind, backend_name, t, now, memo_ttl_s, res)
            for i in pending[t]:
                out[i] = (res, used, reason)
    return out  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# DataFrame-level operators
# ---------------------------------------------------------------------------

_REFINE_FIELDS = (
    "refined_type string, refined_summary string, impacted_assets string, "
    "refine_confidence double, refine_reasons string, backend_used string, "
    "degrade_reason string"
)

_SENTIMENT_FIELDS = (
    "sentiment_label string, sentiment_score double, "
    "backend_used string, degrade_reason string"
)


def _id_cols_ddl(df: DataFrame, text_col: str, id_cols: list[str]) -> str:
    """DDL for the passthrough id columns, derived from id_cols DIRECTLY.

    Deriving it positionally from select(*id_cols, text_col)[:-1] silently
    misaligns when text_col is also listed in id_cols (duplicate column in
    the select); that shape is ambiguous — reject it."""
    if text_col in id_cols:
        raise ValueError(
            f"text_col {text_col!r} must not appear in id_cols {id_cols!r}"
        )
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in id_cols if c not in fields]
    if missing:
        raise ValueError(f"id_cols not in DataFrame: {missing}")
    return ", ".join(f"{c} {fields[c]}" for c in id_cols)


def refine_with_backend(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    backend: str = "rules",
    budget_ms: float = DEFAULT_BUDGET_MS,
    memo_ttl_s: float = MEMO_TTL_S,
) -> DataFrame:
    """U4 refiner over a DataFrame: id_cols + refine outputs.

    Arrays are emitted '|'-joined (correctness-gate hygiene). With the
    default rules backend the output is bit-identical to the
    column-expression path in queries/udf_fallbacks.py (tested).
    """
    id_ddl = _id_cols_ddl(df, text_col, id_cols)
    out_schema = f"{id_ddl}, {_REFINE_FIELDS}"
    # Resolve driver-side: runtime-registered backends live only in the
    # driver's registry; the callable ships in the task closure.
    backend_fn = None if backend == "rules" else get_backend("refine", backend)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            rows = infer_batch(
                "refine",
                texts,
                backend,
                fallback=rules_refine_one,
                validate=validate_refine,
                backend_fn=backend_fn,
                fallback_batch=rules_refine_batch,
                budget_ms=budget_ms,
                memo_ttl_s=memo_ttl_s,
            )
            res = pdf[id_cols].copy()
            res["refined_type"] = [r[0]["type"] for r in rows]
            res["refined_summary"] = [r[0]["summary"] for r in rows]
            res["impacted_assets"] = ["|".join(r[0]["impacted_assets"]) for r in rows]
            res["refine_confidence"] = [float(r[0]["confidence"]) for r in rows]
            res["refine_reasons"] = ["|".join(r[0]["reasons"]) for r in rows]
            res["backend_used"] = [r[1] for r in rows]
            res["degrade_reason"] = [r[2] for r in rows]
            yield res

    return df.select(*id_cols, text_col).mapInPandas(run, schema=out_schema)


def sentiment_with_backend(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    backend: str = "rules",
    budget_ms: float = DEFAULT_BUDGET_MS,
    memo_ttl_s: float = MEMO_TTL_S,
) -> DataFrame:
    """U1 sentiment over a DataFrame (label/score + degrade columns)."""
    id_ddl = _id_cols_ddl(df, text_col, id_cols)
    out_schema = f"{id_ddl}, {_SENTIMENT_FIELDS}"

    def _validate(out: dict) -> dict:
        label = out.get("label")
        if label not in ("pos", "neu", "neg"):
            raise SchemaViolation("label must be pos|neu|neg")
        try:
            score = float(out.get("score"))
        except (TypeError, ValueError) as exc:
            raise SchemaViolation("score must be a float") from exc
        if not (-1.0 <= score <= 1.0):
            raise SchemaViolation("score out of range [-1,1]")
        return {"label": label, "score": score}

    backend_fn = None if backend == "rules" else get_backend("sentiment", backend)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            rows = infer_batch(
                "sentiment",
                texts,
                backend,
                fallback=rules_sentiment_one,
                validate=_validate,
                backend_fn=backend_fn,
                budget_ms=budget_ms,
                memo_ttl_s=memo_ttl_s,
            )
            res = pdf[id_cols].copy()
            res["sentiment_label"] = [r[0]["label"] for r in rows]
            res["sentiment_score"] = [float(r[0]["score"]) for r in rows]
            res["backend_used"] = [r[1] for r in rows]
            res["degrade_reason"] = [r[2] for r in rows]
            yield res

    return df.select(*id_cols, text_col).mapInPandas(run, schema=out_schema)
