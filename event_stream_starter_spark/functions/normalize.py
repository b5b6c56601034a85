"""Normalization column expressions.

Reference semantics (cited per function): api/events.py:123-207, 380-411;
api/utils/ca.py:9-85. Re-expressed as Catalyst expressions — lowercase /
regexp_replace chains — rather than imperative Python, so they vectorize
and push into codegen. NFC unicode normalization (reference api/events.py:
388) has two arms, like C2: the column fast path (:func:`normalize_text`)
skips it — already-NFC ingest, the overwhelming case — and
:func:`normalize_text_full` applies :func:`nfc` (Arrow-batched
``unicodedata.normalize``) first for full reference fidelity on
combining-character text.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"https?://\S+"
_WWW_RE = r"www\.\S+"
# Bare domains need a trailing delimiter, so a domain at end-of-string
# survives — the reference regex has the same quirk (kept deliberately).
_DOMAIN_RE = (
    r"\b[a-zA-Z0-9][a-zA-Z0-9-]*"
    r"\.(?:com|org|net|io|xyz|co|app|tech|ai|dev|finance|eth)[\s,\.!?;:]"
)
_HANDLE_RE = r"@\w+"
_SPACE_RE = r"\s+"


def normalize_text(text: Column) -> Column:
    """Lowercase, strip URLs (scheme'd, www., bare-domain+TLD) and
    @handles (keep #hashtags), collapse spaces.

    Reference: api/events.py:380-411 (_normalize_text), including the
    replacement strings: URLs/www/handles delete to '', bare domains
    replace with ' ' — the distinction shows when a removal would fuse
    two adjacent tokens.
    """
    c = F.lower(text)
    c = F.regexp_replace(c, _URL_RE, "")
    c = F.regexp_replace(c, _WWW_RE, "")
    c = F.regexp_replace(c, _DOMAIN_RE, " ")
    c = F.regexp_replace(c, _HANDLE_RE, "")
    c = F.regexp_replace(c, _SPACE_RE, " ")
    return F.trim(c)


def nfc(text: Column) -> Column:
    """NFC unicode normalization (reference api/events.py:388) as an
    Arrow-batched pandas UDF — Spark SQL has no canonical-composition
    builtin, so this is the honest slow-path sibling (same pattern as
    :func:`normalize_url_full`). One Arrow buffer per batch; NULLs pass
    through."""
    import unicodedata

    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):  # type: ignore[no-untyped-def]
        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if isinstance(v, str) else v
        )

    return _udf(text)


def normalize_text_full(text: Column) -> Column:
    """C1 with full reference fidelity: NFC first (api/events.py:388),
    then the same strip/collapse laws as :func:`normalize_text`. Use the
    column fast path on corpus-sized hot paths whose ingest already
    guarantees NFC; use this where combining-character input is possible
    (the reference applies NFC unconditionally)."""
    return normalize_text(nfc(text))


def normalize_url(url: Column) -> Column:
    """Canonicalize a URL: https scheme, drop fragment, drop trailing
    slashes, drop utm_*/ref/ref_src query params, sort surviving params.

    Reference: api/events.py:123-173 (_normalize_url). Declared
    divergences (need a real URL parser; exotic-URL-only): IDN punycode
    and default-port dropping; param sort orders the raw 'k=v' fragments
    (binary collation) instead of (lowercased-key, value) tuples — equal
    whenever keys are lowercase and '='-free, the overwhelming case.
    """
    c = F.regexp_replace(url, r"^http://", "https://")
    pre = F.regexp_replace(c, r"#.*$", "")  # fragment
    c = F.regexp_replace(
        pre, r"[?&](utm_[^=&]*|ref|ref_src)=[^&]*", ""
    )  # tracking params
    # Stripping a leading '?utm_...' eats the '?', leaving the survivors
    # attached with a bare '&' — promote the first dangling '&' back to
    # '?'. Gated on "the strip actually removed the '?'" (pre had one,
    # post doesn't), so a URL with a literal '&' in its path and no
    # query string (https://x.com/a&b/c) is never rewritten.
    c = F.when(
        pre.contains("?") & ~c.contains("?"),
        F.regexp_replace(c, r"^([^?&]*)&", r"$1?"),
    ).otherwise(c)
    # Sort surviving query params for stability (reference q.sort()).
    qpos = F.instr(c, "?")
    base = F.substring(c, F.lit(1), qpos - 1)
    query = F.substring(c, qpos + 1, F.length(c))
    c = F.when(
        (qpos > 0) & (F.length(query) > 0),
        F.concat(base, F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")),
    ).otherwise(c)
    c = F.regexp_replace(c, r"\?$", "")
    c = F.regexp_replace(c, r"/+$", "")
    return c


_TRACKING_PARAM_KEYS = ("ref", "ref_src")


def _canonical_url(u) -> str | None:
    """Full-fidelity C2 canonicalization, one URL (pure Python).

    The parser-needing residuals the column path can't express
    (reference api/events.py:123-173): IDN hosts → punycode,
    default-port dropping, and the (lowercased-key, value) TUPLE sort
    of surviving query params (re-encoded, so '=' in a value is
    percent-escaped). Faithful to the reference's quirks: the scheme is
    normalized to https BEFORE the default-port check (so
    ``http://h:80`` keeps its :80 — 80 is not https' default), a bare
    host gains the root path '/', and any parse failure returns the
    input UNCHANGED (fail-open; a malformed URL must not become NULL
    and vanish from dedup keys).
    """
    if not u or not isinstance(u, str):
        return None
    try:
        from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

        parts = urlsplit(u.strip())
        scheme = (
            "https" if parts.scheme in ("", "http", "https") else parts.scheme.lower()
        )
        host = parts.hostname or ""
        try:
            host = host.encode("idna").decode("ascii") if host else host
        except Exception:
            host = host.lower()
        netloc = host
        port = parts.port
        if port and not (
            (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
        ):
            netloc = f"{host}:{port}"
        kept = sorted(
            ((k or "").lower(), v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not (k or "").lower().startswith("utm_")
            and (k or "").lower() not in _TRACKING_PARAM_KEYS
        )
        path = parts.path or "/"
        if path != "/":
            path = re.sub(r"/+$", "", path)
        return urlunsplit((scheme, netloc, path, urlencode(kept, doseq=True), ""))
    except Exception:
        return u


def normalize_url_full(url: Column) -> Column:
    """Arrow-batched pandas UDF wrapping :func:`_canonical_url`.

    This is the slow-path sibling of :func:`normalize_url` (the JVM
    column expression): use the column path in corpus-sized hot paths
    (its residual divergences are exotic-URL-only) and this one where
    full reference fidelity matters (key derivation for dedup across
    mixed-case/IDN/ported URLs). Arrow batching keeps the Python
    boundary one buffer per batch, not one call per row.
    """
    import pandas as pd  # noqa: F401  (pandas_udf requires pandas present)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):  # type: ignore[no-untyped-def]
        return s.map(_canonical_url)

    return _udf(url)


def normalize_token_symbol(symbol: Column) -> Column:
    """Trim, lowercase, ensure a single ``$`` prefix.

    Reference: api/events.py:187-207 (_normalize_token_symbol).
    """
    stripped = F.regexp_replace(F.lower(F.trim(symbol)), r"^\$+", "")
    return F.when(F.length(stripped) > 0, F.concat(F.lit("$"), stripped)).otherwise(
        F.lit(None)
    )


def normalize_ca(ca: Column) -> Column:
    """EVM contract-address normalization: lowercase, ensure 0x + exactly 40
    hex chars; anything else → NULL (invalid).

    Reference: api/utils/ca.py:9-85.
    """
    lowered = F.lower(F.trim(ca))
    body = F.regexp_replace(lowered, r"^0x", "")
    ok = body.rlike(r"^[0-9a-f]{40}$")
    return F.when(ok, F.concat(F.lit("0x"), body)).otherwise(F.lit(None))
