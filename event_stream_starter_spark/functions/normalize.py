"""Normalization column expressions.

Reference semantics (cited per function): api/events.py:123-207, 380-411;
api/utils/ca.py:9-85. Re-expressed as Catalyst expressions — lowercase /
regexp_replace chains — rather than imperative Python, so they vectorize
and push into codegen. NFC unicode normalization (reference api/events.py:
388) is intentionally NOT applied: the engine declares NFC as a
pre-ingest contract; everything else matches.
"""

from __future__ import annotations

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
