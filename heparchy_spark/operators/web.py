"""URL canonicalization — [ext] web-pipeline ops (SURVEY.md §2.12 family).

Web-crawl dedup keys on canonical URLs: scheme/host case-folding, default
port stripping, fragment removal, tracking-parameter (``utm_*``) removal.
All pure column algebra over RE2-safe regexps (no lookbehind, no
backreferences in patterns), so the same transform chain is expressible in
the DuckDB oracle and stays in whole-stage codegen at scale — a per-row
projection with no shuffle, exactly like the hash-bucket operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["url_parts", "normalize_url", "url_domain"]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://.*$"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*).*$"
_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def url_parts(col: Column | str) -> dict[str, Column]:
    """(scheme, hostport, rest) — regexp_extract split of an absolute URL."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "scheme": F.lower(F.regexp_extract(c, _SCHEME_RE, 1)),
        "hostport": F.lower(F.regexp_extract(c, _HOSTPORT_RE, 1)),
        "rest": F.regexp_replace(c, _PREFIX_RE, ""),
    }


def normalize_url(col: Column | str) -> Column:
    """Canonical URL: lowercase scheme+host, default port stripped
    (http:80 / https:443), fragment dropped, ``utm_*`` query params
    dropped, dangling ``?``/``&`` separators cleaned.

    The transform chain is order-sensitive and mirrored verbatim in the
    oracle SQL; every pattern is in the RE2/Java-regex common subset.
    """
    parts = url_parts(col)
    scheme, hostport = parts["scheme"], parts["hostport"]
    host = F.when(
        (scheme == "https"), F.regexp_replace(hostport, r":443$", "")
    ).otherwise(
        F.when(
            (scheme == "http"), F.regexp_replace(hostport, r":80$", "")
        ).otherwise(hostport)
    )
    rest = parts["rest"]
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    # utm_* removal is anchored at a ?/& param boundary so that "utm_"
    # substrings inside paths or values survive; the repeated group eats
    # consecutive utm params in one pass.
    rest = F.regexp_replace(rest, r"([?&])(utm_[^&#]*&)+", r"$1")  # mid-list
    rest = F.regexp_replace(rest, r"[?&]utm_[^&#]*$", "")  # utm param last
    rest = F.regexp_replace(rest, r"[?&]+$", "")  # dangling separators
    c = F.col(col) if isinstance(col, str) else col
    # relative / schemeless input: pass through untouched rather than
    # emitting a mangled "://..." composite
    return F.when(scheme == "", c).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def url_domain(col: Column | str) -> Column:
    """Registrable-domain approximation: lowercase host, port and a
    leading ``www.`` stripped (no public-suffix list in-container; the
    approximation is documented and deterministic)."""
    hostport = url_parts(col)["hostport"]
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    return F.regexp_replace(host, r"^www\.", "")
