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

from heparchy_spark.operators.psl import PSL_2LABEL, PSL_3LABEL

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
    # repair '?&...' (left by utm removal or present in malformed crawl
    # URLs) so 'p?&a=1' and 'p?a=1' share one canonical dedup key
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")  # dangling separators
    c = F.col(col) if isinstance(col, str) else col
    # relative / schemeless input: pass through untouched rather than
    # emitting a mangled "://..." composite
    return F.when(scheme == "", c).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def url_domain(col: Column | str) -> Column:
    """Registrable domain per the public-suffix list snapshot
    (``operators.psl``): the matched public suffix plus one label.

    Suffix resolution follows PSL semantics over the committed snapshot —
    longest listed suffix wins (3-label, then 2-label), any unlisted TLD
    falls back to the standard single-label rule.  A host that IS a public
    suffix (or a single label, e.g. ``localhost``) is returned whole.

    All column algebra: ``split`` + null-safe ``get`` + ``isin`` (compiles
    to a constant-folded ``InSet`` hash probe, whole-stage codegen, no
    shuffle/join/UDF).  At the full ~10k-entry PSL, swap the ``isin`` for a
    broadcast suffix table join — the operator's output contract is
    unchanged.
    """
    hostport = url_parts(col)["hostport"]
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # F.get is 0-based and returns NULL (no ANSI error) when out of range;
    # concat_ws skips NULLs, and every listed suffix contains a dot, so a
    # short host can never false-match a longer suffix.
    last2 = F.concat_ws(".", F.get(parts, n - 2), F.get(parts, n - 1))
    last3 = F.concat_ws(
        ".", F.get(parts, n - 3), F.get(parts, n - 2), F.get(parts, n - 1)
    )
    sfx = (
        F.when((n >= 3) & last3.isin(*PSL_3LABEL), F.lit(3))
        .when((n >= 2) & last2.isin(*PSL_2LABEL), F.lit(2))
        .otherwise(F.lit(1))
    )
    keep = F.least(n, sfx + 1)
    return F.concat_ws(".", F.slice(parts, n - keep + 1, keep))
