"""URL canonicalization for web-corpus dedup — the normalization every
CommonCrawl-derived pipeline (CCNet, RefinedWeb, C4) runs before URL-level
dedup, as pure built-in column expressions (zero Python in the hot path,
fully whole-stage-codegen).

Normalizations applied (the public canonicalizer consensus):
- drop the fragment (``#...``);
- drop the scheme (http/https collapse — dedup treats them as one page);
- lowercase the host, strip a leading ``www.`` and default ports
  (``:80``/``:443``);
- trim trailing slashes from the path (root stays ``/``);
- drop tracking parameters (``utm_*``, ``fbclid``), sort the survivors.

The DuckDB twin of this chain lives in
``plans/analytics_weblm._CANON_DUCK`` (kept in lockstep stage by stage;
pinned by tests/test_weblm.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(raw: Column) -> tuple[Column, Column]:
    """Return ``(host, curl)`` columns for a raw URL column: the canonical
    registered host and the full canonical URL (host + path + sorted
    surviving query params, scheme-less).

    Composed entirely of built-in string/array functions so the whole
    chain stays inside one codegen'd Project — the right shape for a
    100 TB canonicalization pass."""
    nofrag = F.split_part(raw, F.lit("#"), F.lit(1))
    base = F.split_part(nofrag, F.lit("?"), F.lit(1))
    qs = F.when(
        F.instr(nofrag, "?") > 0,
        F.substr(nofrag, F.instr(nofrag, "?") + F.lit(1)),
    ).otherwise(F.lit(""))
    rest = F.substr(base, F.instr(base, "://") + F.lit(3))
    slash = F.instr(rest, "/")
    hostport = F.when(slash > 0, F.substr(rest, F.lit(1), slash - 1)).otherwise(
        rest
    )
    rawpath = F.when(slash > 0, F.substr(rest, slash)).otherwise(F.lit("/"))
    h1 = F.lower(hostport)
    h2 = (
        F.when(h1.like("%:443"), F.substr(h1, F.lit(1), F.length(h1) - 4))
        .when(h1.like("%:80"), F.substr(h1, F.lit(1), F.length(h1) - 3))
        .otherwise(h1)
    )
    host = F.when(h2.like("www.%"), F.substr(h2, F.lit(5))).otherwise(h2)
    p1 = F.regexp_replace(rawpath, r"/+$", "")
    path = F.when(p1 == "", F.lit("/")).otherwise(p1)
    # Exact-prefix tracking-param semantics (r11 ADVICE): match on the KEY
    # (text before '='), startswith for the literal 'utm_' prefix (LIKE's
    # '_' wildcard would also drop e.g. 'utmx') and equality for 'fbclid'
    # (the old 'fbclid%' LIKE also dropped 'fbclidfoo').
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != F.lit(""))
        & ~F.split_part(p, F.lit("="), F.lit(1)).startswith("utm_")
        & (F.split_part(p, F.lit("="), F.lit(1)) != F.lit("fbclid")),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    curl = F.concat(
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    return host.alias("host"), curl.alias("curl")
