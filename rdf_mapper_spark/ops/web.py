"""Web/URL operators for crawl-scale corpora: canonical URL normalization.

Common-Crawl-style corpora carry the same page under many textual URLs
(case-variant hosts, default ports, fragments, tracking parameters,
unsorted query strings).  URL canonicalization is the cheap first-line
dedup at 10^12 pages — it is a pure per-row projection (no shuffle), and
grouping by the canonical form replaces content-hash dedup for the large
"same URL, same bytes" class before any text op runs.

All pure Column expressions (regexp + array HOFs), zero Python on the
executors, so the whole normalization inlines into the scan's projection.

Normalization rules (the common subset of RFC 3986 §6 "safe" rules plus
the standard tracker-strip list; documented here because the DuckDB oracle
mirrors them independently):
  1. strip the fragment (`#...`);
  2. lowercase the scheme and host;
  3. drop a default port (`:80` for http, `:443` for https);
  4. empty path -> `/`, collapse repeated `/`;
  5. drop tracking params (utm_*, fbclid, gclid, msclkid, mc_cid, mc_eid,
     ref), drop empty params, sort the rest byte-wise, re-join with `&`;
  6. drop the `?` if no params survive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dropped query parameters: the standard cross-site tracking set
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="


def normalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module rules)."""
    nofrag = F.regexp_replace(url, r"#.*", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.when(
        (scheme == F.lit("http")) & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - 3),
    ).when(
        (scheme == F.lit("https")) & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - 4),
    ).otherwise(hostport)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
