"""URL operators for crawl-corpus curation: canonicalization, registered
domain extraction, and per-domain aggregation.

A fetch-engine corpus keys everything on URLs (the reference normalizes
request URLs and tracks per-host behavior; reference: src/FetchEngine.ts
request handling).  At training-data scale the same normalizations drive
URL-level dedup and per-domain quality stats.  Everything here is a pure
native Column expression (regexp + higher-order functions, zero Python,
zero shuffles until the explicit per-domain aggregation) with exact DuckDB
oracle twins.

Canonical form (the common crawl-dedup normalization set):
- drop the fragment;
- lowercase scheme and host (path/query case is significant, keep it);
- strip the scheme-default port (http:80 / https:443);
- drop tracking query parameters (utm_*, gclid, fbclid, msclkid, ref);
- sort surviving query parameters (param order is not semantic);
- empty path becomes "/".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RX = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RX = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)="

# Two-level public suffixes where the registered domain needs three labels
# (a tiny deterministic subset of the public-suffix list; same literal set
# in the oracle twin).
TWO_LEVEL_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "co.jp",
    "co.in",
    "co.nz",
    "co.za",
    "com.au",
    "com.br",
)


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL with anchored regexps (no parser dependency, so the
    DuckDB twin can reproduce it character-for-character)."""
    u = F.regexp_replace(F.trim(url), r"#.*", "")  # fragment off first
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RX, 1))
    after = F.regexp_replace(u, _SCHEME_RX, "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    pathq = F.substring(after, F.length(hostport) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    host = (
        F.when((scheme == "http"), F.regexp_replace(hostport, r":80$", ""))
        .when((scheme == "https"), F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    return {"scheme": scheme, "host": host, "path": path, "query": query}


def canonical_query(query: Column) -> Column:
    """Tracking params out, survivors sorted, '&'-joined ('' if none)."""
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RX),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column) -> Column:
    p = url_parts(url)
    q = canonical_query(p["query"])
    path = F.when(p["path"] == "", "/").otherwise(p["path"])
    return F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """eTLD+1-style registered domain: last two host labels, or three when
    the last two form a known two-level public suffix."""
    bare = F.regexp_replace(host, r":\d+$", "")
    labels = F.split(bare, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    return (
        F.when((n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(bare)
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain corpus stats (doc count, distinct canonical
    URLs, total chars) — one groupBy on the domain, map-side combinable."""
    parts = url_parts(F.col(url_col))
    enriched = df.select(
        F.col("doc_id"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
        registered_domain(parts["host"]).alias("domain"),
        F.length("text").alias("n_chars"),
    )
    return enriched.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("canonical_url").alias("n_urls"),
        F.sum("n_chars").alias("total_chars"),
    )


# --- DuckDB oracle twins -----------------------------------------------------

# Same anchored regexps; DuckDB regexp_replace needs the 'g' flag wherever
# Spark's replace-all semantics matter (none of these do — every pattern is
# anchored or consumes the rest of the string).
URL_PARTS_SQL = r"""
  lower(regexp_extract(regexp_replace(trim({u}), '#.*', ''), '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
  lower(regexp_extract(regexp_replace(regexp_replace(trim({u}), '#.*', ''), '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?]*)', 1)) AS hostport,
  regexp_replace(regexp_replace(trim({u}), '#.*', ''), '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS after
"""


def canonicalize_url_sql(u: str) -> str:
    """DuckDB expression set mirroring canonicalize_url; returns a WITH-able
    SELECT fragment producing (scheme, host, path, canon_query, canonical_url)
    from expression ``u``."""
    parts = URL_PARTS_SQL.format(u=u)
    return f"""
    SELECT *,
      concat(scheme, '://', host,
             CASE WHEN path = '' THEN '/' ELSE path END,
             CASE WHEN canon_query <> '' THEN '?' || canon_query ELSE '' END
      ) AS canonical_url
    FROM (
      SELECT *,
        array_to_string(
          list_sort(list_filter(string_split(query, '&'),
            p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)='))),
          '&') AS canon_query
      FROM (
        SELECT *,
          CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
               WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
               ELSE hostport END AS host,
          regexp_extract(substr(after, length(hostport) + 1), '^([^?]*)', 1) AS path,
          regexp_extract(substr(after, length(hostport) + 1), '\\?(.*)$', 1) AS query
        FROM (SELECT {parts})
      )
    )
    """


REGISTERED_DOMAIN_SQL = """
  CASE
    WHEN len(string_split(regexp_replace({h}, ':\\d+$', ''), '.')) >= 3
         AND array_to_string(list_slice(string_split(regexp_replace({h}, ':\\d+$', ''), '.'),
             len(string_split(regexp_replace({h}, ':\\d+$', ''), '.')) - 1,
             len(string_split(regexp_replace({h}, ':\\d+$', ''), '.'))), '.')
           IN ('co.uk','org.uk','ac.uk','co.jp','co.in','co.nz','co.za','com.au','com.br')
    THEN array_to_string(list_slice(string_split(regexp_replace({h}, ':\\d+$', ''), '.'),
             len(string_split(regexp_replace({h}, ':\\d+$', ''), '.')) - 2,
             len(string_split(regexp_replace({h}, ':\\d+$', ''), '.'))), '.')
    WHEN len(string_split(regexp_replace({h}, ':\\d+$', ''), '.')) >= 2
    THEN array_to_string(list_slice(string_split(regexp_replace({h}, ':\\d+$', ''), '.'),
             len(string_split(regexp_replace({h}, ':\\d+$', ''), '.')) - 1,
             len(string_split(regexp_replace({h}, ':\\d+$', ''), '.'))), '.')
    ELSE regexp_replace({h}, ':\\d+$', '')
  END
"""
