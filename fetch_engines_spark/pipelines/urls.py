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
- strip userinfo (user:pass@ never participates in dedup keys);
- strip the scheme-default port (http:80 / https:443);
- drop tracking query parameters (utm_*, gclid, fbclid, msclkid, ref);
- sort surviving query parameters (param order is not semantic);
- empty path becomes "/".

IP-literal hosts (dotted-quad IPv4, bracketed IPv6) are atomic for
registered-domain purposes — they are returned whole, never label-split.
Known exclusions: percent-encoded hosts are not decoded, and IDN hosts
are not punycoded (both engines agree byte-for-byte on such inputs, they
are just not normalized further).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RX = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RX = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref)="
_USERINFO_RX = r"^[^@]*@"
# dotted-quad IPv4 or bracketed IPv6: atomic, never label-split
_IP_LITERAL_RX = r"^(\[[0-9a-fA-F:.]*\]|\d{1,3}(\.\d{1,3}){3})$"

# Two-level public suffixes where the registered domain needs three labels.
# A deterministic literal subset of the public-suffix list covering the
# ~150 highest-traffic ccTLD second-level registries; the oracle twin's IN
# list is GENERATED from this same tuple, so the two engines cannot drift.
TWO_LEVEL_SUFFIXES = (
    # .uk
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk",
    # .jp
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # .au
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # .nz
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz", "gen.nz",
    "school.nz",
    # .za
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    # .br
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    # .in
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in",
    # .cn
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # .tw
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    # .hk
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    # .sg
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    # .my
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    # .mx
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    # .ar
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    # .co
    "com.co", "net.co", "org.co", "edu.co", "gov.co",
    # .pe
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
    # .ve
    "com.ve", "net.ve", "org.ve", "co.ve",
    # .tr
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    # .pl
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    # .ru / .ua
    "com.ru", "net.ru", "org.ru", "ac.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    # .kr
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    # .id
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    # .th
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    # .vn
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    # .ph
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    # .eg / .sa / .il
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    # .ng / .ke
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke",
)


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL with anchored regexps (no parser dependency, so the
    DuckDB twin can reproduce it character-for-character)."""
    u = F.regexp_replace(F.trim(url), r"#.*", "")  # fragment off first
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RX, 1))
    after = F.regexp_replace(u, _SCHEME_RX, "")
    # raw (pre-userinfo-strip) authority — its UN-lowered length anchors
    # the path slice: full-case lowercasing can CHANGE the length
    # (U+0130 İ → i̇ is two chars), which would shift the slice into the
    # path and swallow its leading '/'
    authority = F.regexp_extract(after, r"^([^/?]*)", 1)
    hostport_raw = F.lower(authority)
    pathq = F.substring(after, F.length(authority) + 1, F.lit(1 << 30))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    hostport = F.regexp_replace(hostport_raw, _USERINFO_RX, "")
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
    the last two form a known two-level public suffix.  IP-literal hosts
    (dotted-quad IPv4, bracketed IPv6) are returned whole — label-splitting
    an address would collide distinct IPs onto one key."""
    bare = F.regexp_replace(host, r":\d+$", "")
    labels = F.split(bare, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    return (
        F.when(bare.rlike(_IP_LITERAL_RX), bare)
        .when((n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3)
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
          CASE WHEN scheme = 'http'
               THEN regexp_replace(regexp_replace(hostport, '^[^@]*@', ''), ':80$', '')
               WHEN scheme = 'https'
               THEN regexp_replace(regexp_replace(hostport, '^[^@]*@', ''), ':443$', '')
               ELSE regexp_replace(hostport, '^[^@]*@', '') END AS host,
          regexp_extract(substr(after, length(hostport) + 1), '^([^?]*)', 1) AS path,
          regexp_extract(substr(after, length(hostport) + 1), '\\?(.*)$', 1) AS query
        FROM (SELECT {parts})
      )
    )
    """


def registered_domain_sql(h: str) -> str:
    """DuckDB twin of registered_domain over host expression ``h``: same
    IP-literal guard, same label slices, and an IN list generated from the
    SAME TWO_LEVEL_SUFFIXES tuple as the Spark expression."""
    bare = f"regexp_replace({h}, ':\\d+$', '')"
    labels = f"string_split({bare}, '.')"
    n = f"len({labels})"
    last2 = f"array_to_string(list_slice({labels}, {n} - 1, {n}), '.')"
    last3 = f"array_to_string(list_slice({labels}, {n} - 2, {n}), '.')"
    suffixes = ",".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    ip_rx = r"^(\[[0-9a-fA-F:.]*\]|\d{1,3}(\.\d{1,3}){3})$"
    return f"""
  CASE
    WHEN regexp_matches({bare}, '{ip_rx}') THEN {bare}
    WHEN {n} >= 3 AND {last2} IN ({suffixes})
    THEN {last3}
    WHEN {n} >= 2
    THEN {last2}
    ELSE {bare}
  END
"""


# --- S5: resource/domain blocking (corpus-side analog) -----------------------

# The reference blocks in-page resource requests during render by resource
# type and by domain glob pattern (reference: src/PlaywrightEngine.ts:974-1001
# applyBlockingRules; defaults src/browser/PlaywrightBrowserPool.ts:304-328).
# The batch analog filters a corpus's resource references (media spans,
# outbound asset URLs) with the SAME pattern semantics: a glob becomes a
# regex by escaping dots and mapping '*' -> '.*', then an UNANCHORED search
# against the full URL; resource-type blocking is a plain membership test.
DEFAULT_BLOCKED_DOMAINS = (
    "doubleclick.net",
    "google-analytics.com",
    "googletagmanager.com",
    "googlesyndication.com",
    "googleadservices.com",
    "adservice.google.com",
    "facebook.net",
    "fbcdn.net",
    "connect.facebook.net",
    "ads-twitter.com",
    "platform.twitter.com",
    "analytics.tiktok.com",
    "ads.tiktok.com",
    "amazon-adsystem.com",
    "adnxs.com",
    "criteo.com",
    "scorecardresearch.com",
    "quantserve.com",
    "rubiconproject.com",
    "pubmatic.com",
    "taboola.com",
    "outbrain.com",
)
DEFAULT_BLOCKED_RESOURCE_TYPES = ("image", "font", "media", "websocket")
# fastMode appends these to whatever the pool config carries
# (PlaywrightEngine.ts:975-977)
FAST_MODE_EXTRA_BLOCKED_TYPES = ("image", "font", "stylesheet", "media")


def blocked_domain_regex(patterns: tuple[str, ...] | list[str]) -> str:
    """Glob patterns -> one alternation regex with the reference's exact
    translation (escape '.', '*' -> '.*'; every other character is passed
    through raw, faithful to PlaywrightEngine.ts:995-997).  The translation
    uses no constructs that differ between Java regex (Spark rlike) and
    RE2 (DuckDB regexp_matches), so both engines match identically."""
    if not patterns:
        # match nothing: empty alternation is illegal; an empty character
        # class is the portable never-match (RE2 has no lookahead)
        return r"[^\s\S]"
    alts = "|".join(p.replace(".", r"\.").replace("*", ".*") for p in patterns)
    return f"({alts})"


def block_resources(
    df: DataFrame,
    url_col: str = "url",
    kind_col: str = "kind",
    blocked_domains: tuple[str, ...] | list[str] = DEFAULT_BLOCKED_DOMAINS,
    blocked_resource_types: tuple[str, ...] | list[str] = DEFAULT_BLOCKED_RESOURCE_TYPES,
    fast_mode: bool = False,
) -> DataFrame:
    """Annotate a resource-reference table with the reference's blocking
    verdicts: ``blocked_by_type`` (resource-type membership, checked FIRST
    as in applyBlockingRules), ``blocked_by_domain`` (glob-pattern search
    over the full URL), and the combined ``blocked``.  Rows, not filters:
    callers drop or keep (the reference aborts the request; a corpus job
    usually also wants the audit trail of WHAT was blocked).

    Scale shape: pure native Column expressions (one rlike against a
    compiled alternation + an isin) riding the scan — zero shuffles, zero
    Python, safe at any corpus size."""
    types = tuple(blocked_resource_types) + (
        FAST_MODE_EXTRA_BLOCKED_TYPES if fast_mode else ()
    )
    rx = blocked_domain_regex(blocked_domains)
    by_type = F.col(kind_col).isin(*types) if types else F.lit(False)
    by_domain = F.coalesce(F.col(url_col).rlike(rx), F.lit(False))
    return df.withColumns(
        {
            "blocked_by_type": by_type,
            "blocked_by_domain": by_domain,
            "blocked": by_type | by_domain,
        }
    )


def block_resources_sql(
    url: str,
    kind: str,
    blocked_domains: tuple[str, ...] | list[str] = DEFAULT_BLOCKED_DOMAINS,
    blocked_resource_types: tuple[str, ...] | list[str] = DEFAULT_BLOCKED_RESOURCE_TYPES,
    fast_mode: bool = False,
) -> str:
    """DuckDB twin of :func:`block_resources`: SELECT-fragment producing
    (blocked_by_type, blocked_by_domain, blocked) from expressions ``url``
    and ``kind``; the regex is GENERATED from the same tuple as the Spark
    expression, so the engines cannot drift."""
    types = tuple(blocked_resource_types) + (
        FAST_MODE_EXTRA_BLOCKED_TYPES if fast_mode else ()
    )
    rx = blocked_domain_regex(blocked_domains).replace("'", "''")
    in_list = ",".join(f"'{t}'" for t in types) or "''"
    by_type = f"coalesce({kind} IN ({in_list}), FALSE)"
    by_domain = f"coalesce(regexp_matches({url}, '{rx}'), FALSE)"
    return (
        f"{by_type} AS blocked_by_type, {by_domain} AS blocked_by_domain, "
        f"({by_type} OR {by_domain}) AS blocked"
    )
