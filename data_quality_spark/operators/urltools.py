"""URL canonicalization and URL-level dedup for web-crawl corpora.

A Common-Crawl-style pipeline sees the same page under many raw URLs
(scheme/case/`www.` variants, default ports, tracking params, param
order, trailing slashes, fragments).  Canonicalizing the URL and
deduplicating on the canonical key is the first, cheapest dedup stage —
it removes recrawl copies before any content hashing runs.

Everything here is a pure Catalyst expression (codegen'd, no Python in
the hot path) with an exact DuckDB twin in `queries.py`, following the
engine's parity conventions.  The reference framework has no URL
operator (its dedup starts at record matching,
`record-linkage/.../matchmerge/MatchMergeAlgorithm.java:1`); this is one
of the training-data-pipeline extensions the engine adds on top.

Scale notes (10^12 pages):
- `canonical_url` / `registered_domain` are per-row expressions — they
  ride the scan, no shuffle.
- `url_duplicate_groups` shuffles `(canonical_key, id)` pairs only
  (partial-agg combine applies); page payloads never move.
- the canonical key is also the right PRE-shuffle dedup key for
  `drop_exact_duplicates`-style keep-first semantics, and the
  `registered_domain` output is the salting domain key `skew.py`
  expects (a handful of giant hosts dominate real crawls).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC-3986-shaped splitter (Java/RE2 common subset): scheme://authority
# path ?query #fragment.  Group numbers: 1=scheme, 2=authority, 3=path,
# 4=query (without '?').
URL_RX = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

# Tracking params dropped during canonicalization (name= prefix match).
TRACKING_PARAM_RX = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|ref|mc_cid|mc_eid)="

# Multi-label public suffixes for the two/three-label registered-domain
# heuristic.  A curated high-traffic subset of the public suffix list
# (publicsuffix.org) — a drop-in data extension, same device as the
# curated NANPA table in functions/phone_metadata.py.
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "com.br", "net.br", "org.br",
    "com.mx", "co.in", "net.in", "org.in", "com.cn", "net.cn",
    "com.tw", "co.za", "com.ar", "com.tr", "co.nz", "net.nz",
    "com.sg", "com.hk", "co.th", "com.my", "co.id",
)


def canonical_url(url: Column) -> Column:
    """Canonical form of a raw URL (pure expression, null-safe).

    Spec (applied in order; each step is reproduced verbatim by the
    DuckDB oracle in `queries.py`):

    1. parse with `URL_RX`; a non-matching value canonicalizes to NULL;
    2. lowercase the scheme and the authority (path/query case is
       significant and preserved);
    3. strip the scheme's default port (`:80` for http, `:443` for
       https) from the authority;
    4. strip one leading `www.` from the host;
    5. normalize the path: strip trailing slashes; an empty path
       becomes `/`;
    6. drop tracking query params (`TRACKING_PARAM_RX`), sort the
       survivors bytewise, rejoin with `&`; an empty survivor set drops
       the `?` entirely;
    7. drop the fragment.
    """
    scheme = F.lower(F.regexp_extract(url, URL_RX, 1))
    auth = F.lower(F.regexp_extract(url, URL_RX, 2))
    path = F.regexp_extract(url, URL_RX, 3)
    query = F.regexp_extract(url, URL_RX, 4)

    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    host = F.regexp_replace(auth, r"^www\.", "")

    path_c = F.regexp_replace(path, "/+$", "")
    path_c = F.when(path_c == "", F.lit("/")).otherwise(path_c)

    # tiny per-URL arrays: the interpreted-HOF cost is negligible here
    # (CLAUDE.md hot-path rule targets per-doc text arrays, not ≤10 params)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RX),
        )
    )
    query_c = F.array_join(params, "&")

    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        path_c,
        F.when(query_c == "", F.lit("")).otherwise(F.concat(F.lit("?"), query_c)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(out)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a hostname: last two labels, or
    last three when the final two form a multi-label public suffix from
    `MULTI_SUFFIXES`.  Any `:port` suffix is stripped first.  This is the
    domain-level grouping/salting key for crawl skew handling."""
    h = F.regexp_replace(host, ":[0-9]+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat(F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1))
    suffix_arr = F.array(*[F.lit(s) for s in MULTI_SUFFIXES])
    last3 = F.concat(F.element_at(labels, -3), F.lit("."), last2)
    return (
        F.when((n >= 3) & F.array_contains(suffix_arr, last2), last3)
        .when(n >= 2, last2)
        .otherwise(h)
    )


def host_of(url: Column) -> Column:
    """Canonical host (lowercased, default port and `www.` stripped) of a
    raw URL — the `registered_domain` input."""
    scheme = F.lower(F.regexp_extract(url, URL_RX, 1))
    auth = F.lower(F.regexp_extract(url, URL_RX, 2))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    return F.regexp_replace(auth, r"^www\.", "")


def domain_quality_profile(
    df: DataFrame,
    url_col: str = "url",
    keep_col: str = "keep",
    score_col: str = "quality",
) -> DataFrame:
    """Per-registered-domain quality rollup: page count, kept count,
    keep rate, and the quality-score min/max.  The operational view a
    crawl pipeline uses to blocklist or downsample spammy domains.

    Scale notes (10^12 pages):
    - the only shuffle carries `(domain, keep, score)` triples — never
      page payloads;
    - every aggregate is algebraic (count/sum/min/max), so map-side
      partial aggregation caps what any one reducer sees even on the
      giant-domain skew a real crawl has — no salting needed here
      (contrast `skew.py` for the non-algebraic paths);
    - mean quality is deliberately NOT emitted: a float sum is
      order-dependent across partitionings, while min/max and the
      integer-ratio keep_rate are bit-stable (parity conventions at the
      top of `queries.py`).
    """
    dom = registered_domain(host_of(F.col(url_col))).alias("domain")
    agg = (
        df.select(dom, F.col(keep_col).alias("_k"), F.col(score_col).alias("_s"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("_k").cast("bigint")).cast("bigint").alias("n_keep"),
            F.min("_s").alias("min_quality"),
            F.max("_s").alias("max_quality"),
        )
    )
    return agg.withColumn("keep_rate", F.col("n_keep") / F.col("n_docs"))


# href attribute of anchor tags (group 1 is the target URL).  The
# whitespace class is spelled explicitly because `\s` is NOT in the
# Java/RE2 common subset (Java includes \x0B, RE2 does not — the same
# dialect trap as \v in operators/htmltext.py).
HREF_RX = r"<a[ \t\n\r\f]+[^>]*href=\"([^\"]*)\""


def outlink_domain_edges(
    df: DataFrame, html_col: str, src_url_col: str
) -> DataFrame:
    """Registered-domain link graph from raw markup: extract every
    `<a href>` target, canonicalize source and target hosts, and emit
    `(src_domain, dst_domain, n_links)` edges — the corpus-level link
    graph that feeds domain-authority / spam-farm signals.

    Scale shape (10^12 pages): href extraction and both domain
    derivations are per-row expressions riding the scan; the explode
    multiplies rows by links-per-page but carries only
    `(src_domain, href)` string pairs — never page payloads — and the
    edge aggregation partial-combines map-side, so the shuffle is the
    DISTINCT edge set, not the raw link instances."""
    src_dom = registered_domain(host_of(F.col(src_url_col))).alias("src_domain")
    links = df.select(
        src_dom,
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(HREF_RX), 1)).alias("_href"),
    )
    dst_dom = registered_domain(host_of(F.col("_href"))).alias("dst_domain")
    return (
        links.select("src_domain", dst_dom)
        .groupBy("src_domain", "dst_domain")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_links"))
    )


def url_duplicate_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group pages by canonical URL: one row per canonical key with the
    group size, the number of distinct raw spellings, and the kept
    (minimum-id, i.e. earliest-capture) page id.

    Shuffle carries `(canonical_url, id, raw_url)` triples only —
    payloads stay put; counts partial-aggregate map-side.  Keep-first
    uses `min(id)` (deterministic, no ordering shuffle)."""
    c = canonical_url(F.col(url_col)).alias("canonical_url")
    return (
        df.select(c, F.col(id_col).alias("_id"), F.col(url_col).alias("_raw"))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.countDistinct("_raw").cast("bigint").alias("n_raw_forms"),
            F.min("_id").cast("bigint").alias("kept_id"),
        )
    )
