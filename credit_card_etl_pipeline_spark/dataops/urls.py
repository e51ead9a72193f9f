"""URL canonicalization for web-crawl dedup.

The first dedup pass of every web-scale training-data pipeline is not
MinHash — it is URL-level: the same page is crawled under dozens of
spellings (host case, default ports, ``www.`` prefixes, tracking
params, param order, fragments, trailing slashes).  Collapsing those
BEFORE content dedup removes the bulk of exact duplicates with a pure
map-side string pass — no shuffle until the final hash groupBy, and
that groupBy is partial-aggregatable.

Everything here is a single JVM-side column expression (regexp /
split / filter / array_sort — whole-stage codegen, no Python), with a
DuckDB twin (:func:`canonical_url_sql`) built from the same policy
constants so engine and oracle cannot drift.

Canonicalization policy (documented, deterministic):

1. scheme and host lowercased;
2. default ports stripped (``:80`` for http, ``:443`` for https —
   only when they match the scheme);
3. leading ``www.`` stripped from the host;
4. fragment dropped;
5. trailing slashes stripped from the path; empty path becomes ``/``;
6. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``), remaining params sorted bytewise and
   rejoined — param ORDER never splits a group.

Scale: the expression is embarrassingly parallel; the groupBy in
:func:`url_dedup_groups` shuffles one (canonical_url, count, min_id)
row per distinct URL after map-side partial aggregation.  At 100 TB
the distinct-URL set is the web's URL space — the aggregation keys
are short strings and AQE handles the skew of hot hosts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query-param prefixes dropped during canonicalization.  ``ref`` is
#: matched as a whole key; ``utm_`` as a key prefix.  Kept as ONE
#: regex alternation so the Spark lambda and the DuckDB twin share it.
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def canonical_url(url_sql: str) -> Column:
    """Canonical form of the URL computed by Spark-SQL fragment
    ``url_sql`` (typically just a column name) per the module policy —
    one nested JVM expression (no UDF, no shuffle)."""
    return F.expr(_spark_canonical_sql(url_sql))


def canonical_host(url_sql: str) -> Column:
    """Canonical host (lowercased, default port and ``www.``
    stripped) of the URL computed by Spark-SQL fragment ``url_sql`` —
    the key for host-level rollups and domain blocklist joins."""
    return F.expr(_spark_host_sql(url_sql))


def canonical_host_sql(u: str) -> str:
    """DuckDB twin of :func:`canonical_host`."""
    return _duck_host_sql(u)


def _spark_host_sql(u: str) -> str:
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    nofrag = f"element_at(split({rest}, '#'), 1)"
    hostport = f"lower(regexp_extract({nofrag}, '^([^/?]*)', 1))"
    return (
        f"regexp_replace(CASE WHEN {scheme} = 'http' "
        f"THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' "
        f"THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END, '^www\\\\.', '')"
    )


def _duck_host_sql(u: str) -> str:
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    nofrag = f"string_split({rest}, '#')[1]"
    hostport = f"lower(regexp_extract({nofrag}, '^([^/?]*)', 1))"
    return (
        f"regexp_replace(CASE WHEN {scheme} = 'http' "
        f"THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {scheme} = 'https' "
        f"THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END, '^www\\.', '')"
    )


def _spark_canonical_sql(u: str) -> str:
    """Spark-SQL expression string computing the canonical URL of the
    expression ``u``.  Structured as nested lets via a chain of
    aliased subexpressions inside one ``concat``."""
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    nofrag = f"element_at(split({rest}, '#'), 1)"
    hostport = f"lower(regexp_extract({nofrag}, '^([^/?]*)', 1))"
    host = _spark_host_sql(u)
    pathq = f"substring({nofrag}, length(regexp_extract({nofrag}, '^([^/?]*)', 1)) + 1)"
    rawpath = f"element_at(split({pathq}, '\\\\?'), 1)"
    path = (
        f"CASE WHEN regexp_replace({rawpath}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({rawpath}, '/+$', '') END"
    )
    qs = (
        f"CASE WHEN instr({pathq}, '?') > 0 "
        f"THEN substring({pathq}, instr({pathq}, '?') + 1) ELSE '' END"
    )
    params = (
        f"filter(split({qs}, '&'), "
        f"x -> x != '' AND NOT x rlike '{TRACKING_PARAM_RE}')"
    )
    qs2 = f"array_join(array_sort({params}), '&')"
    return (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {qs2} = '' THEN '' ELSE concat('?', {qs2}) END)"
    )


def canonical_url_sql(u: str) -> str:
    """DuckDB twin of :func:`canonical_url` over SQL fragment ``u`` —
    same policy constants, list functions instead of HOF lambdas."""
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    nofrag = f"string_split({rest}, '#')[1]"
    hostport = f"lower(regexp_extract({nofrag}, '^([^/?]*)', 1))"
    host = _duck_host_sql(u)
    pathq = f"substr({nofrag}, length({hostport}) + 1)"
    rawpath = f"string_split({pathq}, '?')[1]"
    path = (
        f"CASE WHEN regexp_replace({rawpath}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({rawpath}, '/+$', '') END"
    )
    qs = (
        f"CASE WHEN strpos({pathq}, '?') > 0 "
        f"THEN substr({pathq}, strpos({pathq}, '?') + 1) ELSE '' END"
    )
    params = (
        f"list_filter(string_split({qs}, '&'), "
        f"x -> x != '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))"
    )
    # coalesce: DuckDB's array_to_string yields NULL for an empty
    # filter result, and DuckDB concat SKIPS null args — without the
    # coalesce a query-less URL would grow a bare trailing '?'.
    qs2 = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    # Outer NULL guard for the same concat asymmetry: Spark's concat
    # propagates a NULL url to a NULL canonical; DuckDB's would skip
    # the NULL fragments and emit a junk non-null string.
    return (
        f"CASE WHEN {u} IS NULL THEN NULL ELSE "
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {qs2} = '' THEN '' ELSE concat('?', {qs2}) END) END"
    )


def url_dedup_groups(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse URL spelling variants: one row per canonical URL with
    the copy count and the minimum id as the canonical document.

    Map-side canonicalization + one partial-aggregatable groupBy —
    the only shuffle carries (canonical_url, partial count, partial
    min), already reduced per map task.
    """
    return (
        df.select(
            canonical_url(url_col).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )


def host_blocklist_rollup(
    df: DataFrame,
    blocked_hosts: list[str],
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain filtering + host-level crawl profile: drop documents
    whose canonical host is on the blocklist (broadcast anti-join —
    the real-world blocklist is ~100k domains, far under the
    broadcast threshold), then roll up per surviving host: document
    count and distinct-canonical-URL count.

    Scale shape: host extraction is map-side expression work; the
    anti-join broadcasts the blocklist (never shuffles the corpus);
    the rollup is a partial-aggregatable groupBy on the host (the
    distinct count shuffles (host, canonical_url) pairs once — bounded
    by the crawl's URL space, with hot hosts handled by AQE).
    """
    spark = df.sparkSession
    blocked = spark.createDataFrame(
        [(h,) for h in blocked_hosts], "host string"
    )
    hosts = df.select(
        canonical_host(url_col).alias("host"),
        canonical_url(url_col).alias("canonical_url"),
        F.col(id_col),
    )
    return (
        hosts.join(F.broadcast(blocked), "host", "left_anti")
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("canonical_url").cast("long").alias("n_urls"),
        )
    )
