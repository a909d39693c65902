"""URL / domain filtering operators for web-corpus curation.

Large-scale training pipelines (C4, RefinedWeb, FineWeb) gate documents on
their source URL before any content-level filter runs: extract the host
from the URL, normalize it, and drop documents whose domain appears on a
blocklist (UT1-style adult/tracker lists, licence blocklists) or exceeds a
per-domain document cap. The reference warehouse has no web tier, so this
module is part of the beyond-reference LLM-ops surface.

Scale shape: the blocklist is tiny next to the corpus (UT1 is ~4M domains,
a few hundred MB — far under the broadcast threshold on a real cluster),
so the gate is a broadcast anti-join against the scanned corpus: one pass,
no shuffle of the big side. Domain extraction is a JVM-side regex
(`regexp_extract`), never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: host capture out of scheme://host/path — anchored, JVM regex.
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"

def domain_of(url: Column | str) -> Column:
    """Lower-cased host extracted from a URL column (empty if malformed)."""
    col = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(col, _HOST_RE, 1))

def registrable_domain(host: Column | str) -> Column:
    """eTLD+1-ish suffix of a host: its last two dot-labels.

    A real pipeline consults the Public Suffix List; the two-label fallback
    is the standard approximation when the PSL is unavailable and is what
    the blocklist join keys on (blocklists publish registrable domains).
    """
    col = F.col(host) if isinstance(host, str) else host
    parts = F.split(col, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, col).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )

def blocklist_mark(
    df: DataFrame, domain_col: str, blocked: DataFrame, flag: str = "blocked"
) -> DataFrame:
    """Mark rows whose domain appears in ``blocked`` (column ``domain``).

    Broadcast left join + flag, so one pass yields both the keep and the
    audit (drop-rate accounting) sides; callers that only need survivors
    filter on the flag, which Catalyst rewrites to the same broadcast hash
    join. ``blocked`` must be the small side — at 100 TB the corpus never
    shuffles.
    """
    marked = blocked.select(
        F.col("domain").alias("__bl_domain"), F.lit(True).alias(flag)
    )
    out = df.join(
        F.broadcast(marked), df[domain_col] == marked["__bl_domain"], "left"
    )
    return out.drop("__bl_domain").withColumn(flag, F.coalesce(F.col(flag), F.lit(False)))

def blocklist_filter(df: DataFrame, domain_col: str, blocked: DataFrame) -> DataFrame:
    """Drop rows whose domain appears in ``blocked`` (broadcast anti-join)."""
    return df.join(
        F.broadcast(blocked.select(F.col("domain"))),
        df[domain_col] == F.col("domain"),
        "left_anti",
    )

def domain_cap(df: DataFrame, domain_col: str, order_col: str, cap: int) -> DataFrame:
    """Keep at most ``cap`` rows per domain, by a deterministic order.

    The per-domain frequency cap (C4's heuristic against SEO farms): one
    window shuffle keyed on the domain; the order column makes the sample
    reproducible (pipelines use a content hash, not ingest order).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(order_col)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )
