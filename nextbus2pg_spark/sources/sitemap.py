"""sitemaps.org protocol parsing — crawl-frontier seeding.

A polite crawl discovers most of a site's URLs not by link-walking but
from the sitemaps its robots.txt advertises (``Sitemap:`` lines are
group-independent per RFC 9309 §2.3 "other records" / sitemaps.org):
robots → sitemap URLs → fetch → ``<urlset>`` page entries (or
``<sitemapindex>`` indirection, one more hop). Together with
``sources/robots.py`` (permission) and ``sources/cdx.py`` (what the
archive already holds) this completes the frontier-construction seam.

Everything is JVM-side: the robots line scan is the same
posexplode/regexp pass ``robots_rules`` uses, and the XML parse is
Spark's native ``from_xml`` (repeated child elements map to arrays —
no Python, no external XML lib). Malformed XML yields NULL arrays
(from_xml's contract) and therefore zero entries — quarantine by
emptiness, never a crashed scan.

Parity citation: the reference has no crawl surface (single XML feed,
reference README); extension surface for the crawl-ingestion seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Both sitemap document shapes in one schema: ``<urlset>`` carries
#: repeated ``<url>`` children, ``<sitemapindex>`` repeated
#: ``<sitemap>`` children; whichever the document is, the other array
#: parses NULL.
SITEMAP_XML_SCHEMA = (
    "url array<struct<loc string, lastmod string>>, "
    "sitemap array<struct<loc string, lastmod string>>"
)


def robots_sitemaps(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Extract advertised sitemap URLs from per-domain robots.txt →
    ``(domain, sitemap_url)``, one row per ``Sitemap:`` line.

    Sitemap records are group-INDEPENDENT (they apply regardless of
    user-agent groups and may appear anywhere in the file), so this is
    a flat line scan: split, strip comments, keep ``sitemap:`` keys
    case-insensitively, take everything after the FIRST colon (the
    value is an absolute URL and contains colons itself)."""
    lines = robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    )
    cleaned = lines.select(
        "domain",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    return (
        cleaned.where(F.lower("line").rlike(r"^sitemap\s*:"))
        .select(
            "domain",
            F.trim(
                F.regexp_extract("line", r"(?i)^sitemap\s*:(.*)$", 1)
            ).alias("sitemap_url"),
        )
        .where(F.col("sitemap_url") != "")
    )


def sitemap_entries(
    df: DataFrame, xml_col: str = "xml", keep_cols: "list[str] | None" = None
) -> DataFrame:
    """Parse sitemap XML documents → one row per entry:
    ``(*keep_cols, kind, loc, lastmod)`` where ``kind`` is ``url``
    (a page, from ``<urlset>``) or ``sitemap`` (one more hop, from
    ``<sitemapindex>``). Feed ``sitemap``-kind locs back through a
    fetch + this function to flatten an index — the indirection is
    one level by spec.

    Malformed documents parse to NULL arrays and contribute zero
    rows."""
    keep = list(keep_cols or [])
    parsed = df.select(
        *keep, F.from_xml(F.col(xml_col), SITEMAP_XML_SCHEMA).alias("__p")
    )

    def rows(field: str, kind: str) -> DataFrame:
        return parsed.select(
            *keep,
            F.lit(kind).alias("kind"),
            F.explode(F.col(f"__p.{field}")).alias("__e"),
        ).select(
            *keep,
            "kind",
            F.col("__e.loc").alias("loc"),
            F.col("__e.lastmod").alias("lastmod"),
        )

    return rows("url", "url").unionByName(rows("sitemap", "sitemap"))
