"""Byte-identical text extraction — the input_hint per-row invariant."""

from pyspark.sql import functions as F

from fs_crawler_spark.functions.extract import extract_pages
from fs_crawler_spark.sources.corpus import build_pages, doc_url


def test_pages_schema_and_urls(spark, sf_dir):
    pages = build_pages(spark, sf_dir)
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    n = pages.count()
    assert n == 500
    first = pages.filter(F.col("url") == doc_url(0)).collect()
    assert len(first) == 1


def test_text_extraction_byte_identical(spark, sf_dir):
    pages = build_pages(spark, sf_dir)
    extracted = extract_pages(pages)
    mismatch = (
        extracted.alias("e")
        .join(pages.alias("p"), on="url")
        .filter(
            (F.col("e.text") != F.col("p.text"))
            | F.col("e.text").isNull()
        )
        .count()
    )
    assert mismatch == 0
    assert extracted.count() == pages.count()


def test_links_match_arithmetic_rule(spark, sf_dir):
    pages = build_pages(spark, sf_dir)
    n = pages.count()
    got = {
        r["url"]: sorted(r["links"])
        for r in extract_pages(pages).collect()
    }

    def children(d):
        out = []
        if 2 * d + 1 < n:
            out.append(doc_url(2 * d + 1))
        if 2 * d + 2 < n:
            out.append(doc_url(2 * d + 2))
        if (7 * d + 3) % n != d:
            out.append(doc_url((7 * d + 3) % n))
        return sorted(out)

    for d in (0, 1, 7, 249, 250, 499):
        assert got[doc_url(d)] == children(d), f"doc {d}"
