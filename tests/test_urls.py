from pyspark.sql import functions as F

from fs_crawler_spark.functions.urls import canonicalize_url, url_hash, url_host

CASES = [
    ("https://Example.COM/Path#frag", "https://example.com/Path"),
    ("  http://example.com:80/a/  ", "http://example.com/a"),
    ("https://example.com:443", "https://example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("HTTPS://HUB.example.com/doc/5", "https://hub.example.com/doc/5"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a?q=UP#x", "https://example.com/a?q=UP"),
]


def test_canonicalize(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [want for _, want in CASES]


def test_host_and_hash(spark):
    df = spark.createDataFrame(
        [("https://User@Example.com:8080/a",), ("https://hub.example.com/doc/1",)],
        "url string",
    )
    hosts = [r[0] for r in df.select(url_host(F.col("url"))).collect()]
    assert hosts == ["example.com", "hub.example.com"]
    # hash is deterministic and keyed on the exact string
    h = df.select(url_hash(canonicalize_url(F.col("url"))).alias("h")).collect()
    h2 = df.select(url_hash(canonicalize_url(F.col("url"))).alias("h")).collect()
    assert [r["h"] for r in h] == [r["h"] for r in h2]
    assert len({r["h"] for r in h}) == 2
