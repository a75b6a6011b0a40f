"""HttpFetcher (the production-shaped S3 implementation) with an injected
deterministic transport — full crawl semantics without a network:

  2xx -> page row, extracted, vertex;  404 -> terminal miss (seen, no
  vertex, never re-attempted);  503 -> transient, re-queued every round
  (never seen, never a vertex, still in the frontier at max_rounds).
"""

from fs_crawler_spark.functions.urls import canonicalize_url  # noqa: F401
from fs_crawler_spark.plans.crawl import (
    CrawlConfig,
    load_frontier,
    read_output,
    run_crawl,
)
from fs_crawler_spark.sources.corpus import build_pages, doc_url
from fs_crawler_spark.sources.http_fetcher import HttpFetcher

N_DOCS = 40


def _doc_index(url: str) -> int:
    return int(url.rsplit("/", 1)[1])


def _status_of(i: int) -> int:
    if i % 5 == 3:
        return 404  # terminal miss
    if i % 5 == 1:
        return 503  # transient, forever (deterministic across re-attempts)
    return 200


def _children(i: int) -> list[int]:
    return [c for c in (2 * i + 1, 2 * i + 2) if c < N_DOCS]


def fake_transport(url: str):
    """Module-level (picklable) deterministic transport."""
    i = _doc_index(url)
    status = _status_of(i)
    if status != 200:
        return status, ""
    links = "".join(f'<a href="{doc_url(c)}">c</a>' for c in _children(i))
    return 200, f"<html><p>text {i}</p>{links}</html>"


def _expected():
    """Pure-python oracle of the crawl over fake_transport."""
    fetched, missed, stuck = set(), set(), set()
    frontier = {0}
    seen_attempted = set()
    while frontier:
        nxt = set()
        for i in frontier:
            s = _status_of(i)
            if s == 200:
                fetched.add(i)
                for c in _children(i):
                    if c not in seen_attempted and c not in stuck:
                        nxt.add(c)
            elif s == 404:
                missed.add(i)
            else:
                stuck.add(i)  # re-queued forever, children never discovered
            if s != 503:
                seen_attempted.add(i)
        nxt -= seen_attempted | stuck
        frontier = nxt
    return fetched, missed, stuck


def test_http_fetcher_full_semantics(spark, sf_dir, tmp_path):
    # fake_transport is module-level (pickled by reference as
    # test_http_fetcher.fake_transport) — ship this file so executors can
    # import it; exactly what a production transport module does via
    # spark-submit --py-files.
    spark.sparkContext.addPyFile(__file__)
    pages_unused = build_pages(spark, sf_dir, limit_docs=1)  # seam ignores it
    ck = str(tmp_path / "ck")
    fetcher = HttpFetcher(transport=fake_transport)
    res = run_crawl(
        spark,
        pages_unused,
        seeds=[doc_url(0)],
        checkpoint_dir=ck,
        cfg=CrawlConfig(max_rounds=10),
        fetcher=fetcher,
    )
    exp_fetched, exp_missed, exp_stuck = _expected()

    vertex_ids = {_doc_index(r["id"]) for r in read_output(spark, ck, "vertices").collect()}
    assert vertex_ids == exp_fetched

    seen = {_doc_index(r["url"]) for r in read_output(spark, ck, "seen").collect()}
    assert seen == exp_fetched | exp_missed  # 503s never enter seen

    frontier = {_doc_index(r["url"]) for r in load_frontier(spark, ck).collect()}
    assert frontier == exp_stuck  # transient urls still queued at the cap
    assert res["rounds"] == 10  # never exhausts while transients remain

    # extraction parity: link edges only come from 2xx pages
    edges = read_output(spark, ck, "edges").collect()
    got_edges = {(_doc_index(r["source"]), _doc_index(r["destination"])) for r in edges}
    want_edges = {(i, c) for i in exp_fetched for c in _children(i)}
    assert got_edges == want_edges


def test_http_fetcher_transport_error_is_transient(spark, sf_dir, tmp_path):
    """urllib_transport maps network-level failures to 503 — in a sandbox
    with no DNS every url is transient: nothing fetched, nothing seen,
    everything re-queued."""
    from fs_crawler_spark.sources.http_fetcher import urllib_transport

    pages_unused = build_pages(spark, sf_dir, limit_docs=1)
    ck = str(tmp_path / "ck")
    fetcher = HttpFetcher(transport=urllib_transport(timeout=1.0))
    res = run_crawl(
        spark,
        pages_unused,
        seeds=[doc_url(0)],
        checkpoint_dir=ck,
        cfg=CrawlConfig(max_rounds=2),
        fetcher=fetcher,
    )
    assert res["total_fetched"] == 0
    assert read_output(spark, ck, "vertices").count() == 0
    assert {r["url"] for r in load_frontier(spark, ck).collect()} == {doc_url(0)}
