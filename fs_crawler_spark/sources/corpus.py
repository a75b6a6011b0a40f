"""Deterministic synthetic `pages` corpus.

The reference crawls a live HTTP API (fsapi.py:136-137); this engine crawls an
Iceberg/parquet table of Common-Crawl-style pages (BASELINE.json input_hint).
For tests and benchmarks the corpus is derived 1:1 from the driver-provided
``documents.parquet`` table with a **pure-arithmetic outlink DAG**, so an
independent DuckDB recursive-CTE oracle can recompute the exact BFS answer
(url -> iteration) from the same table. No external data, fixed rules:

With N = row count and d = doc_id (contiguous 0..N-1):
  host(d)  = 'hub.example.com'            if d % 3 == 0   (skewed hot host)
           = 'src{d % 7}.example.com'     otherwise
  url(d)   = 'https://' + host(d) + '/doc/' + d
  children(d) = [2d+1 if < N,  2d+2 if < N,  (7d+3) % N if != d]
                 (binary-tree BFS layers + a cross link that creates the
                  dedup/cycle cases the seen-set anti-join must handle)
  text(d)  = documents.text  (the byte-identical extraction target)
  html(d)  = '<html><head><title>doc {d}</title></head><body><p>{text}</p>'
             + '<a href="{child_url}">link</a>' per child + '</body></html>'
  warc_ts  = 2025-01-01T00:00:00Z + d seconds;  lang = documents.lang

The hub host holds ~N/3 of all URLs — the familysearch.org-scale skew analog
demanded by BASELINE.json north_star; the politeness window + salting operators
are exercised against it.

Everything below is built-in Column expressions — corpus synthesis itself is
JVM-side and scales to any N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2025-01-01 00:00:00"
HUB_HOST = "hub.example.com"


def _host_expr(d, n_hosts: int = 7):
    return F.when(d % 3 == 0, F.lit(HUB_HOST)).otherwise(
        F.concat(F.lit("src"), (d % n_hosts).cast("string"), F.lit(".example.com"))
    )


def _url_expr(d, n_hosts: int = 7):
    return F.concat(
        F.lit("https://"), _host_expr(d, n_hosts), F.lit("/doc/"), d.cast("string")
    )


def doc_url(doc_id: int, n_hosts: int = 7) -> str:
    """Driver-side mirror of ``_url_expr`` (for seed lists / assertions)."""
    host = HUB_HOST if doc_id % 3 == 0 else f"src{doc_id % n_hosts}.example.com"
    return f"https://{host}/doc/{doc_id}"


def build_pages(
    spark: SparkSession,
    sf_dir: str,
    limit_docs: int | None = None,
    multiplier: int = 1,
    n_hosts: int = 7,
) -> DataFrame:
    """documents.parquet -> pages DataFrame (schemas.PAGES).

    ``limit_docs`` keeps only doc_id < limit and shrinks the link universe to
    match (n := limit), producing a smaller self-consistent corpus for fast
    golden tests. ``multiplier`` scales the universe UP (n := multiplier x
    base): doc i reuses the text of base doc i % base — deterministic, pure
    arithmetic, used by the bench to measure the crawl in the data-bound
    regime instead of the scheduling-bound tiny-SF regime. Default: the table
    as-is.

    ``n_hosts`` widens the non-hub host universe (src0..src{n-1}); the
    DEFAULT (7) is the pinned rule every DuckDB oracle reconstructs — only
    the scaling bench overrides it (8 total hosts caps the per-host
    politeness window at 8 tasks, a synthetic-corpus artifact: real web
    frontiers have 10^6+ hosts). Seeds must use ``doc_url(i, n_hosts)``.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if limit_docs is not None:
        docs = docs.filter(F.col("doc_id") < limit_docs)
    if multiplier > 1:
        n_base = docs.count()
        ids = spark.range(n_base * multiplier).select(F.col("id").alias("vid"))
        docs = (
            ids.join(
                F.broadcast(
                    docs.select(F.col("doc_id").alias("base_id"), "text", "lang")
                ),
                F.pmod(F.col("vid"), F.lit(n_base)) == F.col("base_id"),
            )
            .select(F.col("vid").alias("doc_id"), "text", "lang")
        )
    n = docs.count()
    d = F.col("doc_id")
    children = F.array(
        F.when(d * 2 + 1 < n, _url_expr(d * 2 + 1, n_hosts)),
        F.when(d * 2 + 2 < n, _url_expr(d * 2 + 2, n_hosts)),
        F.when((d * 7 + 3) % n != d, _url_expr((d * 7 + 3) % n, n_hosts)),
    )
    links = F.filter(children, lambda x: x.isNotNull())
    anchors = F.concat_ws(
        "", F.transform(links, lambda x: F.concat(F.lit('<a href="'), x, F.lit('">link</a>')))
    )
    html = F.concat(
        F.lit("<html><head><title>doc "),
        d.cast("string"),
        F.lit("</title></head><body><p>"),
        F.col("text"),
        F.lit("</p>"),
        anchors,
        F.lit("</body></html>"),
    )
    return docs.select(
        _url_expr(d, n_hosts).alias("url"),
        (F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=d.cast("decimal(18,6)"))).alias(
            "warc_ts"
        ),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def build_persons_pages(
    spark: SparkSession, sf_dir: str, limit_docs: int | None = None
) -> DataFrame:
    """Genealogy-parity corpus: each page is a person record in the reference's
    shape (fsapi.py:146-161 persons JSON -> Individual + childAndParents +
    Couple rels), embedded as a JSON blob in the html.

    Deterministic rules (d = doc_id, N = corpus size; DuckDB oracles in
    __spark_entry__ reproduce them verbatim):
      color(d)    = -1 if d%5<2 else (1 if d%5<4 else 0)   # Gender enum; the
                    class boundaries make CONSECUTIVE ids share a gender for
                    d%5 in {0,2}, so sibling parents (2d+1, 2d+2) exercise
                    both A4 outcomes (same-gender pair -> Resolve)
      surname     = 'S' || d%50 ;  given = 'G' || d%97
      lifespan(d) = d%4: 0->'Living', 1->'{1800+d%200}-{1880+d%99}',
                         2->'-{1800+d%100}', 3->''
      parents(d)  = 2d+1, 2d+2 (< N) — child->parent edges
      rel ids     = shared 'R{d}s' for both parents when d%5==0 (one
                    childAndParents rel), else per-parent 'R{d}a'/'R{d}b'
                    (exercises both AssumedBiological and Resolve paths of A4)
      couple(d)   = (7d+3)%N if != d — frontier-only (F6, no edge)
    The traversal link set (parents ∪ couple) equals the web corpus's link
    rule, so BFS iterations are identical across modes.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if limit_docs is not None:
        docs = docs.filter(F.col("doc_id") < limit_docs)
    n = docs.count()
    d = F.col("doc_id")
    color = (
        F.when(d % 5 < 2, -1).when(d % 5 < 4, 1).otherwise(0).cast("int")
    )
    lifespan = (
        F.when(d % 4 == 0, F.lit("Living"))
        .when(
            d % 4 == 1,
            F.concat(
                (1800 + d % 200).cast("string"), F.lit("-"), (1880 + d % 99).cast("string")
            ),
        )
        .when(d % 4 == 2, F.concat(F.lit("-"), (1800 + d % 100).cast("string")))
        .otherwise(F.lit(""))
    )
    shared = d % 5 == 0
    rel_a = F.when(shared, F.concat(F.lit("R"), d.cast("string"), F.lit("s"))).otherwise(
        F.concat(F.lit("R"), d.cast("string"), F.lit("a"))
    )
    rel_b = F.when(shared, F.concat(F.lit("R"), d.cast("string"), F.lit("s"))).otherwise(
        F.concat(F.lit("R"), d.cast("string"), F.lit("b"))
    )
    parents = F.filter(
        F.array(
            F.when(d * 2 + 1 < n, F.struct(_url_expr(d * 2 + 1).alias("url"), rel_a.alias("rel_id"))),
            F.when(d * 2 + 2 < n, F.struct(_url_expr(d * 2 + 2).alias("url"), rel_b.alias("rel_id"))),
        ),
        lambda x: x.isNotNull(),
    )
    couples = F.filter(
        F.array(F.when((d * 7 + 3) % n != d, _url_expr((d * 7 + 3) % n))),
        lambda x: x.isNotNull(),
    )
    payload = F.to_json(
        F.struct(
            color.alias("color"),
            F.concat(F.lit("S"), (d % 50).cast("string")).alias("surname"),
            F.concat(F.lit("G"), (d % 97).cast("string")).alias("given"),
            lifespan.alias("lifespan"),
            parents.alias("parents"),
            couples.alias("couples"),
        )
    )
    html = F.concat(
        F.lit("<html><head><title>person "),
        d.cast("string"),
        F.lit("</title></head><body><p>"),
        F.col("text"),
        F.lit('</p><script type="application/json">'),
        payload,
        F.lit("</script></body></html>"),
    )
    return docs.select(
        _url_expr(d).alias("url"),
        (F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(secs=d.cast("decimal(18,6)"))).alias(
            "warc_ts"
        ),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


GEDCOMX_FACT_TYPES = (
    "AdoptiveParent",
    "BiologicalParent",
    "FosterParent",
    "GuardianParent",
    "StepParent",
    "SociologicalParent",
    "SurrogateParent",
)


def build_relationship_facts(
    spark: SparkSession, sf_dir: str, limit_docs: int | None = None
) -> DataFrame:
    """The S2 analog: the relationship-fact corpus a Resolve-flagged rel id is
    "fetched" against (reference: GET child-and-parents-relationships/{id},
    fsapi.py:99-100, typed from facts by P5 fsapi.py:88-97).

    Deterministic: rel 'R{d}a'/'R{d}b'/'R{d}s' of child d carries fact type
    GEDCOMX_FACT_TYPES[(d + k) % 7] with k = 0/1/2 for a/b/s.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if limit_docs is not None:
        docs = docs.filter(F.col("doc_id") < limit_docs)
    d = F.col("doc_id")
    fact = F.array(*[F.lit(t) for t in GEDCOMX_FACT_TYPES])

    def rel(suffix: str, k: int):
        return F.struct(
            F.concat(F.lit("R"), d.cast("string"), F.lit(suffix)).alias("id"),
            fact.getItem((d + k) % 7).alias("fact_type"),
        )

    return (
        docs.select(F.explode(F.array(rel("a", 0), rel("b", 1), rel("s", 2))).alias("r"))
        .select(F.col("r.id").alias("id"), F.col("r.fact_type").alias("fact_type"))
    )


def oracle_edges_sql(max_n: str = "(SELECT count(*) FROM documents)") -> str:
    """DuckDB CTE body reconstructing the same outlink edges from documents.

    Returned string defines CTEs ``params(n)`` and ``links(src, dst)`` over the
    pre-registered ``documents`` view; callers append their own SELECT.
    """
    return f"""
params AS (SELECT {max_n} AS n),
links AS (
    SELECT doc_id AS src, doc_id * 2 + 1 AS dst FROM documents, params WHERE doc_id * 2 + 1 < n
    UNION ALL
    SELECT doc_id, doc_id * 2 + 2 FROM documents, params WHERE doc_id * 2 + 2 < n
    UNION ALL
    SELECT doc_id, (doc_id * 7 + 3) % n FROM documents, params WHERE (doc_id * 7 + 3) % n != doc_id
),
urls AS (
    SELECT doc_id AS d,
           'https://' || CASE WHEN doc_id % 3 = 0 THEN 'hub.example.com'
                              ELSE 'src' || (doc_id % 7) || '.example.com' END
                      || '/doc/' || doc_id AS url
    FROM documents
)"""
