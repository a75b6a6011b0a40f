"""Oracle-hygiene regression guard (round-3 rule, commit d7f43f0): DuckDB's
sum() over integers — plain or windowed — returns HUGEINT (int128), which a
pandas fetch renders as float64 ("11.0" vs Spark's bigint "11") and silently
breaks the driver's canonical value-hash even when the values are identical
(the round-2 events_sessions failure). Every oracle's FINAL result set must
therefore carry explicit BIGINT casts on integer aggregates.

Rather than parsing SQL, this binds every oracle against the real table
schemas with DuckDB's lazy relation API (no execution) and asserts no result
column has a 128-bit integer type — the exact condition the rule exists to
prevent, robust to however the query is written."""

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

FORBIDDEN = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_query_has_an_oracle_or_is_documented(con):
    """Each queries() entry should ship an oracle (non-SQL-expressible ops are
    the documented exception and the driver records a weaker rows-only check)."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert missing == set(), f"queries without oracles: {sorted(missing)}"


def test_no_oracle_returns_int128(con):
    bad = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)  # lazy: binder resolves names + types, no execution
        offenders = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, map(str, rel.types))
            if str(t).upper() in FORBIDDEN
        ]
        if offenders:
            bad[name] = offenders
    assert bad == {}, (
        "uncast integer aggregates (HUGEINT reaches the driver as float64 and "
        f"breaks the value-hash): {bad}"
    )


def test_oracles_bind_against_real_schemas(con):
    """Every oracle must at least BIND against the shipped table schemas —
    catches renamed columns / typos without paying for execution."""
    errors = {}
    for name, sql in entry.oracle_sql().items():
        try:
            con.sql(sql)
        except Exception as e:  # noqa: BLE001
            errors[name] = str(e)[:200]
    assert errors == {}
