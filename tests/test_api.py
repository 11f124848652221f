"""Ad-hoc SQL surface (api.py): arbitrary ANSI SQL over the registered
tables matches DuckDB running the same statement."""

from __future__ import annotations

import pytest
from conftest import SF_DIR

from flink_stream_processing_refarch_spark import api

# Statements that run verbatim in BOTH engines (ANSI subset).
STATEMENTS = [
    (
        "SELECT n.n_name, count(*) AS n_customers "
        "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n.n_name ORDER BY n_customers DESC, n.n_name LIMIT 5"
    ),
    (
        "SELECT source, count(*) AS n_docs, sum(n_chars) AS chars "
        "FROM documents GROUP BY source ORDER BY source"
    ),
    (
        "SELECT event_type, count(DISTINCT user_id) AS users "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    (
        "SELECT o_orderstatus, sum(o_totalprice) IS NOT NULL AS has_rev, "
        "count(*) AS n FROM orders GROUP BY o_orderstatus "
        "ORDER BY o_orderstatus"
    ),
]


@pytest.mark.parametrize("stmt", STATEMENTS)
def test_adhoc_sql_matches_duckdb(spark, duck, stmt):
    got = [tuple(r) for r in api.sql(spark, SF_DIR, stmt).collect()]
    expect = duck.execute(stmt).fetchall()
    assert got == [tuple(r) for r in expect]


def test_views_refresh_on_each_call(spark):
    df = api.sql(spark, SF_DIR, "SELECT count(*) AS n FROM documents")
    n1 = df.collect()[0]["n"]
    n2 = api.sql(spark, SF_DIR, "SELECT count(*) AS n FROM documents").collect()[
        0
    ]["n"]
    assert n1 == n2 > 0
