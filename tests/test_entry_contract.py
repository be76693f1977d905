"""Driver-contract consistency: every queries() key has a DuckDB twin
in oracle_sql() (the round gate records a weaker rows-only check for
any missing key — this repo's contract is 100% full-hash coverage),
and the twin SQL at least parses in DuckDB against empty tables."""

import duckdb

import __spark_entry__ as E


def test_every_query_has_oracle():
    q = set(E.queries().keys())
    o = set(E.oracle_sql().keys())
    assert q == o, f"missing twins: {q - o}; orphan twins: {o - q}"


def test_oracle_sql_parses():
    con = duckdb.connect()
    ddl = {
        "documents": ("doc_id BIGINT, text VARCHAR, lang VARCHAR, "
                      "source VARCHAR, n_chars BIGINT"),
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INTEGER",
        "events": ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                   "event_type VARCHAR, value DOUBLE, props VARCHAR"),
        "lineitem": ("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey "
                     "BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, "
                     "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax "
                     "DOUBLE, l_returnflag VARCHAR, l_linestatus "
                     "VARCHAR, l_shipdate TIMESTAMP"),
        "orders": ("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus "
                   "VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
                   "o_orderpriority VARCHAR"),
        "customer": ("c_custkey BIGINT, c_name VARCHAR, c_nationkey "
                     "INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR"),
        "part": ("p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, "
                 "p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE"),
        "supplier": ("s_suppkey BIGINT, s_name VARCHAR, s_nationkey "
                     "INTEGER, s_acctbal DOUBLE"),
        "nation": ("n_nationkey INTEGER, n_name VARCHAR, n_regionkey "
                   "INTEGER"),
        "region": "r_regionkey INTEGER, r_name VARCHAR",
    }
    for name, cols in ddl.items():
        con.execute(f"CREATE TABLE {name} ({cols})")
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"oracle twin {name!r} failed: {exc}")
