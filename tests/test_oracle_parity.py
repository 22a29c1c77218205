"""Every SQL-checkable query must match its DuckDB oracle at sf0.001 —
a fast in-suite replica of the driver's correctness gate (the full sf0.01
sweep lives in tools/oracle_check.py)."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ctx():
    import importlib

    entry = importlib.import_module("__ray_entry__")
    cons = {}
    for sf_dir in (SF_DIR, "/root/testdata/sf0.01"):
        con = cons[sf_dir] = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
    return entry.queries(), entry.oracle_sql(), cons


def _names_with_oracle():
    import importlib

    entry = importlib.import_module("__ray_entry__")
    return sorted(entry.oracle_sql().keys())


@pytest.mark.parametrize("name", _names_with_oracle())
def test_query_matches_oracle(ctx, name):
    from tools.oracle_check import normalize, to_pandas

    queries, oracles, cons = ctx
    # engine-persisted-artifact oracles (crawl output, simhash/minhash
    # values, analysis inputs, the IVF index alias) hardcode their sf0.01
    # cache path (the driver's correctness gate runs at sf0.01) — run
    # those at sf0.01, with the table views bound to sf0.01 too
    sf_dir = ("/root/testdata/sf0.01" if "/tmp/grc_" in oracles[name]
              else SF_DIR)
    got = normalize(to_pandas(queries[name](sf_dir)))
    exp = normalize(cons[sf_dir].sql(oracles[name]).df())
    assert list(got.columns) == list(exp.columns), name
    assert len(got) == len(exp), name
    assert got.equals(exp), f"{name}: value mismatch"
