"""In-repo miniature of the driver gate: a representative subset of
``queries()`` compared against ``oracle_sql()`` via DuckDB at sf0.001."""

import hashlib

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _oracle_names():
    import __ray_entry__ as e
    return sorted(e.oracle_sql())


SUBSET = _oracle_names()


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, duck):
    import __ray_entry__ as e
    res = e.queries()[name](SF_DIR)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    want = duck.execute(e.oracle_sql()[name]).fetchdf()
    assert len(got) == len(want), name
    assert sorted(got.columns) == sorted(want.columns), name
    assert _value_hash(got) == _value_hash(want), name
