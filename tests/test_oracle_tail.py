"""ENFORCED oracle coverage for the driver-gate TAIL (round-4 advice):
the driver's hard correctness gate records only the first 50 ``queries()``
entries, so the 7 rotated past the window would otherwise be covered only
by the best-effort tools/check_oracle.py runs.  This test runs exactly
those tail queries through the same Spark-vs-DuckDB compare (same canon
hash as the tool) on every pytest run, so a regression in a tail query
fails CI even while it sits outside the driver window.

The tail is read from the registry, not hard-coded — rotating the tail
set between rounds automatically rotates the enforcement."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from tools.check_oracle import canon  # noqa: E402

SF = "/root/testdata/sf0.001"
GATE_WINDOW = 50

_TAIL = list(entry.queries())[GATE_WINDOW:]


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_tail_exists_and_every_query_registered_once():
    names = list(entry.queries())
    assert len(names) == len(set(names))
    assert _TAIL, "registry shrank below the gate window"


@pytest.mark.parametrize("name", _TAIL)
def test_tail_query_matches_oracle(spark, duck, name):
    sdf = entry.queries()[name](spark, SF).toPandas()
    sql = entry.oracle_sql().get(name)
    assert sql is not None, f"tail query {name} lost its oracle"
    ddf = duck.execute(sql).fetchdf()
    sn, sc, sh = canon(sdf)
    dn, dc, dh = canon(ddf)
    assert (sn, sc, sh) == (dn, dc, dh), (
        f"{name}: spark(rows={sn},hash={sh}) vs duck(rows={dn},hash={dh})")
    assert sn > 0, f"{name}: zero rows at {SF} — oracle check is vacuous"
