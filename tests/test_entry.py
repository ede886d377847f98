"""Driver-contract smoke tests: entry() produces rows with a stable schema,
queries()/oracle_sql() keys line up, and every query runs at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.columns == [
        "downstream_uuid",
        "trigger_operator",
        "route",
        "n_trigger_events",
        "n_upstreams_seen",
    ]
    assert df.count() > 0


def test_query_oracle_keys_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # the vast majority of operators must carry a SQL oracle
    assert len(oracles) >= 0.7 * len(qs)


def test_all_queries_run_small(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0, name
