"""Zone-map skipping: values are oracle-proven; this pins the design claim
the hash can't express — the Morton layout must out-skip the key-range
layout on the two-dimensional workload."""

from __future__ import annotations

from kalytical_spark.operators.zonemap import orders_zonemap_skip_report
from tests.conftest import SF_SMALL


def test_zorder_out_skips_linear(spark):
    rows = {r.layout: r for r in orders_zonemap_skip_report(spark, SF_SMALL).collect()}
    assert set(rows) == {"linear", "zorder"}
    z, lin = rows["zorder"], rows["linear"]
    assert z.skip_rate_milli > lin.skip_rate_milli
    # Morton must skip on BOTH predicate dimensions
    assert z.n_skip_cust > 0 and z.n_skip_date > 0
    for r in rows.values():
        assert r.n_pairs == r.n_files * 64  # 8 x 8 predicate workload
        assert 0 <= r.n_skipped <= r.n_pairs
