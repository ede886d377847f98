"""Bradley-Terry fit invariants: match accounting, normalization, and
agreement between the distributed win-matrix mining and a direct pandas
recompute."""

from __future__ import annotations

from kalytical_spark.operators import preference
from kalytical_spark.operators.common import t
from tests.conftest import SF_ORACLE


def test_bt_accounting_and_normalization(spark):
    rows = preference.users_bradley_terry(spark, SF_ORACLE).collect()
    assert rows
    k = len(rows)
    # every match produced exactly one win: totals are two-sided
    assert sum(r.wins for r in rows) * 2 == sum(r.matches for r in rows)
    for r in rows:
        assert 0 <= r.wins <= r.matches
        assert r.strength_micro >= 1
    # per-round renormalization keeps the total at K x 1e6 (floor slack)
    tot = sum(r.strength_micro for r in rows)
    assert k * 1_000_000 - k <= tot <= k * 1_000_000
    # rank is the strength order with the documented tie-break
    ranked = sorted(rows, key=lambda r: (-r.strength_micro, r.event_type))
    assert [r.rank for r in ranked] == list(range(1, k + 1))


def test_bt_win_matrix_matches_pandas(spark):
    got = {
        (r.ta, r.tb): (r.w_a, r.w_b)
        for r in preference._win_matrix(spark, SF_ORACLE).collect()
    }
    ev = (
        t(spark, SF_ORACLE, "events_ms")
        .select("user_id", "event_type")
        .toPandas()
    )
    counts = ev.groupby(["user_id", "event_type"]).size()
    expect: dict = {}
    by_user: dict = {}
    for (user, et), n in counts.items():
        by_user.setdefault(user, {})[et] = int(n)
    for per in by_user.values():
        ets = sorted(per)
        for i, ta in enumerate(ets):
            for tb in ets[i + 1 :]:
                wa, wb = expect.get((ta, tb), (0, 0))
                if per[ta] > per[tb]:
                    wa += 1
                elif per[tb] > per[ta]:
                    wb += 1
                expect[(ta, tb)] = (wa, wb)
    expect = {k: v for k, v in expect.items() if v != (0, 0) or k in got}
    # the distributed mining must agree pair-for-pair
    for key, v in expect.items():
        assert got.get(key, (0, 0)) == v, key
