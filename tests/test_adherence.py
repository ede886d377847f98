"""Schedule-adherence cogroup audit: the two-sided pandas matcher must
agree with an independent pure-Python recompute from the same expected/
actual frames, and the audit must be non-vacuous (scheduled pipelines
with expected fires; at least some answered)."""

from __future__ import annotations

from collections import defaultdict

from kalytical_spark.operators import adherence
from tests.conftest import SF_ORACLE


def test_adherence_matches_python_model(spark):
    exp = defaultdict(list)
    for r in adherence._expected_fires(spark, SF_ORACLE).collect():
        exp[r.pipeline_uuid].append(r.exp_s)
    act = defaultdict(list)
    for r in adherence._originations(spark, SF_ORACLE).collect():
        act[r.pipeline_uuid].append(r.act_s)
    got = {
        r.pipeline_uuid: (r.n_expected, r.n_hit, r.sum_lateness_s, r.max_lateness_s)
        for r in adherence.dag_schedule_adherence(spark, SF_ORACLE).collect()
    }
    assert set(got) == set(exp), "one audit row per scheduled pipeline"
    total_hits = 0
    for pid, exps in exp.items():
        lats = []
        for e in exps:
            cands = [
                a - e for a in act.get(pid, [])
                if 0 <= a - e < adherence.TOLERANCE_S
            ]
            if cands:
                lats.append(min(cands))
        expect = (
            len(exps),
            len(lats),
            sum(lats) if lats else 0,
            max(lats) if lats else 0,
        )
        assert got[pid] == expect, pid
        total_hits += len(lats)
    assert all(n > 0 for n, _, _, _ in got.values()), "expected fires exist"
    assert total_hits > 0, "audit must be non-vacuous (some fires answered)"
