"""Fellegi-Sunter linkage: values are oracle-proven; these pin the model
properties the hash can't express — every planted twin must classify as a
link, and the estimated weights must point the right way."""

from __future__ import annotations

from kalytical_spark.operators.linkage import (
    _FIELDS,
    PLANT_MOD,
    er_fs_links,
    er_fs_weights,
)
from tests.conftest import SF_SMALL


def test_plants_all_link(spark):
    rows = {r.decision: r for r in er_fs_links(spark, SF_SMALL).collect()}
    n_plants_expected = len(
        [k for k in range(0, 200) if k % PLANT_MOD == 0]
    )  # sf0.001 part table has partkeys 0..199
    assert rows["link"].n_plant_pairs == n_plants_expected
    total_plants = sum(r.n_plant_pairs for r in rows.values())
    assert total_plants == n_plants_expected, "a plant escaped the link class"
    assert rows["nonlink"].n_pairs > 0, "fixture must have evidence-poor pairs"
    assert rows["nonlink"].max_score_micro < rows["link"].min_score_micro


def test_weights_point_the_right_way(spark):
    w = er_fs_weights(spark, SF_SMALL).collect()[0]
    assert w.n_pairs > 0
    for f in _FIELDS:
        assert getattr(w, f"na_{f}") > 0, f"u estimate for {f} must be nonzero"
        assert getattr(w, f"wa_{f}") > 0 > getattr(w, f"wd_{f}")
