"""Semantic tests for the training-mix pipeline: every stage drops
something (non-vacuous), stage precedence is respected, quotas bind, and
the split salt decorrelates from the quota hash."""

from __future__ import annotations

from kalytical_spark.operators import curation, mix
from tests.conftest import SF_ORACLE


def test_mix_stages_all_fire(spark):
    rows = mix.pipeline_training_mix(spark, SF_ORACLE).collect()
    buckets = {r.bucket for r in rows}
    assert {"train", "val", "test"} <= buckets, buckets
    assert "dropped_quality" in buckets
    assert "dropped_classifier" in buckets or "dropped_quota" in buckets, (
        "post-curation gates must be non-vacuous"
    )


def test_mix_respects_curation_fates(spark):
    fates = {
        r.doc_id: r.fate
        for r in curation.pipeline_curate_corpus(spark, SF_ORACLE).collect()
    }
    for r in mix.pipeline_training_mix(spark, SF_ORACLE).collect():
        if fates[r.doc_id] != "kept":
            assert r.bucket == fates[r.doc_id], (
                "curation exclusions pass through verbatim"
            )
        else:
            assert r.bucket in {
                "dropped_classifier",
                "dropped_quota",
                "train",
                "val",
                "test",
            }


def test_mix_quota_binds_and_split_not_skewed(spark):
    rows = mix.pipeline_training_mix(spark, SF_ORACLE).collect()
    per_lang: dict[str, int] = {}
    split_counts = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        if r.bucket in split_counts:
            per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
            split_counts[r.bucket] += 1
    assert per_lang
    for lang, n in per_lang.items():
        assert n <= 1.5 * mix._MIX_QUOTA, (lang, n)
    total = sum(split_counts.values())
    # the split hash is salted differently from the quota hash: selected
    # docs must NOT all land in train
    assert 0.6 < split_counts["train"] / total < 0.95
    assert split_counts["val"] > 0 and split_counts["test"] > 0
