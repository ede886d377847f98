"""Tests for scheduling (cron origination), bounded log reads, format
round-trips, and SimHash dedup."""

from __future__ import annotations

import os
import tempfile

from kalytical_spark.operators import scheduling, simhash
from tests.conftest import SF_SMALL


def test_cron_due_originations(spark):
    rows = scheduling.cron_due_originations(spark, SF_SMALL).collect()
    assert rows
    assert all(r.schedule == "0 * * * *" for r in rows)
    assert all(r.due_time.minute == 0 and r.due_time.second == 0 for r in rows)
    assert len({r.exec_uuid for r in rows}) == len(rows)


def test_read_job_logs_caps(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "pod.log")
        with open(path, "w") as f:
            for i in range(2000):
                f.write(f"line-{i:05d} some log output\n")
        tail = scheduling.read_job_logs(spark, path, max_kb=10, tail_lines=999).collect()
        assert 0 < len(tail) <= 999
        assert sum(len(r.line) + 1 for r in tail) <= 10 * 1024
        # newest lines retained, oldest trimmed
        assert tail[-1].line.startswith("line-01999")


def test_roundtrip_formats(spark):
    with tempfile.TemporaryDirectory() as tmp:
        res = {r.format: r.n_rows for r in scheduling.roundtrip_formats(spark, SF_SMALL, tmp).collect()}
    assert res["json"] == res["csv"] == res["orc"]
    assert res["json"] > 0
    assert res["parquet_partitioned"] == 1000


def test_simhash_matches_pure_python(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20).collect()
    got = {
        r.doc_id: r.simhash for r in simhash.doc_simhashes(spark, SF_SMALL).collect()
    }
    for d in docs:
        expect = simhash.simhash64(d.text)
        if expect >= 1 << 63:
            expect -= 1 << 64
        assert got[d.doc_id] == expect


def test_simhash_banding_finds_near_dups(spark):
    """Within Hamming distance 3, at least one of the four 16-bit bands must
    match (pigeonhole) — so the banded candidate set loses no true pair.
    Verify against brute force over the full fingerprint set."""
    fps = {r.doc_id: r.simhash for r in simhash.doc_simhashes(spark, SF_SMALL).collect()}
    ids = sorted(fps)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= simhash.HAMMING_THRESHOLD:
                brute.add((a, b))
    got = {(r.doc_a, r.doc_b) for r in simhash.dedup_simhash(spark, SF_SMALL).collect()}
    assert got == brute
