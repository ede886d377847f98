"""Semantic tests for the audio-shaped multimodal operators: window
fan-out arithmetic, energy bounds, and silence-run reconstruction. The
byte-exact cross-engine proof is the oracle gate; these pin the numpy
window math against an independent pure-Python recomputation on a sample."""

from __future__ import annotations

from kalytical_spark.operators import audio
from tests.conftest import SF_SMALL


def test_window_energy_matches_python(spark):
    rows = audio.mm_audio_window_energy(spark, SF_SMALL).collect()
    assert rows
    docs = {
        r.doc_id: bytes(r.payload)
        for r in audio._payloads(spark, SF_SMALL).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    checked = 0
    for doc_id, wins in sorted(by_doc.items())[:25]:
        data = docs[doc_id]
        n = len(data)
        assert len(wins) == (n + audio._WINDOW - 1) // audio._WINDOW
        for w in sorted(wins, key=lambda x: x.win_idx):
            seg = data[w.win_idx * audio._WINDOW : (w.win_idx + 1) * audio._WINDOW]
            assert w.n_samples == len(seg)
            assert w.energy == sum(b * b for b in seg)
            assert w.peak == max(seg)
            checked += 1
    assert checked > 25


def test_silence_runs_match_python(spark):
    rows = audio.mm_audio_silence_segments(spark, SF_SMALL).collect()
    assert rows
    docs = {
        r.doc_id: bytes(r.payload)
        for r in audio._payloads(spark, SF_SMALL).collect()
    }
    assert len(rows) == len(docs), "one row per asset, silent-free included"
    for r in rows[:50]:
        data = docs[r.doc_id]
        runs: list[int] = []
        cur = 0
        for b in data:
            if b < audio._SILENCE_THRESHOLD:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        assert r.n_samples == len(data)
        assert r.n_silence_runs == len(runs)
        assert r.longest_run == (max(runs) if runs else 0)
        assert r.silence_samples == sum(runs)
