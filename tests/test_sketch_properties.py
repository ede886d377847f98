"""Property-based tests (hypothesis) for the sketch/bitmap bit arithmetic.

The oracle gate already pins Spark == DuckDB on the fixture corpus; these
close the remaining edge — SQL fragment == independent pure-Python model —
on ARBITRARY inputs, by evaluating the dialect-shared fragments in DuckDB
(no Spark session per example; the fragments are the same strings the
Spark side executes via selectExpr)."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from kalytical_spark.operators import bitmaps, sketches

ids = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=80
)


def _py_hll(key: str) -> tuple[int, int]:
    """Independent reference for (bucket, rho): hashlib md5 bits, not
    string slicing — a different decomposition than the SQL fragment."""
    h = int(hashlib.md5(f"u:{key}".encode()).hexdigest(), 16)  # 128 bits
    bucket = h >> 122  # top 6 bits
    tail = h & ((1 << 120) - 1)  # low 120 bits (nibbles 3..32)
    rho = 1
    for i in range(119, -1, -1):
        if tail >> i & 1:
            break
        rho += 1
    else:
        rho = 121
    return bucket, rho


@given(keys=ids)
@settings(max_examples=60, deadline=None)
def test_hll_fragment_matches_bit_model(keys):
    con = duckdb.connect()
    values = ", ".join(f"({k})" for k in set(keys))
    h = "md5('u:' || CAST(user_id AS VARCHAR))"
    rows = con.execute(
        f"""
        SELECT user_id,
               {sketches._hll_bucket_sql(h)} AS bucket,
               {sketches._hll_rho_sql(h)} AS rho
        FROM (VALUES {values}) t(user_id)
        """
    ).fetchall()
    for user_id, bucket, rho in rows:
        eb, er = _py_hll(str(user_id))
        assert (bucket, rho) == (eb, er), user_id
        assert 0 <= bucket < sketches._HLL_M and 1 <= rho <= 121


@given(keys=ids)
@settings(max_examples=60, deadline=None)
def test_kmv_nibble_polynomial_is_hex_value(keys):
    con = duckdb.connect()
    values = ", ".join(f"({k})" for k in set(keys))
    rows = con.execute(
        f"""
        SELECT h, {sketches._kv_int_sql('h')} AS poly
        FROM (SELECT substring(md5('e:' || CAST(k AS VARCHAR)), 1,
                               {sketches._KMV_HEX}) AS h
              FROM (VALUES {values}) t(k))
        """
    ).fetchall()
    assert rows
    for h, poly in rows:
        assert poly == int(h, 16)


@given(keys=ids)
@settings(max_examples=60, deadline=None)
def test_bitmap_words_reconstruct_exact_set(keys):
    """bit_or word masks must reconstruct the exact id set: popcounts sum
    to |set| and the set decoded from (w, mask) equals the input."""
    con = duckdb.connect()
    values = ", ".join(f"({k})" for k in set(keys))
    w = bitmaps._WORD
    rows = con.execute(
        f"""
        SELECT CAST(id // {w} AS INTEGER) AS w,
               bit_or(CAST(1 AS BIGINT) << CAST(id % {w} AS INTEGER)) AS mask,
               bit_count(bit_or(CAST(1 AS BIGINT) << CAST(id % {w} AS INTEGER))) AS n
        FROM (VALUES {values}) t(id)
        GROUP BY 1
        """
    ).fetchall()
    decoded = set()
    for word, mask, n in rows:
        assert mask > 0  # 63-bit words: the sign bit is never used
        assert n == bin(mask).count("1")
        for b in range(w):
            if mask >> b & 1:
                decoded.add(word * w + b)
    assert decoded == set(keys)


def _py_cms_bucket(d: int, key: int) -> int:
    """Independent reference for the count-min bucket: hashlib md5 hex
    parse, not the SQL nibble polynomial."""
    h = hashlib.md5(f"cm{d}:{key}".encode()).hexdigest()
    return int(h[:2], 16)


@given(keys=ids)
@settings(max_examples=60, deadline=None)
def test_cms_bucket_fragment_matches_bit_model(keys):
    """The dialect-shared bucket fragment equals the canonical md5 bit
    model for every (depth, key) on arbitrary inputs, and stays in
    [0, W)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(d INT, user_id BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(d, k) for k in keys for d in range(sketches._CMS_D)],
    )
    h = sketches._cms_hash("d", "user_id", "VARCHAR")
    got = con.execute(
        f"SELECT d, user_id, {sketches._cms_bucket_sql(h)} FROM t"
    ).fetchall()
    assert got
    for d, k, b in got:
        assert 0 <= b < sketches._CMS_W
        assert b == _py_cms_bucket(d, k)


@given(keys=ids)
@settings(max_examples=100, deadline=None)
def test_cms_never_undercounts_and_counters_merge(keys):
    """Design invariants on arbitrary multisets: the min-over-depth
    estimate never undercounts any key, and counter tables merge by
    addition (sketch of a concatenation == sum of the parts' sketches —
    the property the streaming SUM-fold relies on)."""
    from collections import Counter

    def counters(ks):
        c: Counter = Counter()
        for k, n in Counter(ks).items():
            for d in range(sketches._CMS_D):
                c[(d, _py_cms_bucket(d, k))] += n
        return c

    true = Counter(keys)
    tab = counters(keys)
    for k, n in true.items():
        est = min(
            tab[(d, _py_cms_bucket(d, k))] for d in range(sketches._CMS_D)
        )
        assert est >= n
    half = len(keys) // 2
    assert counters(keys[:half]) + counters(keys[half:]) == tab


def test_quantile_decade_histogram_merges_by_sum(spark):
    """The decade-histogram quantile sketch is SUM-mergeable: the sketch of
    a union equals the bin-wise sum of the parts' sketches (the property
    executor partials and streaming folds rely on), and the bin readout
    brackets the exact quantile."""
    from kalytical_spark.operators import quantiles
    from tests.conftest import SF_SMALL

    vals = quantiles._cents(spark, SF_SMALL)
    whole = {
        (r.k, r.d): r.n for r in quantiles._histogram(vals).collect()
    }
    a = quantiles._histogram(vals.filter("v % 2 = 0")).collect()
    b = quantiles._histogram(vals.filter("v % 2 = 1")).collect()
    merged: dict = {}
    for r in [*a, *b]:
        merged[(r.k, r.d)] = merged.get((r.k, r.d), 0) + r.n
    assert merged == whole

    report = quantiles.sketch_quantile_decades(spark, SF_SMALL).collect()
    assert {r.q_milli for r in report} == set(quantiles._QS)
    for r in report:
        assert r.est_lo <= r.exact_cents < r.est_hi
        assert r.exact_in_bin
