"""Same-code pin-migration audit (VERDICT r8 task 2 -> r9): run the NEW
structural fingerprinter over the UNCHANGED r7 code (commit 27cc58d,
exported with `git archive` to --r7tree) and diff against the current
tests/plan_fingerprints.json. Every difference must map to an intentional
post-r7 plan change; anything else is a regression the r8 pin-format
migration silently absorbed.

The r7 tree predates operators/common.materialize_session_caches (added
with the structural-fingerprint rebuild), so this driver injects a
faithful copy into the loaded r7 module before the fingerprinter runs —
measurement semantics are identical to the current gate (caches
pre-materialized, AQE off, static plan walk).

Usage:
  mkdir -p /tmp/r7tree && git archive 27cc58d | tar -x -C /tmp/r7tree
  python tools/audit_r7_pins.py [--r7tree /tmp/r7tree]

Output: one line per headline query — SAME / DIFF (with the operator
deltas) / N/A (query or twin absent in r7).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

CUR_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    r7 = "/tmp/r7tree"
    if "--r7tree" in sys.argv:
        r7 = sys.argv[sys.argv.index("--r7tree") + 1]
    assert os.path.isdir(os.path.join(r7, "kalytical_spark")), r7

    # the r7 package must win every import in this process
    sys.path.insert(0, r7)
    import kalytical_spark.operators.common as common  # noqa: E402 (r7 copy)

    assert r7 in common.__file__, common.__file__

    if not hasattr(common, "materialize_session_caches"):
        from pyspark.sql import DataFrame

        def materialize_session_caches(spark) -> None:
            def _count(v) -> None:
                if isinstance(v, DataFrame):
                    try:
                        v.count()
                    except Exception:
                        pass
                elif isinstance(v, (tuple, list)):
                    for item in v:
                        _count(item)

            from kalytical_spark import catalog

            for dfs in list(catalog._CACHED_DFS.values()):
                _count(dfs)
            for d in common.SESSION_MEMOS:
                for v in list(d.values()):
                    _count(v)

        common.materialize_session_caches = materialize_session_caches

    # load the CURRENT fingerprinter, bound to the r7 package on sys.path
    spec = importlib.util.spec_from_file_location(
        "pf_new", os.path.join(CUR_REPO, "tools", "plan_fingerprint.py")
    )
    pf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pf)

    with open(os.path.join(CUR_REPO, "tests", "plan_fingerprints.json")) as fh:
        current_pins = json.load(fh)

    from kalytical_spark.session import get_spark  # r7 copy

    spark = get_spark(
        "audit_r7_pins", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    )
    sf = "/root/testdata/sf0.01"

    try:
        heads = pf.headline_queries()
    except Exception as exc:
        print(f"FATAL headline_queries() on r7 registry: {exc}", file=sys.stderr)
        raise
    same = diff = na = 0
    for name, fn in heads.items():
        pin = current_pins.get(name)
        try:
            got = pf.fingerprint(lambda fn=fn: fn(spark, sf), spark)
        except Exception as exc:
            print(f"N/A  {name:32s} (r7 lacks it: {type(exc).__name__}: {str(exc)[:120]})")
            na += 1
            continue
        if got == pin:
            print(f"SAME {name}")
            same += 1
        else:
            deltas = {
                k: (pin.get(k, 0) if pin else 0, got.get(k, 0))
                for k in sorted(set(got) | set(pin or {}))
                if (pin or {}).get(k, 0) != got.get(k, 0)
            }
            print(f"DIFF {name:32s} r9pin-vs-r7code {deltas}")
            diff += 1
    print(f"\n{same} same, {diff} diff, {na} n/a")


if __name__ == "__main__":
    main()
