"""Cross-round bench regression report: compare the freshest per-query
timings (BENCH_FULL.json) against the newest prior BENCH_r*.json and flag
material changes, so regressions surface as a list instead of a manual
scan of 280 numbers.

THE COMMITTED REGRESSION SIGNAL (VERDICT r7 task 8 — BENCH_NOTES.md's
four-run variance study measured +/-25% whole-suite wall noise on
UNCHANGED code, so a raw cross-round ratio is not evidence):

1. Per-query warm MEDIANS are the only numbers compared (bench.py's
   median-of-3; single-run times and suite totals are narrative only).
2. The plan-fingerprint gate (tests/test_plan_fingerprints.py) rules a
   plan change in or out independently of wall time.
3. A query whose warm median moved >= CANDIDATE_RATIO (1.5x, with an
   absolute floor) is only a CANDIDATE. Before it may be called a
   regression it is RE-MEASURED IN AN ISOLATED JVM (a fresh subprocess
   running bench.py focused on that query): suite-order effects — cache
   pressure from 200 earlier queries, a G1 pause, worker-fleet churn —
   do not follow it there.
4. Verdicts: CONFIRMED (isolated median still >= 1.5x old), or
   SUITE-NOISE (isolated median back under the bar). Only CONFIRMED
   entries are regressions; their next stop is the fingerprint pin to
   split plan-change from same-plan slowdown.

Usage: python tools/bench_diff.py [old.json] [new.json] [--no-isolate]
Defaults: newest BENCH_r*.json vs BENCH_FULL.json, isolation ON.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANDIDATE_RATIO = 1.5  # movement below this is inside the measured noise band
FLAG_ABS_SEC = 1.0     # ratio alone cries wolf on 0.2s -> 0.5s noise
MAX_ISOLATED = 12      # re-measure budget per diff run


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "parsed" in d and isinstance(d["parsed"], dict):  # driver BENCH_r shape
        d = d["parsed"]
    return {k: v for k, v in d.get("queries", {}).items() if v >= 0}


# isolated_median sentinels: a MEMO build can't be focused (not a failure —
# its regression signal lives in SCALE_SWEEP.json); a FAILED re-measure
# (timeout / crash / unparseable bench output) means the candidate is
# UNVERIFIED, which must never be silently conflated with the memo skip
# (ADVICE r8: a regression whose isolation run dies was mislabeled
# 'compare via the sweep' and exited 0).
MEMO_SKIP = "memo-skip"


class IsolationFailed(RuntimeError):
    """The focused fresh-JVM re-measure itself failed; carries the cause."""


def isolated_median(name: str, pin_cpus: int | None = None) -> float | str:
    """Warm median of one query in a FRESH JVM: bench.py focused via
    SPARK_GRAFT_BENCH_QUERIES. Returns the median, or MEMO_SKIP for memo:*
    build lines (not registry queries — cannot be focused). Raises
    IsolationFailed when the re-measure subprocess times out, crashes, or
    emits no parsable result for the query.

    ``pin_cpus``: run the re-measure under ``taskset -c 0-(pin-1)`` with
    SPARK_GRAFT_CPUS=pin — a fixed CPU set with task-slot count < the
    box's cores leaves scheduler headroom for background load (VERDICT
    r9 task 6; measured band table in BENCH_NOTES.md — on an
    uncontended box it does NOT narrow bands). Pinned medians are only
    comparable to other PINNED runs at the same pin count, so the
    regression-verdict path (main) NEVER pins: judging a pinned
    isolated median against an unpinned prior-round suite median would
    systematically mint false CONFIRMED flags on any well-parallelizing
    query. Pinning is an explicit-argument-only rig for band
    experiments."""
    if name.startswith("memo:"):
        return MEMO_SKIP
    # prepay shared memo builds so the focused median is memo-warm like
    # the suite median it is judged against (a memo-consuming query would
    # otherwise carry the build and read as a fake regression)
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_QUERIES=name,
        SPARK_GRAFT_BENCH_PREPAY_MEMOS="1",
    )
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if pin_cpus:
        env["SPARK_GRAFT_CPUS"] = str(pin_cpus)
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    try:
        proc = subprocess.run(
            cmd,
            capture_output=True, text=True, timeout=900, env=env,
        )
    except subprocess.TimeoutExpired:
        raise IsolationFailed("re-measure timed out after 900s")
    except FileNotFoundError as exc:
        # e.g. no taskset binary on a minimal host: the re-measure failed,
        # which must surface as a per-query UNVERIFIED, not kill the diff
        raise IsolationFailed(f"re-measure could not launch: {exc}")
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
        raise IsolationFailed(
            f"bench.py exited {proc.returncode}: {' | '.join(tail)[:300]}"
        )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                med = json.loads(line)["queries"].get(name)
            except (ValueError, KeyError) as exc:
                raise IsolationFailed(f"unparseable bench output: {exc}")
            if med is None:
                raise IsolationFailed("bench output lacks the focused query")
            return med
    raise IsolationFailed("bench.py produced no JSON result line")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    isolate = "--no-isolate" not in sys.argv
    if len(args) > 1:
        old_path, new_path = args[0], args[1]
    elif len(args) == 1:
        old_path, new_path = args[0], os.path.join(REPO, "BENCH_FULL.json")
    else:
        rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        if not rounds:
            print("no BENCH_r*.json to compare against", file=sys.stderr)
            sys.exit(1)
        old_path = rounds[-1]
        new_path = os.path.join(REPO, "BENCH_FULL.json")
    old, new = _load_queries(old_path), _load_queries(new_path)
    shared = sorted(set(old) & set(new))
    candidates, improved = [], []
    for name in shared:
        o, n = old[name], new[name]
        if n >= o * CANDIDATE_RATIO and n - o >= FLAG_ABS_SEC:
            candidates.append((n / max(o, 1e-9), o, n, name))
        elif o >= n * CANDIDATE_RATIO and o - n >= FLAG_ABS_SEC:
            improved.append((o / max(n, 1e-9), o, n, name))
    print(f"# {os.path.basename(old_path)} -> {os.path.basename(new_path)}: "
          f"{len(shared)} shared queries, "
          f"{len(new.keys() - old.keys())} new, {len(old.keys() - new.keys())} gone")
    for ratio, o, n, name in sorted(improved, reverse=True):
        print(f"improved  {name:40s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.1f}x)")
    confirmed = unverified = 0
    for i, (ratio, o, n, name) in enumerate(sorted(candidates, reverse=True)):
        if not isolate:
            print(f"CANDIDATE {name:40s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.1f}x)"
                  "  [--no-isolate: unverified]")
            continue
        if i >= MAX_ISOLATED:
            print(f"CANDIDATE {name:40s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.1f}x)"
                  f"  [re-measure budget ({MAX_ISOLATED}) exhausted]")
            continue
        try:
            iso = isolated_median(name)
        except IsolationFailed as exc:
            # an UNVERIFIED candidate is not cleared: report the cause and
            # make the run exit nonzero so the failure can't pass silently
            unverified += 1
            print(f"UNVERIFIED {name:39s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.1f}x)"
                  f"  [isolation re-measure FAILED: {exc}]")
            continue
        if iso == MEMO_SKIP:
            print(f"CANDIDATE {name:40s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.1f}x)"
                  "  [memo build: compare via SCALE_SWEEP.json]")
        elif iso >= o * CANDIDATE_RATIO and iso - o >= FLAG_ABS_SEC:
            confirmed += 1
            print(f"CONFIRMED {name:40s} {o:7.2f}s -> {n:7.2f}s  "
                  f"(isolated {iso:.2f}s, {iso / max(o, 1e-9):.1f}x) "
                  "-> check the fingerprint pin next")
        else:
            print(f"noise     {name:40s} {o:7.2f}s -> {n:7.2f}s  "
                  f"(isolated {iso:.2f}s: suite-order effect, not a regression)")
    if not candidates:
        print("no candidates above the movement thresholds")
    movers = sorted(candidates + improved, reverse=True)
    if movers:
        # round-close rule (VERDICT r10 task 3): an INTENTIONAL >1.5x move
        # on touched code is an accepted cost, not noise — r10 shipped a
        # deliberate 4x on sim_maxsim_ivf_pruned_verified without a line
        # in the notes because this tool only adjudicated noise-vs-
        # regression. The checklist makes the accounting explicit either
        # way; untouched movers resolve through the isolation verdicts
        # above.
        print(
            "\n# ROUND-CLOSE CHECKLIST: for each mover below whose code was"
            "\n# touched this round, add a row to the 'Accepted cost changes'"
            "\n# table in BENCH_NOTES.md (query, old -> new, causing commit,"
            "\n# why the cost is accepted). The table must exist each round"
            "\n# even if empty."
        )
        for ratio, o, n, name in movers:
            direction = "slower" if n > o else "faster"
            print(f"mover     {name:40s} {o:7.2f}s -> {n:7.2f}s  "
                  f"({ratio:.1f}x {direction})")
    sys.exit(1 if (confirmed or unverified) else 0)


if __name__ == "__main__":
    main()
