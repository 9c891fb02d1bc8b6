"""The bench stdout contract, pinned end-to-end as a subprocess.

Rounds 7 and 8 both ended with a driver record of ``parsed: null``
despite green engineering: r7 because an extra crashed before the
(then end-of-main) print, r8 because Spark console progress bars wrote
stage lines into the captured stream AFTER the graded JSON line. The
driver's capture keeps a ~2 KB tail and parses the JSON line out of
it, so the contract is threefold:

1. the LAST stdout line of a bench run ``json.loads`` cleanly and
   carries ``warm_total`` / ``queries`` / ``sf``;
2. that line is short enough (< 1900 chars) that a 2 KB tail always
   contains it whole (the round-5 failure was an overlong line);
3. console progress is off at the session level (no ``[Stage`` text
   anywhere in the combined output).

The subprocess runs ``bench.py`` for real — same prints, same extras
loop, same BENCH_LOCAL write — with ``SPARK_GRAFT_BENCH_SMOKE=1``
trimming the query list so the pin costs ~1 minute, not a full bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")


def test_bench_last_stdout_line_is_the_graded_json(tmp_path):
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_BENCH_SMOKE": "1",
            "SPARK_GRAFT_SF_DIR": SF_DIR,
            "SPARK_GRAFT_BENCH_LOCAL": str(tmp_path / "bench_local.json"),
            # modest parallelism: the suite's own Spark JVM is resident
            "SPARK_GRAFT_CPUS": "8",
        }
    )
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    stdout_lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert stdout_lines, "bench printed nothing to stdout"

    # (1) the last line IS the graded record
    last = stdout_lines[-1]
    rec = json.loads(last)
    assert rec["metric"] == "headline_queries_total"
    assert rec["unit"] == "sec"
    assert rec["warm_total"] > 0
    assert rec["queries"] and all(v >= 0 for v in rec["queries"].values())
    assert rec["sf"] == 0.001

    # the machine-speed normalizer + per-query spread (round-11): the
    # calibration probe is constant work so it must be positive, and
    # q_min/q_max are parallel to the queries map with min <= median
    # <= max pointwise
    assert rec["calibration_sec"] > 0
    meds = list(rec["queries"].values())
    assert len(rec["q_min"]) == len(meds) == len(rec["q_max"])
    for lo, mid, hi in zip(rec["q_min"], meds, rec["q_max"]):
        assert lo <= mid <= hi

    # belt-and-suspenders: the early print emitted the SAME line, so a
    # driver that takes the FIRST parseable line agrees with one that
    # takes the last
    assert stdout_lines[0] == last

    # (2) tail-safety: the line fits a 2 KB capture tail with margin.
    # The smoke line is shorter than the full 37-query one, so project
    # the full-run length entry-by-entry: each `queries` map entry
    # costs len(name) + ~12 chars of quotes/colon/number/comma, and
    # each headline query adds ~7 chars to EACH of the q_min/q_max
    # parallel arrays ("0.123,").
    import bench

    base = len(last)  # scaffolding + the smoke entries (overcounts base: fine)
    projected_full = base + sum(len(n) + 12 + 14 for n in bench.HEADLINE)
    assert projected_full < 1900, (
        f"projected full-run stdout line ~{projected_full} chars — "
        "the driver tail keeps 2000; shrink the line"
    )

    # (3) no console progress bars anywhere in the captured streams
    combined = proc.stdout + proc.stderr
    assert "[Stage" not in combined, "console progress bars are back"

    # the full record landed at the redirected path, not the repo's
    assert (tmp_path / "bench_local.json").exists()
