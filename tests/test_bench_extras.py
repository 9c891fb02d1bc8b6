"""Smoke coverage for every bench extra.

bench.py's extras are BENCH_LOCAL-only surfaces, so nothing in the
driver's correctness gate exercises them — round 7 proved that a
broken extra can rot silently until it detonates the graded bench run
(BENCH_r07 ``parsed: null``). This suite calls every
``_extras_registry()`` entry once at the tiny fixture scale; an extra
that can't even produce a count is a test failure long before it is a
bench-night failure. (bench.py additionally fences each extra in
try/except, so even a failure there can no longer destroy the record —
this test keeps the extras actually *measured*, not just survived.)
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _extra_names():
    return sorted(bench._extras_registry().keys())


@pytest.mark.parametrize("name", _extra_names())
def test_bench_extra_runs(spark, sf_dir, name):
    registry = bench._extras_registry()
    # curate_full persists stage products; release them afterwards so
    # later parametrizations (and the rest of the suite) start clean
    try:
        n = registry[name](spark, sf_dir).count()
        assert n >= 0
    finally:
        if name == "curate_full":
            spark.catalog.clearCache()


def test_e2e_phase_map_covers_the_total(spark, sf_dir):
    """Stage-level regression contract for the flagship extra: the
    per-stage wall times in EXTRAS_INFO must (a) exist with every
    expected stage key, (b) sum to (nearly) the whole extra — a new
    untimed stage, or a stage whose timer was disconnected, shows up
    here as uncovered wall time long before a single-stage 5×
    regression hides inside a stable-looking total."""
    import time

    registry = bench._extras_registry()
    t0 = time.perf_counter()
    n = registry["e2e_crawl_to_pack"](spark, sf_dir).count()
    total = time.perf_counter() - t0
    assert n >= 0
    phases = bench.EXTRAS_INFO["e2e_crawl_to_pack"]
    stage_keys = [
        "warc_parse_sec", "curate_pack_sec", "manifest_sec",
        "media_curate_sec", "ops_sec",
    ]
    assert all(k in phases for k in stage_keys), sorted(phases)
    covered = sum(phases[k] for k in stage_keys)
    # the stage timers are contiguous from the first line of the extra
    # to the last, so they must cover ~all the wall time (the final
    # .count() above re-reads a materialized frame — cheap)
    assert 0.6 * total <= covered <= 1.05 * total, (covered, total)
    # the ops leg really ran its operational surface
    assert phases["fsck_ok"] is True and phases["fsck_kind"] == "ann_ivf_pq"
    assert phases["ann_appended"] > 0
