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
