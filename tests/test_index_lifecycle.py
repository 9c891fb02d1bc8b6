"""Deletion lifecycle for the fingerprint indexes (round 12).

The ANN index got tombstones + deferred compaction in round 11
(`pq.remove_from_ann_index`); these pins give the four fingerprint
tiers — text MinHash, image phash, audio afp, video vhash — the same
takedown semantics via the generic engine in `operators/dedup.py`:

- remove-then-probe == probe-against-rebuilt-without-ids, per tier;
- the tombstone-vs-reappend contract (a tombstone suppresses its id
  even if re-appended; compaction clears the way);
- torn / wrong-family artifacts reject removal with nothing written;
- compaction is threshold-gated, count-validated, and changes storage
  but never probe results;
- the CLI exposes --remove / --compact on every *_index command.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
    compact_dedup_index,
    compact_fp_index,
    dedup_against_corpus,
    load_dedup_index,
    load_fp_index,
    minhash_signature_index,
    remove_from_dedup_index,
    remove_from_fp_index,
    append_fp_index,
    save_dedup_index,
    save_fp_index,
    hamming_pairs_against_corpus,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "scripts", "run_pipeline.py")

TAG = "test-fp-v1"


def _fp_frame(spark, rows):
    return spark.createDataFrame(rows, "media_id long, fp long")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "media_id long")


def _probe_ids(probe, index):
    pairs = hamming_pairs_against_corpus(
        probe, index, hash_col="fp", id_col="media_id",
        nbits=16, max_hamming=1,
    )
    return sorted(
        (r["new_id"], r["corpus_id"]) for r in pairs.collect()
    )


def test_fp_remove_then_probe_equals_rebuild(spark, tmp_path):
    """The core takedown contract on the generic tagged artifact:
    after remove(ids), every probe behaves exactly as if the index had
    been rebuilt without those ids — same pairs, same survivors."""
    rows = [(i, i * 16) for i in range(1, 9)]  # distinct, far apart
    full = _fp_frame(spark, rows)
    path = str(tmp_path / "fp")
    save_fp_index(full, path, TAG)

    probe = _fp_frame(spark, [(100 + i, h + 1) for i, h in rows])  # d=1 hits
    idx, _ = load_fp_index(spark, path, TAG)
    assert len(_probe_ids(probe, idx)) == 8

    report = remove_from_fp_index(spark, path, _ids(spark, [2, 5]), TAG)
    assert report["requested"] == 2
    assert report["tombstones_total"] == 2
    assert report["index_rows"] == 8  # physical rows untouched

    rebuilt_path = str(tmp_path / "fp_rebuilt")
    save_fp_index(
        full.filter(~F.col("media_id").isin(2, 5)), rebuilt_path, TAG
    )
    got = _probe_ids(probe, load_fp_index(spark, path, TAG)[0])
    want = _probe_ids(probe, load_fp_index(spark, rebuilt_path, TAG)[0])
    assert got == want and len(got) == 6
    assert not any(c in (2, 5) for _, c in got)


def test_fp_tombstone_suppresses_reappend_until_compact(spark, tmp_path):
    """The ANN tombstone-vs-reappend contract, replicated: a removed
    id stays suppressed even if appended again; compaction folds both
    the original and the re-append away, after which a fresh append
    becomes visible."""
    path = str(tmp_path / "fp")
    save_fp_index(_fp_frame(spark, [(1, 16), (2, 32), (3, 48)]), path, TAG)
    remove_from_fp_index(spark, path, _ids(spark, [3]), TAG)
    # re-append id 3: still suppressed (tombstone wins)
    append_fp_index(spark, path, _fp_frame(spark, [(3, 48)]), TAG)
    idx, _ = load_fp_index(spark, path, TAG)
    assert sorted(r["media_id"] for r in idx.collect()) == [1, 2]

    rep = compact_fp_index(spark, path, TAG, force=True)
    assert rep["compacted"] is True
    assert rep["folded_tombstones"] == 1
    # both physical rows for id 3 folded away
    idx, _ = load_fp_index(spark, path, TAG)
    assert sorted(r["media_id"] for r in idx.collect()) == [1, 2]

    # tombstones cleared: a fresh append is visible again
    append_fp_index(spark, path, _fp_frame(spark, [(3, 48)]), TAG)
    idx, _ = load_fp_index(spark, path, TAG)
    assert sorted(r["media_id"] for r in idx.collect()) == [1, 2, 3]


def test_fp_remove_rejects_torn_and_wrong_tag(spark, tmp_path):
    """Removal validates the artifact FIRST: a plain parquet (no tag)
    and a wrong-family tag both reject with no tombstone written."""
    plain = str(tmp_path / "plain")
    _fp_frame(spark, [(1, 16)]).write.parquet(plain)
    with pytest.raises(ValueError, match="_fp_tag"):
        remove_from_fp_index(spark, plain, _ids(spark, [1]), TAG)
    assert not os.path.isdir(plain + "_tombstones")

    path = str(tmp_path / "fp")
    save_fp_index(_fp_frame(spark, [(1, 16)]), path, TAG)
    with pytest.raises(ValueError, match="tag"):
        remove_from_fp_index(spark, path, _ids(spark, [1]), "other-v9")
    assert not os.path.isdir(path + "_tombstones")
    # the ids frame must carry the index's id column
    bad = spark.createDataFrame([(1,)], "wrong_col long")
    with pytest.raises(ValueError, match="media_id"):
        remove_from_fp_index(spark, path, bad, TAG)


def test_fp_compact_threshold_gating_and_report(spark, tmp_path):
    """Compaction is deferred below min_ratio (the per-load anti-join
    is cheaper than the rewrite) and runs under force — with the
    before/after accounting and the tombstone dir cleared."""
    path = str(tmp_path / "fp")
    save_fp_index(
        _fp_frame(spark, [(i, i * 16) for i in range(1, 21)]), path, TAG
    )
    remove_from_fp_index(spark, path, _ids(spark, [7]), TAG)  # 5% ratio
    rep = compact_fp_index(spark, path, TAG, min_ratio=0.1)
    assert rep["compacted"] is False and "min_ratio" in rep["reason"]
    assert os.path.isdir(path + "_tombstones")

    rep = compact_fp_index(spark, path, TAG, min_ratio=0.1, force=True)
    assert rep["compacted"] is True
    assert rep["index_rows_before"] == 20
    assert rep["index_rows_after"] == 19
    assert not os.path.isdir(path + "_tombstones")
    # the artifact survives the swap intact (tag + sentinel + rows)
    idx, tag = load_fp_index(spark, path, TAG)
    assert tag == TAG and idx.count() == 19
    # compacting again: nothing to do
    rep = compact_fp_index(spark, path, TAG, force=True)
    assert rep["compacted"] is False and rep["reason"] == "no tombstones"


def test_minhash_remove_then_probe_equals_rebuild(spark, tmp_path):
    """Text tier: a removed document stops seeding near-dup verdicts —
    the gate keeps a batch doc that near-dups ONLY the removed corpus
    doc, exactly as a rebuilt-without-it index would."""
    texts = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "pack my box with five dozen liquor jugs right now"),
        (3, "how vexingly quick daft zebras jump over fences"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    path = str(tmp_path / "mh")
    idx = minhash_signature_index(docs, num_hashes=32, k=3)
    save_dedup_index(idx, 32, 3, path)

    batch = spark.createDataFrame(
        [(20, "pack my box with five dozen liquor jugs right away")],
        "doc_id long, text string",
    )
    index, nh, k = load_dedup_index(spark, path)
    kept = dedup_against_corpus(batch, index, threshold=0.5, num_hashes=nh, k=k)
    assert kept.count() == 0  # near-dups corpus doc 2 -> dropped

    rep = remove_from_dedup_index(spark, path, _ids2(spark, [2]))
    assert rep["requested"] == 1 and rep["tombstones_total"] == 1
    index, nh, k = load_dedup_index(spark, path)
    kept = dedup_against_corpus(batch, index, threshold=0.5, num_hashes=nh, k=k)
    assert [r["doc_id"] for r in kept.collect()] == [20]

    # identical to a rebuild without doc 2
    rb = str(tmp_path / "mh_rb")
    save_dedup_index(
        minhash_signature_index(
            docs.filter("doc_id <> 2"), num_hashes=32, k=3
        ),
        32, 3, rb,
    )
    index_rb, nh, k = load_dedup_index(spark, rb)
    kept_rb = dedup_against_corpus(
        batch, index_rb, threshold=0.5, num_hashes=nh, k=k
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in kept_rb.collect()
    )

    rep = compact_dedup_index(spark, path, force=True)
    assert rep["compacted"] is True and rep["index_rows_after"] == 2
    index, nh, k = load_dedup_index(spark, path)
    assert index.count() == 2


def _ids2(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_phash_remove_and_compact(spark, tmp_path):
    """Image tier: the phash artifact (its own two-parameter format)
    rides the same lifecycle engine."""
    from hospital_stain_tracker_data_pipeline_spark.operators.multimodal import (
        compact_phash_index,
        load_phash_index,
        remove_from_phash_index,
        save_phash_index,
    )

    hashes = spark.createDataFrame(
        [(1, 11), (2, 22), (3, 33)], "media_id long, phash long"
    )
    path = str(tmp_path / "ph")
    save_phash_index(hashes, "dhash", 8, path)
    rep = remove_from_phash_index(spark, path, _ids(spark, [2]))
    assert rep["tombstones_total"] == 1
    idx, algo, hs = load_phash_index(spark, path)
    assert (algo, hs) == ("dhash", 8)
    assert sorted(r["media_id"] for r in idx.collect()) == [1, 3]
    rep = compact_phash_index(spark, path, force=True)
    assert rep["compacted"] is True
    idx, _, _ = load_phash_index(spark, path)
    assert sorted(r["media_id"] for r in idx.collect()) == [1, 3]


def test_audio_video_tier_wrappers(spark, tmp_path):
    """Audio/video tiers: the thin wrappers remove under the module's
    own tag and reject a foreign artifact."""
    from hospital_stain_tracker_data_pipeline_spark.operators.audio_fp import (
        compact_afp_index,
        load_afp_index,
        remove_from_afp_index,
        save_afp_index,
    )

    fps = spark.createDataFrame(
        [(1, 111), (2, 222)], "media_id long, afp long"
    )
    apath = str(tmp_path / "afp")
    save_afp_index(fps, apath)
    rep = remove_from_afp_index(spark, apath, _ids(spark, [1]))
    assert rep["tombstones_total"] == 1
    assert [r["media_id"] for r in load_afp_index(spark, apath).collect()] == [2]
    assert compact_afp_index(spark, apath, force=True)["compacted"] is True
    assert [r["media_id"] for r in load_afp_index(spark, apath).collect()] == [2]

    # a video artifact rejects the audio tier's remove (wrong family)
    from hospital_stain_tracker_data_pipeline_spark.operators.video_fp import (
        compact_vhash_index,
        load_vhash_index,
        remove_from_vhash_index,
        save_vhash_index,
    )

    vpath = str(tmp_path / "vh")
    vh = spark.createDataFrame(
        [(1, 11), (2, 22)], "media_id long, vhash long"
    )
    save_vhash_index(vh, vpath, "dhash", 4, 3)
    with pytest.raises(ValueError):
        remove_from_afp_index(spark, vpath, _ids(spark, [1]))
    rep = remove_from_vhash_index(spark, vpath, _ids(spark, [2]))
    assert rep["tombstones_total"] == 1
    idx, algo, hs, ns = load_vhash_index(spark, vpath)
    assert (algo, hs, ns) == ("dhash", 4, 3)
    assert [r["media_id"] for r in idx.collect()] == [1]
    assert compact_vhash_index(spark, vpath, force=True)["compacted"] is True
    assert [r["media_id"] for r in load_vhash_index(spark, vpath)[0].collect()] == [1]


def test_cli_index_remove_and_compact(tmp_path):
    """CLI lifecycle pins: dedup_index --remove tombstones ids (JSON
    report), the filter gate then keeps a near-dup of the removed doc,
    and --compact --compact-force folds the tombstones."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog tonight",
                "pack my box with five dozen liquor jugs right now",
                "how vexingly quick daft zebras jump over fences",
            ],
        }),
        docs,
    )
    idx = str(tmp_path / "mhidx")

    def run(*args):
        out = subprocess.run(
            [sys.executable, CLI, *args],
            capture_output=True, text=True, timeout=240, cwd=REPO,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout

    run("dedup_index", "--input", str(docs), "--output", idx)

    ids = tmp_path / "takedown.parquet"
    pq.write_table(pa.table({"doc_id": [2]}), ids)
    report = json.loads(
        run("dedup_index", "--output", idx, "--remove", str(ids))
        .strip().splitlines()[-1]
    )
    assert report["tombstones_total"] == 1
    assert report["index_rows"] == 3

    batch = tmp_path / "batch.parquet"
    pq.write_table(
        pa.table({
            "doc_id": [20],
            "text": ["pack my box with five dozen liquor jugs right away"],
        }),
        batch,
    )
    out_dir = str(tmp_path / "survivors")
    run(
        "dedup_filter", "--input", str(batch), "--index", idx,
        "--output", out_dir, "--threshold", "0.5",
    )
    import pyarrow.parquet as pq2

    kept = pq2.read_table(out_dir).to_pydict()["doc_id"]
    assert kept == [20]  # its only near-dup was tombstoned

    report = json.loads(
        run(
            "dedup_index", "--output", idx, "--compact", "--compact-force"
        ).strip().splitlines()[-1]
    )
    assert report["compacted"] is True
    assert report["index_rows_after"] == 2


def test_rebuild_clears_stale_tombstones(spark, tmp_path):
    """Regression (round-12 review): tombstones live in a SIBLING dir,
    so a full rebuild via save_*_index must clear them — otherwise a
    legitimately-present id in the brand-new index stays suppressed
    forever (and a later compact physically deletes it)."""
    path = str(tmp_path / "fp")
    save_fp_index(_fp_frame(spark, [(1, 16), (2, 32)]), path, TAG)
    remove_from_fp_index(spark, path, _ids(spark, [2]), TAG)
    assert os.path.isdir(path + "_tombstones")

    # nightly rebuild: id 2 is legitimately in the fresh corpus
    save_fp_index(_fp_frame(spark, [(1, 16), (2, 32), (3, 48)]), path, TAG)
    assert not os.path.isdir(path + "_tombstones")
    idx, _ = load_fp_index(spark, path, TAG)
    assert sorted(r["media_id"] for r in idx.collect()) == [1, 2, 3]

    # same for the MinHash artifact
    mh = str(tmp_path / "mh")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    save_dedup_index(minhash_signature_index(docs), 32, 3, mh)
    remove_from_dedup_index(spark, mh, _ids2(spark, [2]))
    save_dedup_index(minhash_signature_index(docs), 32, 3, mh)
    assert load_dedup_index(spark, mh)[0].count() == 2


def test_remove_casts_ids_to_index_type(spark, tmp_path):
    """Regression (round-12 review): two removes carrying DIFFERENT
    physical id types (int vs long parquet from different tools) must
    not mix schemas in the tombstone dir — every id is cast to the
    index's id type before writing, so the index stays loadable."""
    path = str(tmp_path / "fp")
    save_fp_index(
        _fp_frame(spark, [(1, 16), (2, 32), (3, 48)]), path, TAG
    )
    remove_from_fp_index(spark, path, _ids(spark, [1]), TAG)  # long ids
    ints = spark.createDataFrame([(2,)], "media_id int")  # int32 ids
    remove_from_fp_index(spark, path, ints, TAG)
    idx, _ = load_fp_index(spark, path, TAG)  # must not raise
    assert sorted(r["media_id"] for r in idx.collect()) == [3]
    rep = compact_fp_index(spark, path, TAG, force=True)
    assert rep["compacted"] is True and rep["index_rows_after"] == 1


def test_index_fsck_all_kinds(spark, tmp_path):
    """index_fsck detects every artifact kind from its own metadata,
    reports lifecycle state read-only, and reports (never raises) on
    broken artifacts — the fleet-sweep contract."""
    from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
        index_fsck,
    )
    from hospital_stain_tracker_data_pipeline_spark.operators.multimodal import (
        save_phash_index,
    )
    from hospital_stain_tracker_data_pipeline_spark.operators.pq import (
        build_ann_index,
        remove_from_ann_index,
    )

    # generic fp artifact, one tombstone
    fp = str(tmp_path / "fp")
    save_fp_index(_fp_frame(spark, [(1, 16), (2, 32)]), fp, TAG)
    remove_from_fp_index(spark, fp, _ids(spark, [2]), TAG)
    rep = index_fsck(spark, fp)
    assert rep["ok"] and rep["kind"] == "fp_tagged"
    assert rep["meta"]["tag"] == TAG
    assert (rep["rows"], rep["live_rows"], rep["tombstones"]) == (2, 1, 1)

    # minhash artifact (records its own id column)
    mh = str(tmp_path / "mh")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string",
    )
    save_dedup_index(minhash_signature_index(docs), 32, 3, mh)
    rep = index_fsck(spark, mh)
    assert rep["ok"] and rep["kind"] == "minhash"
    assert rep["meta"] == {"num_hashes": 32, "k": 3}
    assert rep["rows"] == 2 and rep["tombstones"] == 0

    # phash artifact
    ph = str(tmp_path / "ph")
    save_phash_index(
        spark.createDataFrame([(1, 11)], "media_id long, phash long"),
        "dhash", 8, ph,
    )
    rep = index_fsck(spark, ph)
    assert rep["ok"] and rep["kind"] == "phash"
    assert rep["meta"] == {"algo": "dhash", "hash_size": 8}

    # ANN artifact with a tombstone
    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0, 0.0]) for i in range(24)],
        "vec_id long, embedding array<float>",
    )
    ann = str(tmp_path / "ann")
    build_ann_index(emb, ann, n_clusters=2, m=2, n_codes=4, iters=1)
    remove_from_ann_index(spark, ann, spark.createDataFrame([(3,)], "vec_id long"))
    rep = index_fsck(spark, ann)
    assert rep["ok"] and rep["kind"] == "ann_ivf_pq"
    assert rep["meta"]["id_col"] == "vec_id"
    assert rep["rows"] == 24 and rep["tombstones"] == 1

    # broken artifacts REPORT, never raise
    plain = str(tmp_path / "plain")
    _fp_frame(spark, [(1, 16)]).write.parquet(plain)
    rep = index_fsck(spark, plain)
    assert rep["ok"] is False and "not a persisted index" in rep["error"]

    # stale swap dir flips ok to False with an actionable error
    os.makedirs(fp + "_compacting", exist_ok=True)
    rep = index_fsck(spark, fp)
    assert rep["ok"] is False and "_compacting" in rep["error"]
    os.rmdir(fp + "_compacting")

    # torn ANN (marker gone) reports too
    os.remove(os.path.join(ann, "_INDEX_OK"))
    rep = index_fsck(spark, ann)
    assert rep["ok"] is False and "_INDEX_OK missing" in rep["error"]


def test_swap_crash_recovery_protects_last_copy(spark, tmp_path):
    """Compact's two-rename swap window (index path missing, last copy
    in `<path>_old` / `<path>_compacting`): recover_index_swap renames
    the right copy back, clear_index_lifecycle_state REFUSES to delete
    the survivors while the path is absent (a rebuild must not destroy
    the only copy), and index_fsck names the state + the fix instead of
    a generic read failure."""
    import shutil

    from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
        clear_index_lifecycle_state,
        index_fsck,
        recover_index_swap,
    )

    rows = [(i, i * 16) for i in range(1, 9)]
    path = str(tmp_path / "fp")
    save_fp_index(_fp_frame(spark, rows), path, TAG)
    remove_from_fp_index(spark, path, _ids(spark, [2]), TAG)

    # healthy artifact: recovery is a no-op
    assert recover_index_swap(path)["recovered"] is False

    # simulate a crash between rename(p, old) and rename(compacting, p):
    # _compacting holds the validated post-fold copy, _old the pre-fold
    shutil.copytree(path, path + "_compacting")
    os.rename(path, path + "_old")

    rep = index_fsck(spark, path)
    assert rep["ok"] is False and rep["kind"] == "crashed_swap"
    assert "recover_index_swap" in rep["error"]

    with pytest.raises(ValueError, match="recover_index_swap"):
        clear_index_lifecycle_state(path)
    assert os.path.isdir(path + "_old")  # refusal deleted nothing

    got = recover_index_swap(path)
    assert got == {"recovered": True, "from": "compacting", "path": path}
    # post-fold copy restored, siblings and (already-folded) tombstones gone
    assert os.path.isdir(path)
    assert not os.path.isdir(path + "_old")
    assert not os.path.isdir(path + "_compacting")
    assert not os.path.isdir(path + "_tombstones")
    idx, _ = load_fp_index(spark, path, TAG)
    assert idx.count() == 8  # copytree predates the fold in this rig

    # crash window BEFORE compacting existed (only _old survives):
    os.rename(path, path + "_old")
    got = recover_index_swap(path)
    assert got == {"recovered": True, "from": "old", "path": path}
    assert load_fp_index(spark, path, TAG)[0].count() == 8

    # nothing anywhere → honest report, no raise
    empty = str(tmp_path / "nothing")
    assert recover_index_swap(empty)["recovered"] is False


def test_index_fsck_covers_every_save_writer(spark, tmp_path):
    """Kind-coverage contract: every `save_*` artifact writer in the
    package (plus the marker-protocol ANN builder) maps to an
    index_fsck kind, enumerated from the SOURCE so a new writer without
    fsck coverage fails here. The Z-order lake layout is deliberately
    absent: it is a row ordering of a data table, not a loadable
    artifact (documented in the fsck docstring). For each
    non-lifecycle kind, build the artifact and assert fsck identifies
    and validates it."""
    import glob
    import re

    import numpy as np

    from hospital_stain_tracker_data_pipeline_spark.operators.dedup import (
        index_fsck,
    )

    pkg = os.path.join(REPO, "hospital_stain_tracker_data_pipeline_spark")
    writers = set()
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        writers |= set(re.findall(r"^def (save_\w+)", open(f).read(), re.M))
    expected_kind = {
        "save_dedup_index": "minhash",
        "save_fp_index": "fp_tagged",
        "save_afp_index": "fp_tagged",     # wraps save_fp_index
        "save_vhash_index": "fp_tagged",   # wraps save_fp_index
        "save_phash_index": "phash",
        "save_ivf_index": "ivf_centroids",
        "save_pq_index": "pq_codebooks",
        "save_cms_sketch": "cms_sketch",
        "save_hll_sketch": "hll_sketch",
        "save_bloom_sketch": "bloom_sketch",
        "save_quantile_sketch": "quantile_sketch",
        "save_ngram_lm": "ngram_lm",
        "save_text_probe": "text_probe",
    }
    # the enumeration IS the assertion: a new save_* writer must be
    # added to this map (and to fsck) or this test fails
    assert writers == set(expected_kind), (
        sorted(writers ^ set(expected_kind))
    )

    from hospital_stain_tracker_data_pipeline_spark.operators.features import (
        save_text_probe,
    )
    from hospital_stain_tracker_data_pipeline_spark.operators.lm import (
        save_ngram_lm,
        train_ngram_lm,
    )
    from hospital_stain_tracker_data_pipeline_spark.operators.pq import (
        save_pq_index,
    )
    from hospital_stain_tracker_data_pipeline_spark.operators.similarity import (
        save_ivf_index,
    )
    from hospital_stain_tracker_data_pipeline_spark.operators.sketch import (
        bloom_sketch,
        cms_sketch,
        dyadic_rank_sketch,
        hll_registers,
        save_bloom_sketch,
        save_cms_sketch,
        save_hll_sketch,
        save_quantile_sketch,
    )

    events = spark.createDataFrame(
        [(i, f"u{i % 5}", float(i)) for i in range(40)],
        "event_id long, user string, amount double",
    )

    p = str(tmp_path / "cms")
    save_cms_sketch(cms_sketch(events, "user", width=64, depth=3), 64, 3, p)
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "cms_sketch"
    assert rep["meta"]["width"] == 64 and rep["rows"] > 0

    p = str(tmp_path / "hll")
    save_hll_sketch(hll_registers(events, "user", p=8), 8, p)
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "hll_sketch"
    assert rep["meta"]["p"] == 8

    p = str(tmp_path / "bloom")
    save_bloom_sketch(
        bloom_sketch(events, "user", m_bits=1 << 10, k=3), 1 << 10, 3, p
    )
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "bloom_sketch"
    assert rep["meta"]["k"] == 3

    p = str(tmp_path / "dq")
    save_quantile_sketch(
        dyadic_rank_sketch(events, "amount", levels=8, width=64, depth=3),
        8, 64, 3, p,
    )
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "quantile_sketch"
    assert rep["meta"]["levels"] == 8

    p = str(tmp_path / "ivf")
    save_ivf_index(spark, np.arange(8, dtype=np.int64).reshape(2, 4), p)
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "ivf_centroids"
    assert rep["meta"] == {"k": 2, "dim": 4}

    p = str(tmp_path / "pq")
    save_pq_index(spark, np.arange(16, dtype=np.int64).reshape(2, 4, 2), p)
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "pq_codebooks"
    assert rep["meta"] == {"m": 2, "n_codes": 4, "dsub": 2}

    p = str(tmp_path / "lm")
    docs = spark.createDataFrame(
        [(1, "a b c a b"), (2, "b c d")], "doc_id long, text string"
    )
    save_ngram_lm(train_ngram_lm(docs, n=2), p)
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "ngram_lm"
    assert rep["meta"]["n"] == 2 and rep["rows"] > 0

    p = str(tmp_path / "probe.json")
    save_text_probe(p, [0.5, -0.25, 0.125], 0.1, 3)
    rep = index_fsck(spark, p)
    assert rep["ok"] and rep["kind"] == "text_probe"
    assert rep["meta"] == {"dim": 3} and rep["rows"] == 3
