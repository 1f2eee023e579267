"""Resumable build: checkpoint skip, kill/restart equivalence, lineage
(north rule: "resumable from per-partition checkpoints with lineage and
counters"; SURVEY.md §7 Phase 4)."""

import shutil

import pytest

from marlin_spark.config import EngineConfig
from marlin_spark.index.build import IndexBuilder
from marlin_spark.index.catalog import IndexCatalog
from marlin_spark.index.manifest import BuildManifest
from marlin_spark.query.engine import SearchEngine

CFG = EngineConfig(block_size=16, range_size=64, n_term_buckets=8, build_groups=4)


def _postings_fingerprint(spark, d):
    import hashlib

    rows = IndexCatalog(d).read(spark, "postings").collect()
    items = sorted(
        (r["term"], r["range_id"], r["block_id"], bytes(r["postings"]), bytes(r["positions"]))
        for r in rows
    )
    h = hashlib.sha256()
    for it in items:
        h.update(repr(it).encode())
    return h.hexdigest()


@pytest.fixture(scope="module")
def grouped_index(spark, tiny_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("grp_index"))
    IndexBuilder(spark, d, CFG).build(tiny_df, build_id="g0")
    return d


def test_grouped_build_equals_single_pass(spark, tiny_df, tiny_index, grouped_index):
    d1, _, _ = tiny_index
    fp_grouped = _postings_fingerprint(spark, grouped_index)
    # rebuild single-pass with the grouped cfg's layout for apples-to-apples
    d2 = grouped_index + "_single"
    IndexBuilder(spark, d2, CFG.with_(build_groups=1)).build(tiny_df, build_id="s0")
    assert fp_grouped == _postings_fingerprint(spark, d2)


def test_resume_skips_completed_units(spark, tiny_df, grouped_index):
    mf = BuildManifest(grouped_index, "g0")
    units = {r["unit"] for r in mf.records()}
    assert {"docs", "dictionary"} <= units
    assert {f"postings:g{i}" for i in range(4)} <= units
    import time

    t0 = time.time()
    IndexBuilder(spark, grouped_index, CFG).build(tiny_df, build_id="g0")
    assert time.time() - t0 < 2.0  # all units skipped, no Spark jobs


def test_kill_restart_produces_identical_index(spark, tiny_df, grouped_index, tiny_oracle):
    """Simulate a crash after group 1: drop manifests + data of groups 2-3
    and the dictionary, restart, and require a bit-identical index."""
    fp_before = _postings_fingerprint(spark, grouped_index)
    crashed = grouped_index + "_crashed"
    shutil.copytree(grouped_index, crashed)
    mf = BuildManifest(crashed, "g0")
    import os

    for unit in ("postings:g2", "postings:g3", "dictionary"):
        os.remove(mf._rec_path(unit))
    # wipe the bucket dirs those groups own (simulates torn partial output;
    # dynamic partition overwrite would also replace half-written ones)
    cat = IndexCatalog(crashed)
    for b in range(CFG.n_term_buckets):
        if b % 4 in (2, 3):
            shutil.rmtree(cat.path(f"postings/bucket={b}"), ignore_errors=True)
    counters = IndexBuilder(spark, crashed, CFG).build(tiny_df, build_id="g0")
    assert _postings_fingerprint(spark, crashed) == fp_before
    # and the restarted index answers queries rank-identically
    eng = SearchEngine(spark, crashed, CFG)
    got = [(r["docid"], round(r["score"], 6)) for r in eng.search("test", k=5).collect()]
    want = [(d, round(s, 6)) for d, s in tiny_oracle.search("test", k=5)]
    assert got == want
    assert counters["n_terms"] == len(tiny_oracle.postings)


def test_lineage_records_have_counters(grouped_index):
    mf = BuildManifest(grouped_index, "g0")
    recs = {r["unit"]: r for r in mf.records()}
    total_postings = sum(
        r["counters"].get("postings_emitted", 0)
        for u, r in recs.items()
        if u.startswith("postings:")
    )
    assert total_postings > 0
    assert recs["dictionary"]["counters"]["merge_fan_in"] > 0
    assert all("finished_at" in r for r in recs.values())
