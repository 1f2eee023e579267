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
