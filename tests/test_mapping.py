"""Dynamic mapping inference (reference mapping.c:537-601 analog):
schema-typed fields classify directly; string fields split text vs
keyword from a bounded sample; indexed_fields learned in schema order."""

import datetime as dt

import pytest

from marlin_spark.config import EngineConfig
from marlin_spark.index.mapping import config_from_mapping, infer_mapping


@pytest.fixture(scope="module")
def mixed_df(spark):
    rows = [
        (
            f"conv-{i}",
            i,
            "user" if i % 2 else "assistant",
            "the quick brown fox jumped over the lazy dog " * 2,
            f"a much longer note field with many words describing turn {i}",
            float(i) * 1.5,
            i % 3 == 0,
            dt.datetime(2024, 1, 1 + i % 20),
            [f"tag{i % 4}"],
        )
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "note string, score double, flagged boolean, ts timestamp, "
        "tags array<string>",
    )


def test_infer_mapping_kinds(mixed_df):
    m = infer_mapping(mixed_df)
    assert m["ready"] and m["sampled_rows"] == 300
    f = m["fields"]
    assert f["text"]["kind"] == "text"
    assert f["note"]["kind"] == "text"
    assert f["role"]["kind"] == "keyword" and f["role"]["filterable"]
    # near-unique short strings are keywords (ids), not text
    assert f["conv_id"]["kind"] == "keyword"
    assert f["turn_idx"]["kind"] == "number"
    assert f["score"]["kind"] == "number"
    assert f["flagged"]["kind"] == "bool"
    assert f["ts"]["kind"] == "timestamp"
    assert f["tags"]["kind"] == "array" and f["tags"]["element"] == "text"


def test_config_from_mapping_orders_by_schema(mixed_df):
    cfg = config_from_mapping(infer_mapping(mixed_df), EngineConfig())
    # text before note: schema order IS field priority (IDPRIORITY)
    assert cfg.indexed_fields == ("text", "note")


def test_mapping_not_ready_on_empty(spark):
    df = spark.createDataFrame([], "text string")
    m = infer_mapping(df)
    assert not m["ready"]
    with pytest.raises(ValueError, match="not ready"):
        config_from_mapping(m)


def test_app_auto_mapping_builds_and_persists(spark, tmp_path, mixed_df):
    from marlin_spark.app import MarlinApp
    from marlin_spark.query.engine import SearchEngine

    app = MarlinApp(spark, str(tmp_path / "auto_app"))
    # builder needs the transcript key columns; mixed_df has them
    counters = app.create_index(
        "auto", mixed_df, EngineConfig(block_size=16, range_size=64),
        auto_mapping=True,
    )
    assert counters["mapping"]["fields"]["note"]["kind"] == "text"
    eng = app.get_index("auto")
    # a word appearing only in the note field IS indexed
    assert eng.search("describing", k=5, use_wand=False).count() > 0


def test_learned_mapping_survives_reload(spark, tmp_path, mixed_df):
    """ADVICE r3 (medium): indexed_fields learned by auto_mapping must be
    PERSISTED (stats.json) and restored by SearchEngine AND
    IncrementalIndexer constructed with a default config — otherwise a
    streaming add or rebuild silently indexes only the default 'text'
    field, diverging from the base index (reference persists its learned
    mapping and gates every write on it, mapping.c:537-601)."""
    from marlin_spark.app import MarlinApp
    from marlin_spark.query.engine import SearchEngine
    from marlin_spark.streaming.incremental import IncrementalIndexer

    app = MarlinApp(spark, str(tmp_path / "reload_app"))
    app.create_index(
        "r", mixed_df, EngineConfig(block_size=16, range_size=64),
        auto_mapping=True,
    )
    path = app.index_path("r")
    # fresh engine, default config: learned fields restored from stats
    eng = SearchEngine(spark, path)
    assert eng.cfg.indexed_fields == ("text", "note")
    idx = IncrementalIndexer(spark, path)
    assert idx.cfg.indexed_fields == ("text", "note")
    # and a streamed batch actually indexes the learned note field
    batch = spark.createDataFrame(
        [("conv-new", 0, "user",
          "alpha words only", "note holds zanzibar keyword", 1.0, False,
          __import__("datetime").datetime(2024, 6, 1), ["tag0"])],
        mixed_df.schema,
    )
    idx.process_batch(batch, batch_id=0)
    # zanzibar is a brand-new term: invisible until the dictionary
    # rebuild (documented NRT trade) — compact folds the delta in
    idx.compact()
    eng.refresh()
    assert eng.search("zanzibar", k=5, use_wand=False).count() == 1
