import pytest


@pytest.fixture(scope="session")
def spark():
    from marlin_spark.session import get_spark

    s = get_spark("marlin-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_rows():
    from marlin_spark.oracle.corpus import tiny_corpus

    return tiny_corpus()


@pytest.fixture(scope="session")
def tiny_df(spark, tiny_rows):
    return spark.createDataFrame(tiny_rows)


@pytest.fixture(scope="session")
def tiny_oracle(tiny_rows):
    from marlin_spark.oracle.bm25 import OracleIndex, assign_docids

    return OracleIndex(assign_docids(tiny_rows))


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_df, tmp_path_factory):
    """Built index over the tiny corpus with small blocks/ranges so that
    multi-block, multi-range and bucket-pruning paths are all exercised."""
    from marlin_spark.config import EngineConfig
    from marlin_spark.index.build import IndexBuilder

    d = str(tmp_path_factory.mktemp("tiny_index"))
    cfg = EngineConfig(block_size=16, range_size=64, n_term_buckets=8)
    builder = IndexBuilder(spark, d, cfg)
    counters = builder.build(tiny_df, build_id="t0")
    return d, cfg, counters
