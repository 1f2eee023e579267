"""IVF-bucketed ANN: probe semantics, exhaustive-probe exactness, and
the no-Python plan contract (entry parity vs the DuckDB oracle is
covered by test_entry_parity for ann_ivf_topk)."""

import pytest

import marlin_spark.entry_queries as eq

SF_DIR = "/root/testdata/sf0.001"


def _ivf(spark, nprobe):
    """Run the IVF query with a given nprobe (the registered entry is
    fixed-parameter; the function reads the module constant at call
    time)."""
    old = eq._IVF_NPROBE
    eq._IVF_NPROBE = nprobe
    try:
        return eq.ann_ivf_topk(spark, SF_DIR)
    finally:
        eq._IVF_NPROBE = old


def test_exhaustive_probe_equals_brute_force(spark):
    """nprobe = C (probe every bucket) must return exactly the exact
    brute-force top-k — IVF only ever prunes, never rescores."""
    exact = {tuple(r) for r in eq.ann_cosine_topk(spark, SF_DIR).collect()}
    ivf_all = {tuple(r) for r in _ivf(spark, eq._IVF_C).collect()}
    assert ivf_all == exact


def test_narrow_probe_scores_match_exact_scan(spark):
    """Any row a 1-bucket probe returns must carry the same rounded
    score the exact scan assigns it (pruning drops candidates, never
    alters a kept score)."""
    from pyspark.sql import functions as F
    from marlin_spark.entry_queries import _dot_col, _norm_col, _emb, _qvec_lit

    e = _emb(spark, SF_DIR)
    q = _qvec_lit(spark, SF_DIR, 0)
    cos = _dot_col(F.col("embedding"), q) / (
        _norm_col(F.col("embedding")) * _norm_col(q)
    )
    full = {
        r["vec_id"]: r["cos"]
        for r in e.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos, 6).alias("cos"))
        .collect()
    }
    rows = _ivf(spark, 1).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert full[r["vec_id"]] == pytest.approx(r["cos"], abs=1e-9)


def test_ivf_plan_has_no_python_eval(spark):
    """Centroid assignment + scoring must stay JVM-side (whole-stage
    codegen column math): no BatchEvalPython / ArrowEvalPython nodes."""
    df = eq.ann_ivf_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
