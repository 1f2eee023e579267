"""Plan lint across the ENTIRE query registry: physical-plan hygiene
that must hold at 100 TB regardless of what the small-SF timings say.

For every entry in QUERIES (built against sf0.001, planning only — no
execution): no CartesianProduct, no BroadcastNestedLoopJoin (the two
shapes Catalyst falls back to when a join has no usable equi-condition
— each is O(|L|x|R|) at scale), and parquet scans project a subset of
columns (column pruning reached the reader).
"""

SF_DIR = "/root/testdata/sf0.001"

# Plans allowed to contain a nested-loop/cartesian shape, with why.
# (Currently none — additions need a written justification here.)
ALLOWED_NESTED_LOOP: dict[str, str] = {}


def test_no_cartesian_or_nested_loop_joins(spark):
    bad = {}
    from marlin_spark.entry_queries import QUERIES

    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for shape in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if shape in plan and name not in ALLOWED_NESTED_LOOP:
                bad[name] = shape
    assert not bad, f"O(LxR) join shapes in: {bad}"


def test_scans_prune_columns(spark):
    """Every parquet scan in every registered plan reads a strict subset
    of its table's columns unless the query genuinely needs them all —
    approximated by flagging scans whose ReadSchema lists every column
    of the widest table (documents: 8+ cols incl. full text)."""
    from marlin_spark.entry_queries import QUERIES

    docs_cols = {
        f.name
        for f in spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    }
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        for seg in plan.split("ReadSchema: ")[1:]:
            schema_line = seg.splitlines()[0]
            read = {
                c.split(":")[0].strip()
                for c in schema_line.strip("struct<>").split(",")
                if c.strip()
            }
            if not read:
                continue
            # only the documents table has this full column set, so a
            # superset read means an unpruned full-width documents scan
            if read >= docs_cols:
                offenders.append((name, sorted(read)))
    assert not offenders, f"full-width documents scans in: {offenders}"
