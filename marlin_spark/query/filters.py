"""MongoDB-style JSON filter tree -> Catalyst Column (SURVEY.md §2.4).

Grammar (reference: parse_filter /root/reference/src/main/filter.c:317-348,
operator registry filter.c:359-373):
    {field: value}                      equality
    {field: {"$op": v, ...}}            comparison ops
    {"$and": [...]} / {"$or": [...]}    boolean combinators
    {"$nin": [...]} (top-level)         NOR
    {a: ..., b: ...}                    implicit AND

Ops: $eq $ne $in $nin $gt $gte $lt $lte. Adjacent $gt/$gte + $lt/$lte on
the same field fuse to a range in the reference (filter.c:199-221) —
Catalyst gets the same effect from And(gt, lt) + parquet min/max stats,
so no explicit fusion is needed.

NULL semantics caveat reproduced deliberately: the reference evaluates
$ne / $nin as a bitmap complement over ALL live docs
(filter_apply.c:77-86,114-125), so documents MISSING the field match.
SQL three-valued logic would drop them; we coalesce to match the
reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CMP = {
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
}


def filter_to_column(tree: dict) -> Column:
    """Compile a filter tree to one Catalyst boolean Column (the whole
    tree evaluates JVM-side in one whole-stage-codegen'd predicate —
    the reference needs a post-order bitmap walk, filter_apply.c:207-213)."""
    if not isinstance(tree, dict) or not tree:
        raise ValueError("filter must be a non-empty object")
    conds = []
    for key, val in tree.items():
        if key == "$and":
            conds.append(_combine([filter_to_column(t) for t in val], "and"))
        elif key == "$or":
            conds.append(_combine([filter_to_column(t) for t in val], "or"))
        elif key == "$nin":
            inner = _combine([filter_to_column(t) for t in val], "or")
            conds.append(~F.coalesce(inner, F.lit(False)))
        elif key.startswith("$"):
            raise ValueError(f"unknown operator {key}")
        else:
            conds.append(_field_cond(key, val))
    return _combine(conds, "and")


def _combine(conds: list[Column], how: str) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = (out & c) if how == "and" else (out | c)
    return out


def _field_cond(field: str, val) -> Column:
    col = F.col(field)
    if not isinstance(val, dict):
        return col == F.lit(val)
    conds = []
    for op, v in val.items():
        if op == "$eq":
            conds.append(col == F.lit(v))
        elif op == "$ne":
            # missing/null field matches $ne in the reference
            conds.append(~F.coalesce(col == F.lit(v), F.lit(False)))
        elif op == "$in":
            conds.append(col.isin(list(v)))
        elif op == "$nin":
            conds.append(~F.coalesce(col.isin(list(v)), F.lit(False)))
        elif op in _CMP:
            conds.append(_CMP[op](col, F.lit(v)))
        else:
            raise ValueError(f"unknown operator {op} on field {field}")
    return _combine(conds, "and")
