"""Dynamic mapping: infer per-field index types from an arbitrary table.

The reference discovers field types from the documents themselves as
they stream in and gates indexing on the learned schema
(mapping_extract_field_types / mapping ready flag,
/root/reference/src/main/mapping.c:537-601; type lattice
mapping.c:237-285: string vs text, number, bool, object, array — geo
dead in the reference). This repo's default is the fixed transcript
schema; this module closes the gap for a user pointing the engine at an
arbitrary JSON-ish table.

Spark-first twist: a DataFrame already carries exact TYPES (Catalyst
schema), so unlike the reference we only have to LEARN what the schema
cannot say — whether a string column is full-text (tokenize + index
into postings) or a keyword/facet (filter + aggregate only). That is
decided from a bounded sample: average token count >= TEXT_AVG_TOKENS
and a distinct ratio below KEYWORD_DISTINCT_RATIO marks facets.

    mapping = infer_mapping(spark_df)          # one sample job
    cfg     = config_from_mapping(mapping, base_cfg)
    IndexBuilder(spark, path, cfg).build(df)   # indexed_fields learned

MarlinApp.create_index(auto_mapping=True) wires this in at the same
point the reference learns its mapping (per index, before first build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marlin_spark.config import EngineConfig

# a string column averaging at least this many whitespace tokens in the
# sample indexes as full text; below it, it is a keyword/facet field
TEXT_AVG_TOKENS = 4.0
# ... unless nearly every value is distinct (ids, urls): keyword anyway
KEYWORD_DISTINCT_RATIO = 0.98
SAMPLE_ROWS = 2000


def infer_mapping(df: DataFrame, sample_rows: int = SAMPLE_ROWS) -> dict:
    """One bounded sample job -> {"fields": {name: {...}}, "ready": True}.

    Field kinds (reference type lattice, mapping.c:237-285):
      text      string, indexed into postings (tokenized)
      keyword   string, filter/facet only
      number    int/long/float/double/decimal  -> range filters
      bool      boolean
      timestamp timestamp/date                 -> range filters
      array     element kind recorded; text arrays indexable
      object    struct/map — stored, not indexed (reference recurses
                into objects; flattening is the caller's transform)
    """
    fields: dict[str, dict] = {}
    scols: list[str] = []
    for f in df.schema.fields:
        dt = f.dataType
        if isinstance(dt, T.StringType):
            scols.append(f.name)
            fields[f.name] = {"kind": "text"}  # provisional, sample decides
        elif isinstance(dt, (T.BooleanType,)):
            fields[f.name] = {"kind": "bool", "filterable": True}
        elif isinstance(dt, (T.TimestampType, T.DateType)):
            fields[f.name] = {"kind": "timestamp", "filterable": True}
        elif isinstance(dt, T.NumericType):
            fields[f.name] = {"kind": "number", "filterable": True}
        elif isinstance(dt, T.ArrayType):
            el = "text" if isinstance(dt.elementType, T.StringType) else "other"
            fields[f.name] = {"kind": "array", "element": el}
        else:
            fields[f.name] = {"kind": "object"}
    n = 0
    if scols:
        sample = df.limit(sample_rows).select(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.avg(
                    F.size(F.split(F.trim(F.coalesce(F.col(c), F.lit(""))), r"\s+"))
                ).alias(f"_avg_{c}")
                for c in scols
            ],
            *[
                F.approx_count_distinct(c).alias(f"_dist_{c}")
                for c in scols
            ],
        ).first()
        n = int(sample["_n"])
        for c in scols:
            avg_toks = float(sample[f"_avg_{c}"] or 0.0)
            distinct = int(sample[f"_dist_{c}"] or 0)
            ratio = distinct / n if n else 0.0
            is_text = avg_toks >= TEXT_AVG_TOKENS and not (
                ratio >= KEYWORD_DISTINCT_RATIO and avg_toks < 2 * TEXT_AVG_TOKENS
            )
            fields[c] = {
                "kind": "text" if is_text else "keyword",
                "avg_tokens": round(avg_toks, 2),
                "distinct_ratio": round(ratio, 3),
                "filterable": not is_text,
            }
    # readiness gate: the reference refuses to index before the mapping
    # is learned; here "ready" = sampled rows existed or there are no
    # string columns to decide
    return {
        "fields": fields,
        "ready": bool(n) or not scols,
        "sampled_rows": n,
    }


def config_from_mapping(mapping: dict, base: EngineConfig | None = None) -> EngineConfig:
    """Indexed fields = text columns in schema order (position IS the
    rank-cascade field priority, like the reference's indexedFields
    array — sindex.c:792-893)."""
    if not mapping.get("ready"):
        raise ValueError(
            "mapping not ready: sample saw no rows (reference gates "
            "indexing on a learned mapping, mapping.c:537-601)"
        )
    base = base or EngineConfig()
    indexed = tuple(
        name
        for name, m in mapping["fields"].items()
        if m["kind"] == "text"
    )
    if not indexed:
        raise ValueError("no text fields to index in mapping")
    return base.with_(indexed_fields=indexed)
