"""Application / multi-index surface.

The reference serves many named indexes behind one app: queries carry an
``indexName`` and are routed to the owning index, and a ``requests``
array fans one HTTP call across several index queries with per-entry
success isolation (/root/reference/src/main/app.c:146-210, app.c:120-144
get_index_by_name). Index creation/deletion is the app's index registry
(app.c:add_index/delete handlers; exercised by test/robot/crud.robot).

Spark-first shape: an app is a directory of index catalogs
(``<app_dir>/<index_name>/``). Routing is a dict lookup on the driver;
each index keeps its own SearchEngine (stats snapshot + caches), which
matches the reference's per-index in-memory state. Nothing here touches
the data plane — all heavy work stays in the per-index engines.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from marlin_spark.config import EngineConfig
from marlin_spark.index.build import IndexBuilder
from marlin_spark.query.engine import SearchEngine


class MarlinApp:
    def __init__(self, spark: SparkSession, app_dir: str):
        self.spark = spark
        self.dir = app_dir
        os.makedirs(app_dir, exist_ok=True)
        self._engines: dict[str, SearchEngine] = {}

    # ---------------------------------------------------------- registry
    def index_path(self, name: str) -> str:
        self._check_name(name)
        return os.path.join(self.dir, name)

    def list_indexes(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.dir)
            if os.path.exists(os.path.join(self.dir, d, "stats.json"))
        )

    def create_index(
        self,
        name: str,
        transcripts: DataFrame,
        config: EngineConfig | None = None,
        build_id: str = "build-0",
        auto_mapping: bool = False,
    ) -> dict:
        """Create (or rebuild) a named index from a transcript DataFrame.
        Reference analog: POST /1/indexes + document batch add
        (app.c add_index handler; crud.robot).

        auto_mapping=True learns indexed_fields from the data before the
        first build — the reference's dynamic mapping discovery
        (mapping.c:537-601; see index/mapping.py)."""
        if auto_mapping:
            from marlin_spark.index.mapping import (
                config_from_mapping,
                infer_mapping,
            )

            mapping = infer_mapping(transcripts)
            config = config_from_mapping(mapping, config)
        counters = IndexBuilder(
            self.spark, self.index_path(name), config
        ).build(transcripts, build_id)
        if auto_mapping:
            from marlin_spark.index.catalog import IndexCatalog

            cat = IndexCatalog(self.index_path(name))
            cat.write_json("mapping.json", mapping)
            counters["mapping"] = mapping
        self._engines.pop(name, None)  # drop any stale engine snapshot
        return counters

    def delete_index(self, name: str) -> bool:
        """Drop a named index (app.c index delete handler)."""
        path = self.index_path(name)
        self._engines.pop(name, None)
        if not os.path.exists(path):
            return False
        shutil.rmtree(path)
        return True

    def get_index(self, name: str) -> SearchEngine:
        """get_index_by_name analog (app.c:120-144): unknown names raise."""
        eng = self._engines.get(name)
        if eng is None:
            path = self.index_path(name)
            if not os.path.exists(os.path.join(path, "stats.json")):
                raise KeyError(f"Invalid indexName specified: {name!r}")
            eng = SearchEngine(self.spark, path)
            self._engines[name] = eng
        return eng

    # ------------------------------------------------------------ query
    def query(self, index_name: str, q: str, **kw) -> DataFrame:
        """Route one query to its index (app_index_query analog)."""
        return self.get_index(index_name).search(q, **kw)

    def multi_query(self, requests: list[dict]) -> list[dict]:
        """``requests`` array fan-out (app.c query_app_indexes_handler):
        each entry is {"indexName": ..., "query": ..., **search kwargs};
        failures are isolated per entry exactly like the reference's
        per-result success flag."""
        results = []
        for req in requests:
            try:
                name = req["indexName"]
                q = req.get("query", "")
                kw = {
                    k: v for k, v in req.items()
                    if k not in ("indexName", "query")
                }
                df = self.query(name, q, **kw)
                # execute INSIDE the try: the plan is lazy, so without
                # this a corrupt-index / analysis error would surface at
                # the caller's collect, outside per-entry isolation
                rows = df.collect()
                hits = self.spark.createDataFrame(rows, df.schema)
                results.append({"success": True, "hits": hits})
            except Exception as exc:  # isolate: one bad entry, not the batch
                results.append({"success": False, "error": str(exc)})
        return results

    @staticmethod
    def _check_name(name: str) -> None:
        # block path traversal only — dotted index names are legal
        # (the reference accepts any URL path segment)
        if (
            not name
            or name in (".", "..")
            or "/" in name
            or "\\" in name
            or os.sep in name
        ):
            raise ValueError(f"invalid index name {name!r}")
