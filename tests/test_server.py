"""HTTP/JSON API surface (reference src/main/api.c + connect.robot /
crud.robot URL tree) — round-4 verdict "What's missing #5".

Drives the real stdlib server over a socket: create index -> query ->
hydrated query -> multi-query fan-out -> auth enforcement -> clear ->
delete, asserting the same routing/auth semantics test_app.py pins at
the library layer."""

import json
import urllib.request

import pytest

from marlin_spark.oracle.corpus import small_corpus
from marlin_spark.server import API_KEY_HEADER, MarlinServer


@pytest.fixture(scope="module")
def srv(spark, tmp_path_factory):
    s = MarlinServer(
        spark, str(tmp_path_factory.mktemp("httpapp")), port=0
    ).start()
    yield s
    s.stop()


def _call(srv, method, path, body=None, key=None, expect=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={API_KEY_HEADER: key} if key else {},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            status, payload = resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        status, payload = err.code, json.loads(err.read())
    if expect is not None:
        assert status == expect, payload
    return payload


def _docs(n=120):
    return [
        {
            "conv_id": r["conv_id"],
            "turn_idx": r["turn_idx"],
            "role": r["role"],
            "text": r["text"],
            "tool": r["tool"],
            "ts": r["ts"].isoformat(),
        }
        for r in (row.asDict() if hasattr(row, "asDict") else row
                  for row in small_corpus(n))
    ]


def test_create_list_query_roundtrip(srv):
    out = _call(srv, "POST", "/1/indexes",
                {"name": "httpidx", "documents": _docs()}, expect=201)
    assert out["counters"]["n_docs"] > 0
    assert "httpidx" in _call(srv, "GET", "/1/indexes", expect=200)["indexes"]

    info = _call(srv, "GET", "/1/indexes/httpidx/info", expect=200)
    assert info["numDocs"] == out["counters"]["n_docs"]

    hits = _call(srv, "POST", "/1/indexes/httpidx/query",
                 {"q": "the", "k": 5}, expect=200)
    assert hits["nbHits"] == 5
    assert all("docid" in h and "score" in h for h in hits["hits"])
    # scores ranked descending
    scores = [h["score"] for h in hits["hits"]]
    assert scores == sorted(scores, reverse=True)

    hyd = _call(srv, "POST", "/1/indexes/httpidx/query",
                {"q": "the", "k": 3, "hydrate": True}, expect=200)
    assert all("text" in h and "conv_id" in h for h in hyd["hits"])


def test_multi_query_fanout_isolation(srv):
    res = _call(srv, "POST", "/1/indexes/*/query", {
        "requests": [
            {"indexName": "httpidx", "query": "the", "k": 2},
            {"indexName": "missing", "query": "the"},
        ]
    }, expect=200)["results"]
    assert [r["success"] for r in res] == [True, False]
    assert len(res[0]["hits"]) == 2


def test_unknown_paths_and_methods(srv):
    _call(srv, "GET", "/2/indexes", expect=404)
    _call(srv, "POST", "/1/indexes/httpidx/query/extra", expect=404)
    _call(srv, "DELETE", "/1/indexes/nope", expect=404)
    _call(srv, "POST", "/1/indexes/nope/query", {"q": "x"}, expect=404)


def test_key_auth_enforced_once_minted(srv):
    # open app until the first key exists (reference dev mode); the
    # bootstrap key is admin (= the reference's generated master key)
    admin = _call(srv, "POST", "/1/keys", {"scopes": ["admin"]},
                  expect=201)["key"]
    query_key = _call(srv, "POST", "/1/keys",
                      {"scopes": ["query"], "indexes": ["httpidx"]},
                      key=admin, expect=201)["key"]
    # keyless query now rejected
    _call(srv, "POST", "/1/indexes/httpidx/query", {"q": "the"}, expect=403)
    # minted key works, but only on its index scope
    ok = _call(srv, "POST", "/1/indexes/httpidx/query", {"q": "the", "k": 2},
               key=query_key, expect=200)
    assert ok["nbHits"] == 2
    # query-scoped key cannot mint keys (admin)
    _call(srv, "POST", "/1/keys", {"scopes": ["query"]}, key=query_key,
          expect=403)
    # ...and cannot delete indexes (index scope)
    _call(srv, "DELETE", "/1/indexes/httpidx", key=query_key, expect=403)
    # admin key manages everything; delete both -> app open again
    _call(srv, "DELETE", f"/1/keys/{query_key}", key=admin, expect=200)
    _call(srv, "DELETE", f"/1/keys/{admin}", key=admin, expect=200)


def test_clear_and_delete(srv):
    _call(srv, "POST", "/1/indexes/httpidx/clear", expect=200)
    info = _call(srv, "GET", "/1/indexes/httpidx/info", expect=200)
    assert info["numDocs"] == 0
    assert _call(srv, "DELETE", "/1/indexes/httpidx", expect=200) == {
        "deleted": "httpidx"
    }
    assert _call(srv, "GET", "/1/indexes", expect=200)["indexes"] == []
