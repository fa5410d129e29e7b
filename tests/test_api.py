"""A1-A4 serving-surface contract tests (serve.rs envelope + error
mapping), including one real HTTP round-trip through the stdlib shim.
"""

import json
import os
import threading
import urllib.request

import pytest

from letsearch_spark import api


@pytest.fixture(scope="module")
def served(spark, sf_dir, tmp_path_factory):
    from letsearch_spark.collection import Collection

    root = str(tmp_path_factory.mktemp("api_root"))
    c = Collection.create(
        spark, root, name="docs", index_columns=["text"], model_name="stub://16"
    )
    c.import_parquet(os.path.join(sf_dir, "documents.parquet"))
    c.embed_column("text")
    return root


def test_healthcheck_envelope():
    out = api.healthcheck()
    assert set(out) == {"data", "status", "time"}
    assert out["status"] == 200
    assert out["data"]["version"]


def test_list_and_get_collection(served):
    out = api.list_collections(served)
    assert out["status"] == 200
    assert out["data"]["collections"] == [
        {"name": "docs", "index_columns": ["text"]}
    ]
    one = api.get_collection(served, "docs")
    assert one["status"] == 200
    assert one["data"]["name"] == "docs"
    assert api.get_collection(served, "nope")["status"] == 404


def test_search_contract(spark, served):
    out = api.search(spark, served, "docs", "text", "spark join query", limit=3)
    assert out["status"] == 200
    results = out["data"]["results"]
    assert len(results) == 3
    assert set(results[0]) == {"content", "key", "score"}
    scores = [r["score"] for r in results]
    assert scores == sorted(scores, reverse=True)

    assert api.search(spark, served, "docs", "text", "q", limit=0)["status"] == 400
    assert api.search(spark, served, "docs", "text", "q", limit=101)["status"] == 400
    assert api.search(spark, served, "nope", "text", "q")["status"] == 404
    assert api.search(spark, served, "docs", "nope", "q")["status"] == 404


def test_http_roundtrip(spark, served):
    server = api.make_http_server(spark, served, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            health = json.loads(r.read())
        assert health["data"]["status"] == "ok"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/collections/docs/search",
            data=json.dumps(
                {"column_name": "text", "query": "spark join", "limit": 2}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["status"] == 200
        assert len(out["data"]["results"]) == 2
    finally:
        server.shutdown()
