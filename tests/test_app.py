"""S7 HTTP surface: the Flask routes mirror the reference `app.py:16-96`
envelope-for-envelope — same JSON shapes, same status-code discipline
(400 uninitialized / missing text / bad image, 500 engine failure, 200
with the run_search response shape). Exercised through Flask's test
client against the real Spark-backed facade — no network, full engine.
"""

from __future__ import annotations

import base64

import pytest

from vector_database_app_spark.app import create_app

SOURCE_KEYS = {"doc_name", "page_num", "content_type", "content_id", "content_raw"}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("http_corpus")
    (root / "notes.txt").write_text(
        "spark joins windows and aggregates over parquet tables " * 25
    )
    (root / "vectors.txt").write_text(
        "vector search retrieves the nearest embedding rows " * 25
    )
    return root


@pytest.fixture(scope="module")
def client(spark):
    app = create_app(spark)
    app.config["TESTING"] = True
    return app.test_client()


@pytest.fixture(scope="module")
def initialized(client, corpus, tmp_path_factory):
    store = tmp_path_factory.mktemp("http_store")
    r = client.post("/initialize", json={"save_dir": str(store)})
    assert r.status_code == 200 and "initialized successfully" in r.json["message"]
    r = client.post(
        "/embed", json={"path": str(corpus), "is_folder": True}
    )
    assert r.status_code == 200, r.json
    assert r.json["new_chunks"] > 0
    return client


def test_index_serves_frontend(client):
    r = client.get("/")
    assert r.status_code == 200
    assert b"vector_database_app_spark" in r.data


def test_embed_before_initialize_is_400(spark):
    fresh = create_app(spark).test_client()
    r = fresh.post("/embed", json={"path": "/tmp/x", "is_folder": True})
    assert r.status_code == 400
    assert "not initialized" in r.json["error"]


def test_search_before_initialize_is_400(spark):
    fresh = create_app(spark).test_client()
    r = fresh.post("/search", json={"query": {"text": "hi"}})
    assert r.status_code == 400
    assert "not initialized" in r.json["error"]


def test_initialize_unknown_model_is_400(client, tmp_path_factory):
    r = client.post(
        "/initialize",
        json={
            "save_dir": str(tmp_path_factory.mktemp("bad_store")),
            "text_model": "no-such-model",
        },
    )
    assert r.status_code == 400
    assert "unknown text embedding model" in r.json["error"]


def test_search_returns_reference_response_shape(initialized):
    r = initialized.post(
        "/search", json={"query": {"text": "vector embedding rows"}}
    )
    assert r.status_code == 200
    out = r.json
    assert set(out) == {"response", "sources"}
    assert isinstance(out["response"], str) and out["response"]
    assert out["sources"]
    for s in out["sources"]:
        assert SOURCE_KEYS <= set(s)
    # the store has two docs; the embedding-space hit should be the
    # vectors doc first
    assert out["sources"][0]["doc_name"].endswith("vectors.txt")


def test_search_scoped_location(initialized, corpus):
    r = initialized.post(
        "/search",
        json={
            "query": {"text": "spark joins windows"},
            "search_location": str(corpus / "notes.txt"),
        },
    )
    assert r.status_code == 200
    assert all(
        s["doc_name"].endswith("notes.txt") for s in r.json["sources"]
    )


def test_search_without_text_is_400_parity_quirk(initialized):
    # reference app.py:73-74 requires text even for image-only queries
    img = base64.b64encode(b"fake image bytes").decode()
    r = initialized.post("/search", json={"query": {"image": [img]}})
    assert r.status_code == 400
    assert r.json["error"] == "Search query text is required."


def test_search_invalid_base64_image_is_400(initialized):
    r = initialized.post(
        "/search",
        json={"query": {"text": "hello", "image": ["@@not-base64@@"]}},
    )
    assert r.status_code == 400
    assert "Invalid image format" in r.json["error"]


def test_search_with_valid_image_runs_cross_modal(initialized):
    img = base64.b64encode(b"some image payload bytes").decode()
    r = initialized.post(
        "/search", json={"query": {"text": "vector rows", "image": [img]}}
    )
    assert r.status_code == 200
    assert set(r.json) == {"response", "sources"}


def test_embed_bad_path_is_400(initialized):
    r = initialized.post(
        "/embed", json={"path": "/nonexistent/dir", "is_folder": True}
    )
    assert r.status_code == 400
    assert "error" in r.json


def test_word2vec_lifecycle_over_http(spark, corpus, tmp_path_factory):
    """The full reference lifecycle (app.py:16-94 -> run_search,
    vector_db.py:615-671) on REAL learned weights, no network:
    /initialize with the in-container-trainable `local-word2vec`
    backend, /embed a folder (MLlib Word2Vec fits on this first batch
    and the vectors persist under save_dir), then /search — hits must
    come back in the trained word2vec space (the store's space tags
    gate the cosine join, so a space mismatch returns nothing)."""
    import json
    import os

    client = create_app(spark).test_client()
    store = tmp_path_factory.mktemp("w2v_http_store")
    r = client.post(
        "/initialize",
        json={"save_dir": str(store), "text_model": "local-word2vec"},
    )
    assert r.status_code == 200, r.json
    r = client.post("/embed", json={"path": str(corpus), "is_folder": True})
    assert r.status_code == 200, r.json
    assert r.json["new_chunks"] > 0

    # the model is REAL learned state: vocab x dim word vectors on disk
    w2v_file = os.path.join(str(store), "w2v_vectors.json")
    assert os.path.exists(w2v_file)
    vecs = json.load(open(w2v_file))
    assert vecs and all(len(v) == 64 for v in vecs.values())
    assert {"spark", "vector"} <= set(vecs)  # corpus words were learned

    # every stored text chunk is tagged with the trained space
    chunk_spaces = {
        r2.embedding_space
        for r2 in spark.read.parquet(os.path.join(str(store), "chunks"))
        .filter("content_type = 'text_chunk'")
        .select("embedding_space")
        .distinct()
        .collect()
    }
    assert chunk_spaces == {"w2v-64"}

    r = client.post(
        "/search",
        json={"query": {"text": "vector search nearest embedding rows"}},
    )
    assert r.status_code == 200, r.json
    assert set(r.json) == {"response", "sources"}
    assert r.json["sources"], "w2v-space search returned no hits"
    names = [
        s["doc_name"].rsplit("/", 1)[-1] for s in r.json["sources"]
    ]
    assert set(names) <= {"notes.txt", "vectors.txt"}
    # the query is verbatim vocabulary of vectors.txt — the trained
    # space must rank that document first
    assert names[0] == "vectors.txt"


def test_index_is_nocode_ui_with_live_model_registry(client):
    """The frontend mirrors the reference templates/index.html
    capabilities: model pickers rendered FROM the backend registries
    (so they cannot drift from the engine), embed and search forms
    wired to the three JSON routes."""
    from vector_database_app_spark.api import TEXT_EMBED_MODELS
    from vector_database_app_spark.functions.llm_backends import (
        GEN_BACKENDS,
    )

    html = client.get("/").data.decode()
    for m in list(TEXT_EMBED_MODELS) + list(GEN_BACKENDS):
        assert f'value="{m}"' in html, m
    for route in ("/initialize", "/embed", "/search"):
        assert route in html
    for field in ("save_dir", "embed_path", "query_text",
                  "search_location"):
        assert f'id="{field}"' in html
