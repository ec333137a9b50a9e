"""RAG engine tests: chunking, KB/doc CRUD, sha dedupe, cosine search
relevance, and the studio HTTP routes (reference:
studio/backend/routes/rag.py + core/rag/)."""

import json
import urllib.request

import numpy as np
import pytest

from unsloth_tpu.studio.rag import HashEmbedder, RagStore, chunk_text

DOC_A = """The TPU v5e chip has 16 GB of HBM and a 128x128 systolic array.

Matrix multiplies run on the MXU in bfloat16 with fp32 accumulation.

Pallas kernels tile the last two dimensions to (8, 128) lanes."""

DOC_B = """Sourdough bread needs a mature starter and long fermentation.

Bake at 240C in a dutch oven for the first twenty minutes for oven
spring, then uncovered until the crust is deep brown."""


def test_chunk_text_packs_and_overlaps():
    text = "\n\n".join(f"paragraph {i} " + "x" * 80 for i in range(20))
    chunks = chunk_text(text, chunk_chars=300, overlap=60)
    assert len(chunks) > 3
    assert all(len(c) <= 300 + 2 for c in chunks)
    # overlap: consecutive chunks share tail/head content
    assert chunks[0][-20:] in chunks[1] or chunks[1][:20] in chunks[0]
    # oversized single paragraph still splits
    big = chunk_text("y" * 5000, chunk_chars=1000, overlap=100)
    assert len(big) >= 5
    assert "".join(c[:900] for c in big).startswith("y" * 900)


def test_hash_embedder_deterministic_and_normalized():
    e = HashEmbedder(dim=128)
    v1 = e(["hello tpu world", "other text"])
    v2 = e(["hello tpu world", "other text"])
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_allclose(np.linalg.norm(v1, axis=1), 1.0,
                               atol=1e-5)
    # related texts are closer than unrelated ones
    a, b, c = e(["the tpu chip hbm", "tpu chip memory hbm",
                 "sourdough bread starter"])
    assert a @ b > a @ c


def test_rag_store_crud_and_search(tmp_path):
    store = RagStore(str(tmp_path / "rag.sqlite"))
    kb = store.create_kb("hardware")
    with pytest.raises(RuntimeError):
        store.create_kb("hardware")

    d1 = store.add_document(kb["id"], "tpu.md", DOC_A)
    assert d1["n_chunks"] >= 1 and not d1["deduped"]
    d2 = store.add_document(kb["id"], "tpu-again.md", DOC_A)
    assert d2["deduped"] and d2["id"] == d1["id"]
    store.add_document(kb["id"], "bread.md", DOC_B)

    kbs = store.list_kbs()
    assert kbs[0]["n_docs"] == 2 and kbs[0]["n_chunks"] >= 2

    hits = store.search(kb["id"], "how much HBM memory does the chip have")
    assert hits and "HBM" in hits[0]["text"]
    hits = store.search(kb["id"], "baking sourdough in a dutch oven")
    assert "dutch oven" in hits[0]["text"]

    ctx = store.context_for(kb["id"], "systolic array matmul", k=2)
    assert "systolic" in ctx

    store.delete_doc(kb["id"], d1["id"])
    assert len(store.list_docs(kb["id"])) == 1
    store.delete_kb(kb["id"])
    with pytest.raises(FileNotFoundError):
        store.list_docs(kb["id"])


def test_rag_store_persists(tmp_path):
    path = str(tmp_path / "rag.sqlite")
    store = RagStore(path)
    kb = store.create_kb("persist")
    store.add_document(kb["id"], "a.md", DOC_A)
    reopened = RagStore(path)
    hits = reopened.search(kb["id"], "pallas kernels lanes")
    assert hits and "Pallas" in hits[0]["text"]


TOKEN = "rag-test-token"


def _req(url, path, body=None, token=TOKEN):
    data = json.dumps(body).encode() if body is not None else None
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url + path, data=data, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_rag_http_routes(tmp_path):
    from unsloth_tpu.studio.server import StudioServer

    srv = StudioServer(workdir=str(tmp_path / "jobs"), token=TOKEN)
    httpd = srv.serve(port=18374, background=True)
    url = "http://127.0.0.1:18374"
    try:
        code, _ = _req(url, "/api/rag/kbs", token=None)
        assert code == 401

        code, kb = _req(url, "/api/rag/kbs", {"name": "kb1"})
        assert code == 200 and kb["id"].startswith("kb-")

        code, doc = _req(url, "/api/rag/docs",
                         {"kb_id": kb["id"], "name": "tpu.md",
                          "text": DOC_A})
        assert code == 200 and doc["n_chunks"] >= 1

        code, out = _req(url, "/api/rag/kbs")
        assert code == 200 and out["kbs"][0]["n_docs"] == 1

        code, out = _req(url, f"/api/rag/docs?kb={kb['id']}")
        assert code == 200 and out["docs"][0]["name"] == "tpu.md"

        code, out = _req(url, "/api/rag/search",
                         {"kb_id": kb["id"], "query": "HBM memory"})
        assert code == 200 and "HBM" in out["hits"][0]["text"]

        code, _ = _req(url, "/api/rag/search",
                       {"kb_id": "kb-none", "query": "x"})
        assert code == 404

        code, _ = _req(url, "/api/rag/docs/delete",
                       {"kb_id": kb["id"], "doc_id": doc["id"]})
        assert code == 200
        code, _ = _req(url, "/api/rag/kbs/delete", {"id": kb["id"]})
        assert code == 200
        code, out = _req(url, "/api/rag/kbs")
        assert out["kbs"] == []
    finally:
        httpd.shutdown()
