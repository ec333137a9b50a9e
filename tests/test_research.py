"""Research-run tests: plan propose/update/approve lifecycle, plan-hash
approval, cancel/retry, extractive cited reports over a RAG KB,
sensitive-key sanitization, durability, and the studio HTTP routes
(reference: studio/backend/routes/research_runs.py)."""

import json
import urllib.request

import pytest

from unsloth_tpu.studio.rag import RagStore
from unsloth_tpu.studio.research import (ResearchManager, plan_hash,
                                         propose_plan, sanitize_config)

DOC = """The v5e chip has 16 GB of HBM and one TensorCore.

The MXU is a 128x128 systolic array running bfloat16 matmuls.

Ring attention rotates KV shards over the ICI links."""


def test_propose_plan_heuristic():
    plan = propose_plan("How much HBM does v5e have and what is the MXU?")
    assert plan["steps"][0]["query"].startswith("How much")
    assert len(plan["steps"]) >= 2  # clause split found the second part
    assert all(s["title"] and s["query"] for s in plan["steps"])


def test_propose_plan_with_model():
    def gen(prompt, max_tokens=512):
        return ('noise {"title": "T", "steps": [{"title": "a", '
                '"query": "find a"}]} trailing')

    plan = propose_plan("anything", generate_fn=gen)
    assert plan == {"title": "T",
                    "steps": [{"title": "a", "query": "find a"}]}
    # broken model output falls back to the heuristic
    plan = propose_plan("what is x", generate_fn=lambda p, **k: "garbage")
    assert plan["steps"][0]["query"] == "what is x"


def test_sanitize_config():
    cfg = {"model": "m", "api_key": "SECRET", "nested": {
        "Authorization": "Bearer x", "ok": 1,
        "list": [{"client_secret": "s", "keep": 2}]}}
    out = sanitize_config(cfg)
    assert out == {"model": "m",
                   "nested": {"ok": 1, "list": [{"keep": 2}]}}


def _kb(tmp_path):
    rag = RagStore(str(tmp_path / "rag.sqlite"))
    kb = rag.create_kb("hw")
    rag.add_document(kb["id"], "tpu.md", DOC)
    return rag, kb["id"]


def test_research_run_lifecycle(tmp_path):
    rag, kb_id = _kb(tmp_path)
    mgr = ResearchManager(str(tmp_path), rag=rag)
    run = mgr.create({"question": "How much HBM does the chip have",
                      "kb_id": kb_id,
                      "config": {"api_key": "LEAK", "model": "m"}})
    rid = run["run_id"]
    assert run["status"] == "awaiting_approval"
    assert run["config"] == {"model": "m"}  # sanitized

    # approving a stale hash is rejected
    with pytest.raises(RuntimeError):
        mgr.approve(rid, run["plan_revision"], "0" * 64)

    # plan edit bumps revision; stale expected_revision conflicts
    new_plan = {"title": "HBM", "steps": [
        {"title": "hbm", "query": "HBM memory per chip"},
        {"title": "mxu", "query": "systolic array size"}]}
    with pytest.raises(RuntimeError):
        mgr.update_plan(rid, new_plan, expected_revision=99)
    run = mgr.update_plan(rid, new_plan, expected_revision=1)
    assert run["plan_revision"] == 2
    assert run["plan_hash"] == plan_hash(run["plan"])

    run = mgr.approve(rid, 2, run["plan_hash"])
    mgr.wait(rid)
    run = mgr.get(rid)
    assert run["status"] == "completed"
    # extractive report cites doc chunks per step
    assert "16 GB" in run["report"] and "systolic" in run["report"]
    assert "#" in run["report"]  # [doc#seq] citations
    ev = mgr.events(rid)
    kinds = [e["event"] for e in ev["events"]]
    assert kinds.count("phase.started") == 2
    assert "run.completed" in kinds

    # durability: a fresh manager sees the completed run
    mgr2 = ResearchManager(str(tmp_path), rag=rag)
    assert mgr2.get(rid)["status"] == "completed"
    assert mgr2.get(rid)["report"] == run["report"]


def test_research_cancel_retry_and_auto_approve(tmp_path):
    rag, kb_id = _kb(tmp_path)
    mgr = ResearchManager(str(tmp_path), rag=rag)
    run = mgr.create({"question": "what is the MXU", "kb_id": kb_id})
    rid = run["run_id"]
    run = mgr.cancel(rid)
    assert run["status"] == "cancelled"
    run = mgr.retry(rid)  # retry re-approves and executes
    mgr.wait(rid)
    assert mgr.get(rid)["status"] == "completed"
    with pytest.raises(RuntimeError):
        mgr.retry(rid)  # completed runs are not retryable

    run = mgr.create({"question": "ICI links", "kb_id": kb_id,
                      "auto_approve": True})
    mgr.wait(run["run_id"])
    assert mgr.get(run["run_id"])["status"] == "completed"
    assert mgr.active() == []

    with pytest.raises(FileNotFoundError):
        mgr.create({"question": "x", "kb_id": "kb-none"})


def test_research_model_synthesis(tmp_path):
    rag, kb_id = _kb(tmp_path)

    def gen(prompt, max_tokens=128):
        assert "Sources:" in prompt
        return "MODEL REPORT"

    mgr = ResearchManager(str(tmp_path), rag=rag, generate_fn=gen)
    run = mgr.create({"question": "HBM size",
                      "plan": {"title": "t", "steps": [
                          {"title": "s", "query": "HBM"}]},
                      "kb_id": kb_id, "auto_approve": True})
    mgr.wait(run["run_id"])
    assert mgr.get(run["run_id"])["report"] == "MODEL REPORT"


TOKEN = "research-test-token"


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


def test_research_http_routes(tmp_path):
    from unsloth_tpu.studio.server import StudioServer

    srv = StudioServer(workdir=str(tmp_path / "jobs"), token=TOKEN)
    httpd = srv.serve(port=18376, background=True)
    url = "http://127.0.0.1:18376"
    try:
        code, _ = _req(url, "/api/research/active", token=None)
        assert code == 401

        # seed a KB through the RAG routes, then research over it
        code, kb = _req(url, "/api/rag/kbs", {"name": "hw"})
        code, _ = _req(url, "/api/rag/docs",
                       {"kb_id": kb["id"], "name": "tpu.md", "text": DOC})

        code, run = _req(url, "/api/research",
                         {"question": "How much HBM does the chip have",
                          "kb_id": kb["id"]})
        assert code == 202 and run["status"] == "awaiting_approval"
        rid = run["run_id"]

        code, act = _req(url, "/api/research/active")
        assert any(r["run_id"] == rid for r in act["runs"])

        code, _ = _req(url, f"/api/research/{rid}/approve",
                       {"plan_revision": 1, "plan_hash": "0" * 64})
        assert code == 409

        code, out = _req(url, f"/api/research/{rid}/approve",
                         {"plan_revision": run["plan_revision"],
                          "plan_hash": run["plan_hash"]})
        # the worker thread may already have finished under load
        assert code == 200 and out["status"] in ("running", "completed")
        srv.research.wait(rid)

        code, got = _req(url, f"/api/research/{rid}")
        assert code == 200 and got["status"] == "completed"
        assert "16 GB" in got["report"]
        code, ev = _req(url, f"/api/research/{rid}/events?after=1")
        assert code == 200 and ev["status"] == "completed"
        assert ev["events"][0]["event"] != "run.created"  # after=1

        code, _ = _req(url, "/api/research/rr-none/cancel", {})
        assert code == 404
    finally:
        httpd.shutdown()
