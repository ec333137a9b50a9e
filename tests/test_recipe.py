"""Data-recipe engine tests: ops, analysis, job lifecycle, publish,
and the studio HTTP routes (reference:
studio/backend/routes/data_recipe/jobs.py, core/data_recipe/jobs.py)."""

import json
import urllib.request

import pytest

from unsloth_tpu.studio.recipe import (RecipeError, RecipeJobManager,
                                       analyze_rows, run_recipe)

ROWS = [
    {"q": "what is a tpu", "a": "an accelerator", "lang": "en"},
    {"q": "what is a tpu", "a": "an accelerator", "lang": "en"},
    {"q": "qu'est-ce qu'un tpu", "a": "un accelerateur", "lang": "fr"},
    {"q": "what is hbm", "a": "high bandwidth memory", "lang": "en"},
    {"q": "", "a": "empty question", "lang": "en"},
]


def test_run_recipe_op_chain():
    recipe = {
        "source": {"type": "inline", "rows": ROWS},
        "ops": [
            {"op": "filter", "field": "lang", "where": "eq",
             "value": "en"},
            {"op": "filter", "field": "q", "where": "min_len",
             "value": 1},
            {"op": "dedup", "field": "q"},
            {"op": "template", "template": "Q: {q}\nA: {a}",
             "output_field": "text"},
            {"op": "select", "fields": ["text"]},
            {"op": "split", "train_fraction": 0.5, "seed": 0},
        ],
    }
    rows, analysis = run_recipe(recipe)
    assert len(rows) == 2
    assert all(set(r) == {"text", "split"} for r in rows)
    assert rows[0]["text"].startswith("Q: ")
    splits = sorted(r["split"] for r in rows)
    assert splits == ["eval", "train"]
    # stage accounting: filter dropped fr + empty, dedup dropped the dup
    stages = analysis["stages"]
    assert stages[0]["rows_out"] == 4 and stages[2]["rows_out"] == 2
    assert analysis["rows"] == 2
    assert analysis["fields"]["text"]["coverage"] == 1.0


def test_recipe_text_source_and_llm_op():
    calls = []

    def fake_gen(prompt, max_tokens=128):
        calls.append((prompt, max_tokens))
        return "SUMMARY"

    recipe = {
        "source": {"type": "text",
                   "text": "para one\n\npara two\n\npara three",
                   "chunk_chars": 10},
        "ops": [{"op": "llm_generate", "prompt": "Summarize: {text}",
                 "output_field": "summary", "max_tokens": 7}],
    }
    rows, _ = run_recipe(recipe, generate_fn=fake_gen)
    assert len(rows) == 3
    assert all(r["summary"] == "SUMMARY" for r in rows)
    assert calls[0][0].startswith("Summarize: para")
    assert calls[0][1] == 7
    # without a model the llm op is a clear 400-class error
    with pytest.raises(RecipeError):
        run_recipe(recipe)


def test_recipe_errors():
    with pytest.raises(RecipeError):
        run_recipe({"source": {"type": "nope"}})
    with pytest.raises(RecipeError):
        run_recipe({"source": {"type": "inline", "rows": [{"a": 1}]},
                    "ops": [{"op": "unknown_op"}]})
    with pytest.raises(RecipeError):  # template missing field
        run_recipe({"source": {"type": "inline", "rows": [{"a": 1}]},
                    "ops": [{"op": "template", "template": "{missing}"}]})


def test_analyze_rows_stats():
    out = analyze_rows([{"t": "abc"}, {"t": "abcdef"}, {"u": 5}])
    assert out["rows"] == 3
    assert out["fields"]["t"]["present"] == 2
    assert out["fields"]["t"]["len_min"] == 3
    assert out["fields"]["t"]["len_max"] == 6
    assert "len_min" not in out["fields"]["u"]


def test_job_manager_lifecycle_and_publish(tmp_path):
    mgr = RecipeJobManager(str(tmp_path), datasets_dir=str(tmp_path /
                                                           "datasets"))
    out = mgr.create({"name": "r1",
                      "source": {"type": "inline", "rows": ROWS},
                      "ops": [{"op": "dedup"}]})
    jid = out["job_id"]
    mgr.wait(jid)
    assert mgr.status(jid)["status"] == "completed"
    assert mgr.current()["job_id"] == jid
    assert mgr.analysis(jid)["rows"] == 4
    ds = mgr.dataset(jid, offset=1, limit=2)
    assert ds["total"] == 4 and len(ds["rows"]) == 2
    ev = mgr.events(jid)
    assert any(e["event"] == "job.completed" for e in ev["events"])
    pub = mgr.publish(jid, "deduped")
    assert pub["rows"] == 4
    with open(pub["path"]) as f:
        assert len(f.read().strip().splitlines()) == 4
    # published dataset is loadable as a recipe source
    out2 = mgr.create({"source": {"type": "dataset", "name": "deduped"}})
    mgr.wait(out2["job_id"])
    assert mgr.analysis(out2["job_id"])["rows"] == 4


def test_job_manager_error_state(tmp_path):
    mgr = RecipeJobManager(str(tmp_path))
    out = mgr.create({"source": {"type": "inline", "rows": [{"a": 1}]},
                      "ops": [{"op": "filter", "field": "a",
                               "where": "bogus"}]})
    mgr.wait(out["job_id"])
    st = mgr.status(out["job_id"])
    assert st["status"] == "error" and "bogus" in st["error"]
    with pytest.raises(FileNotFoundError):
        mgr.status("recipe-nope")


TOKEN = "recipe-test-token"


def _req(url, path, body=None, method=None, token=TOKEN):
    data = json.dumps(body).encode() if body is not None else None
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url + path, data=data, headers=headers,
                                 method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_recipe_http_routes(tmp_path):
    from unsloth_tpu.studio.server import StudioServer

    srv = StudioServer(workdir=str(tmp_path / "jobs"), token=TOKEN)
    httpd = srv.serve(port=18375, background=True)
    url = "http://127.0.0.1:18375"
    try:
        code, _ = _req(url, "/api/recipe/jobs/current", token=None)
        assert code == 401

        code, out = _req(url, "/api/recipe/jobs", {
            "name": "http-recipe",
            "source": {"type": "inline", "rows": ROWS},
            "ops": [{"op": "filter", "field": "lang", "where": "eq",
                     "value": "en"},
                    {"op": "dedup", "field": "q"}]})
        assert code == 200
        jid = out["job_id"]
        srv.recipes.wait(jid)

        code, st = _req(url, f"/api/recipe/jobs/{jid}/status")
        assert code == 200 and st["status"] == "completed"
        code, cur = _req(url, "/api/recipe/jobs/current")
        assert cur["job_id"] == jid
        code, an = _req(url, f"/api/recipe/jobs/{jid}/analysis")
        assert code == 200 and an["rows"] == 3
        code, ds = _req(url, f"/api/recipe/jobs/{jid}/dataset?limit=2")
        assert code == 200 and ds["total"] == 3 and len(ds["rows"]) == 2
        code, ev = _req(url, f"/api/recipe/jobs/{jid}/events")
        assert code == 200 and ev["status"] == "completed"

        code, pub = _req(url, f"/api/recipe/jobs/{jid}/publish",
                         {"name": "from-recipe"})
        assert code == 200 and pub["rows"] == 3
        # published output appears in the datasets API (wizard handoff)
        code, ls = _req(url, "/api/datasets")
        assert any(d["name"] == "from-recipe" for d in ls["datasets"])

        code, _ = _req(url, "/api/recipe/jobs/nope/status")
        assert code == 404
        code, _ = _req(url, "/api/recipe/jobs",
                       {"source": {"type": "nope"}})
        assert code in (200, 400)  # bad source may fail at create or run
    finally:
        httpd.shutdown()
