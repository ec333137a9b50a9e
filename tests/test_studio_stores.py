"""Settings / prompts / MCP-registry routes (reference:
studio/backend/routes/{settings,prompts,mcp_servers}.py)."""

import json
import urllib.request

TOKEN = "stores-test-token"


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


def test_settings_prompts_mcp_routes(tmp_path):
    from unsloth_tpu.studio.server import StudioServer

    srv = StudioServer(workdir=str(tmp_path / "jobs"), token=TOKEN)
    httpd = srv.serve(port=18378, background=True)
    url = "http://127.0.0.1:18378"
    try:
        code, _ = _req(url, "/api/settings", token=None)
        assert code == 401

        # settings: merge semantics, None deletes, credentials dropped
        code, out = _req(url, "/api/settings",
                         {"upload_limit_mb": 50, "embedding_model": "e5",
                          "hf_api_key": "SECRET"})
        assert code == 200
        assert out["settings"] == {"upload_limit_mb": 50,
                                   "embedding_model": "e5"}
        code, out = _req(url, "/api/settings",
                         {"upload_limit_mb": None, "theme": "dark"})
        assert out["settings"] == {"embedding_model": "e5",
                                   "theme": "dark"}
        code, out = _req(url, "/api/settings")
        assert out["settings"]["theme"] == "dark"

        # prompts: upsert by name, delete by id
        code, p1 = _req(url, "/api/prompts",
                        {"name": "summarize", "text": "Summarize: {doc}"})
        assert code == 200 and p1["id"].startswith("p-")
        _req(url, "/api/prompts", {"name": "summarize", "text": "v2"})
        code, ls = _req(url, "/api/prompts")
        assert len(ls["entries"]) == 1 and ls["entries"][0]["text"] == "v2"
        code, _ = _req(url, "/api/prompts/delete",
                       {"id": ls["entries"][0]["id"]})
        assert code == 200
        code, _ = _req(url, "/api/prompts/delete", {"id": "p-none"})
        assert code == 404

        # mcp servers: env values never round-trip
        code, m = _req(url, "/api/mcp/servers",
                       {"name": "local", "command": "python",
                        "args": ["-m", "unsloth_tpu.mcp_server"],
                        "env": {"API_TOKEN": "SECRET"}})
        assert code == 200
        code, ls = _req(url, "/api/mcp/servers")
        assert ls["servers"][0]["env"] == {"API_TOKEN": "***"}
        code, _ = _req(url, "/api/mcp/servers/delete", {"id": m["id"]})
        assert code == 200
        code, ls = _req(url, "/api/mcp/servers")
        assert ls["servers"] == []

        # persistence across server instances (same workdir)
        srv2 = StudioServer(workdir=str(tmp_path / "jobs"), token=TOKEN)
        assert srv2.settings_get()["settings"]["theme"] == "dark"
    finally:
        httpd.shutdown()


def test_stats_route(tmp_path):
    from unsloth_tpu.studio.server import StudioServer

    srv = StudioServer(workdir=str(tmp_path / "jobs"), token=TOKEN)
    httpd = srv.serve(port=18380, background=True)
    url = "http://127.0.0.1:18380"
    try:
        _req(url, "/api/datasets")
        _req(url, "/api/datasets")
        code, s = _req(url, "/api/stats")
        assert code == 200
        assert s["uptime_s"] >= 0 and not s["model_loaded"]
        assert s["requests"]["/api/datasets"] == 2
        assert s["training_running"] is False
    finally:
        httpd.shutdown()
