"""MCP stdio server tests (reference: unsloth_cli/claude_subagent_mcp.py
JSON-RPC surface), driven through the protocol with a tiny real model."""

import io
import json

import pytest

from tests.helpers import TINY_LLAMA, make_hf_checkpoint
from unsloth_tpu.mcp_server import MCPServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from unsloth_tpu.models.loader import FastLanguageModel

    ckpt = str(tmp_path_factory.mktemp("mcp") / "ckpt")
    make_hf_checkpoint(ckpt, TINY_LLAMA)

    class ToyTok:
        chat_template = None
        eos_token_id = 2
        pad_token_id = 0

        def __call__(self, text, **kw):
            return {"input_ids": [1] + [ord(c) % 100 + 3
                                        for c in text[:16]]}

        def decode(self, ids, **kw):
            return " ".join(str(i) for i in ids)

    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=False,
                                                 dtype="float32")
    model.tokenizer = ToyTok()
    return MCPServer(model, ToyTok())


def _rpc(method, msg_id=1, **params):
    return {"jsonrpc": "2.0", "id": msg_id, "method": method,
            "params": params or None}


def test_initialize_and_list(server):
    r = server.handle(_rpc("initialize"))
    assert r["result"]["serverInfo"]["name"] == "unsloth_tpu"
    assert "tools" in r["result"]["capabilities"]
    r = server.handle(_rpc("tools/list"))
    names = {t["name"] for t in r["result"]["tools"]}
    assert names == {"unsloth_generate", "unsloth_chat"}


def test_unknown_method_and_notification(server):
    r = server.handle(_rpc("bogus/method"))
    assert r["error"]["code"] == -32601
    assert server.handle({"jsonrpc": "2.0", "method": "noti"}) is None


def test_generate_tool_call(server):
    r = server.handle(_rpc(
        "tools/call", name="unsloth_generate",
        arguments={"prompt": "hi", "max_tokens": 4, "temperature": 0.0}))
    assert r["result"]["isError"] is False
    assert r["result"]["content"][0]["type"] == "text"
    assert r["result"]["content"][0]["text"]


def test_chat_tool_and_stdio_loop(server):
    msgs = [
        json.dumps(_rpc("initialize", 1)),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        json.dumps(_rpc("tools/call", 2, name="unsloth_chat",
                        arguments={"messages": [
                            {"role": "user", "content": "hello"}],
                            "max_tokens": 4, "temperature": 0.0})),
    ]
    out = io.StringIO()
    server.serve(stdin=io.StringIO("\n".join(msgs) + "\n"), stdout=out)
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(lines) == 2  # notification got no reply
    assert lines[0]["id"] == 1
    assert lines[1]["result"]["isError"] is False


def test_bad_tool_name(server):
    r = server.handle(_rpc("tools/call", name="nope", arguments={}))
    assert r["error"]["code"] == -32602


def test_mcp_tool_policy(server):
    """Tool-policy layer (reference: the unsloth_cli tool-policy around
    its subagent MCP servers): allowlist, token cap, call budget."""
    from unsloth_tpu.mcp_server import MCPPolicy, MCPServer

    srv = MCPServer(server.model, server.tokenizer, policy=MCPPolicy(
        allowed_tools=["unsloth_generate"], max_tokens_cap=4,
        max_calls=1, max_prompt_chars=50))
    # tools/list filters
    out = srv.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = [t["name"] for t in out["result"]["tools"]]
    assert names == ["unsloth_generate"]
    # denied tool
    out = srv.handle({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                      "params": {"name": "unsloth_chat",
                                 "arguments": {"messages": []}}})
    assert "denied" in out["error"]["message"]
    # prompt-length limit
    out = srv.handle({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                      "params": {"name": "unsloth_generate",
                                 "arguments": {"prompt": "x" * 100}}})
    assert "exceeds" in out["error"]["message"]
    # allowed call runs (token cap applied), then the budget is spent
    out = srv.handle({"jsonrpc": "2.0", "id": 4, "method": "tools/call",
                      "params": {"name": "unsloth_generate",
                                 "arguments": {"prompt": "ab",
                                               "max_tokens": 999}}})
    assert out["result"]["isError"] is False
    out = srv.handle({"jsonrpc": "2.0", "id": 5, "method": "tools/call",
                      "params": {"name": "unsloth_generate",
                                 "arguments": {"prompt": "ab"}}})
    assert "budget" in out["error"]["message"]


def test_mcp_policy_from_env(monkeypatch):
    from unsloth_tpu.mcp_server import MCPPolicy

    monkeypatch.setenv("UNSLOTH_MCP_TOOLS", "unsloth_chat")
    monkeypatch.setenv("UNSLOTH_MCP_MAX_TOKENS", "64")
    monkeypatch.setenv("UNSLOTH_MCP_MAX_CALLS", "3")
    p = MCPPolicy.from_env()
    assert p.allowed_tools == ["unsloth_chat"]
    assert p.max_tokens_cap == 64 and p.max_calls == 3
    assert p.allows("unsloth_chat") and not p.allows("unsloth_generate")
