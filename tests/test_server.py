"""OpenAI/Anthropic-compatible server tests: real HTTP requests against a
live server backed by a tiny model (reference: studio inference API
tests)."""

import json
import os
import urllib.request

import numpy as np

import jax
import pytest

from unsloth_tpu.inference.server import InferenceServer
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_params

from tests.test_trainer_grpo import CharTokenizer


@pytest.fixture(scope="module")
def server():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    model = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(0)), tokenizer=CharTokenizer())
    srv = InferenceServer(model, model_name="tiny-test")
    httpd = srv.serve(port=18371, background=True)
    yield "http://127.0.0.1:18371"
    httpd.shutdown()


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_health_and_models(server):
    code, body = _get(server, "/health")
    assert code == 200 and body["status"] == "ok"
    code, body = _get(server, "/v1/models")
    assert body["data"][0]["id"] == "tiny-test"


@pytest.mark.slow
def test_chat_completions(server):
    code, body = _post(server, "/v1/chat/completions", {
        "model": "tiny-test",
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 8, "temperature": 0,
    })
    assert code == 200
    assert body["object"] == "chat.completion"
    assert body["choices"][0]["message"]["role"] == "assistant"
    assert isinstance(body["choices"][0]["message"]["content"], str)
    assert body["usage"]["total_tokens"] > 0


@pytest.mark.slow
def test_anthropic_messages(server):
    code, body = _post(server, "/v1/messages", {
        "model": "tiny-test",
        "system": "be brief",
        "messages": [{"role": "user",
                      "content": [{"type": "text", "text": "hey"}]}],
        "max_tokens": 8,
    })
    assert code == 200
    assert body["type"] == "message"
    assert body["content"][0]["type"] == "text"


def test_completions_endpoint(server):
    code, body = _post(server, "/v1/completions", {
        "prompt": "abc", "max_tokens": 4, "temperature": 0})
    assert code == 200
    assert body["object"] == "text_completion"


def test_responses_endpoint(server):
    """/v1/responses (OpenAI Responses API): string input, instructions,
    and structured input items all resolve; output matches the chat path
    at temperature 0."""
    code, body = _post(server, "/v1/responses", {
        "model": "tiny-test", "input": "hi",
        "max_output_tokens": 8, "temperature": 0})
    assert code == 200
    assert body["object"] == "response"
    assert body["status"] == "completed"
    msg = body["output"][0]
    assert msg["type"] == "message" and msg["role"] == "assistant"
    assert msg["content"][0]["type"] == "output_text"
    assert body["output_text"] == msg["content"][0]["text"]
    assert body["usage"]["total_tokens"] > 0

    # structured input items + instructions == equivalent chat messages
    code, structured = _post(server, "/v1/responses", {
        "instructions": "be brief",
        "input": [{"role": "user", "content": [
            {"type": "input_text", "text": "hi"}]}],
        "max_output_tokens": 8, "temperature": 0})
    assert code == 200
    _, chat = _post(server, "/v1/chat/completions", {
        "messages": [{"role": "system", "content": "be brief"},
                     {"role": "user", "content": "hi"}],
        "max_tokens": 8, "temperature": 0})
    assert structured["output_text"] == \
        chat["choices"][0]["message"]["content"]


@pytest.mark.slow
def test_responses_streaming(server):
    events = _post_sse(server, "/v1/responses",
                       {"input": "hi", "max_output_tokens": 16,
                        "temperature": 0.0, "stream": True})
    kinds = [e for e, _ in events]
    assert kinds[0] == "response.created"
    assert "response.output_text.delta" in kinds
    assert kinds[-1] == "response.completed"
    done = json.loads(events[-1][1])
    assert done["response"]["status"] == "completed"
    text = "".join(json.loads(d)["delta"] for e, d in events
                   if e == "response.output_text.delta")
    assert done["response"]["output"][0]["content"][0]["text"] == text


def test_error_paths(server):
    code, body = _post(server, "/v1/chat/completions", {})
    assert code == 400
    assert "missing field" in body["error"]["message"]
    code, _ = _post(server, "/v1/nope", {})
    assert code == 404


def test_cli_start_agent_env():
    """`unsloth start` connector env composition (reference:
    unsloth_cli/commands/start.py)."""
    from unsloth_tpu.cli_start import agent_env

    env = agent_env("claude", "http://127.0.0.1:8000", model="m")
    assert env["ANTHROPIC_BASE_URL"] == "http://127.0.0.1:8000"
    assert env["ANTHROPIC_MODEL"] == "m"
    env = agent_env("codex", "http://127.0.0.1:8000")
    assert env["OPENAI_BASE_URL"].endswith("/v1")
    import pytest as _p

    with _p.raises(ValueError):
        agent_env("unknown", "x")


@pytest.mark.slow
def test_cli_start_print_env(tmp_path, capsys):
    """start --print-env against a live server prints exports, rc 0."""
    import threading

    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.cli import main
    from unsloth_tpu.inference.server import InferenceServer
    from unsloth_tpu.models.loader import FastLanguageModel

    ckpt = str(tmp_path / "ckpt")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    model, tok = FastLanguageModel.from_pretrained(
        ckpt, load_in_4bit=False, dtype="float32")
    srv = InferenceServer(model, tok, model_name="tiny")
    httpd = srv.serve(port=18373, background=True)
    try:
        rc = main(["start", "claude", "--print-env",
                   "--base_url", "http://127.0.0.1:18373"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "ANTHROPIC_BASE_URL" in out
    finally:
        httpd.shutdown()


def _post_sse(url, path, body):
    """POST and parse an SSE stream into a list of (event, data)."""
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        event = None
        for raw in r:
            line = raw.decode().rstrip("\n")
            if line.startswith("event: "):
                event = line[7:]
            elif line.startswith("data: "):
                data = line[6:]
                events.append((event, data))
                event = None
    return events


@pytest.mark.slow
def test_chat_completions_streaming(server):
    body = {"messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 24, "temperature": 0.0, "seed": 0}
    events = _post_sse(server, "/v1/chat/completions",
                       {**body, "stream": True})
    assert events[-1][1] == "[DONE]"
    chunks = [json.loads(d) for _, d in events[:-1]]
    assert chunks[0]["object"] == "chat.completion.chunk"
    assert chunks[0]["choices"][0]["delta"]["role"] == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    # stream reassembles to the same text the non-stream path returns
    _, full = _post(server, "/v1/chat/completions", body)
    assert text == full["choices"][0]["message"]["content"]


def test_completions_streaming(server):
    events = _post_sse(server, "/v1/completions",
                       {"prompt": "ab", "max_tokens": 16,
                        "temperature": 0.0, "stream": True})
    assert events[-1][1] == "[DONE]"
    chunks = [json.loads(d) for _, d in events[:-1]]
    assert chunks[0]["object"] == "text_completion"
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"


def test_anthropic_messages_streaming(server):
    events = _post_sse(server, "/v1/messages",
                       {"messages": [{"role": "user", "content": "hi"}],
                        "max_tokens": 16, "temperature": 0.0,
                        "stream": True})
    kinds = [e for e, _ in events]
    assert kinds[0] == "message_start"
    assert kinds[1] == "content_block_start"
    assert "content_block_delta" in kinds
    assert kinds[-3:] == ["content_block_stop", "message_delta",
                          "message_stop"]
    start = json.loads(events[0][1])
    assert start["message"]["role"] == "assistant"
    delta = json.loads(events[-2][1])
    assert delta["delta"]["stop_reason"] == "end_turn"


# ---------------------------------------------------------------------------
# Multi-LoRA serving: the OpenAI "model" field selects an adapter
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def adapter_server():
    import dataclasses

    import jax.numpy as jnp

    from unsloth_tpu.models.params import init_lora_tree

    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    model = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(0)), tokenizer=CharTokenizer())

    def mk(seed, scale):
        lora = init_lora_tree(cfg, jax.random.PRNGKey(seed), r=4, alpha=8)
        # fresh LoRA is a no-op (B=0); make it bite
        for layer in lora["layers"]:
            for k, lw in layer.items():
                layer[k] = dataclasses.replace(
                    lw, b=jnp.ones_like(lw.b) * scale)
        return lora

    srv = InferenceServer(model, model_name="tiny-base",
                          adapters={"tuned-a": mk(1, 0.5),
                                    "tuned-b": mk(2, -0.5)})
    httpd = srv.serve(port=18377, background=True)
    yield "http://127.0.0.1:18377"
    httpd.shutdown()


def test_adapters_listed(adapter_server):
    code, body = _get(adapter_server, "/v1/models")
    ids = {m["id"] for m in body["data"]}
    assert {"tiny-base", "tuned-a", "tuned-b"} <= ids


@pytest.mark.slow
def test_adapter_selection_changes_output(adapter_server):
    def ask(model_name):
        code, body = _post(adapter_server, "/v1/chat/completions", {
            "model": model_name,
            "messages": [{"role": "user", "content": "hello there"}],
            "max_tokens": 12, "temperature": 0})
        assert code == 200, body
        return body["choices"][0]["message"]["content"]

    base = ask("tiny-base")          # unknown name -> default (no lora)
    a = ask("tuned-a")
    b = ask("tuned-b")
    explicit_base = ask("base")
    assert a != base
    assert b != base
    assert a != b
    assert explicit_base == base


def test_stop_sequences(server):
    """OpenAI `stop` strings truncate the completion."""
    code, full = _post(server, "/v1/chat/completions", {
        "model": "tiny-test",
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 12, "temperature": 0})
    text = full["choices"][0]["message"]["content"]
    if len(text) < 3:
        pytest.skip("completion too short to split")
    stop = text[2]
    code, cut = _post(server, "/v1/chat/completions", {
        "model": "tiny-test",
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 12, "temperature": 0, "stop": [stop]})
    got = cut["choices"][0]["message"]["content"]
    assert got == text.split(stop)[0]


@pytest.mark.slow
def test_embeddings_endpoint():
    """/v1/embeddings backed by a FastSentenceTransformer handle."""
    from unsloth_tpu.models.sentence_transformer import (
        SentenceTransformerModel)

    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    lm = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(3)), tokenizer=CharTokenizer())
    st = SentenceTransformerModel(lm=lm, pooling="mean")
    srv = InferenceServer(lm, model_name="tiny-embed", embed_model=st)
    httpd = srv.serve(port=18381, background=True)
    try:
        code, body = _post("http://127.0.0.1:18381", "/v1/embeddings",
                           {"model": "tiny-embed",
                            "input": ["hello world", "hi"]})
        assert code == 200, body
        assert body["object"] == "list"
        assert len(body["data"]) == 2
        emb = np.asarray(body["data"][0]["embedding"])
        assert emb.shape == (32,)
        np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-4)
        ref = st.encode(["hello world"])[0]
        np.testing.assert_allclose(emb, ref, atol=1e-5)
        # string input also accepted
        code, one = _post("http://127.0.0.1:18381", "/v1/embeddings",
                          {"input": "hello"})
        assert code == 200 and len(one["data"]) == 1
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_cli_inference_one_shot(tmp_path, capsys):
    """`unsloth inference` (reference CLI subcommand roster): one-shot
    prompt -> completion on stdout, rc 0."""
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from tests.test_gguf_loader import _make_bpe_tokenizer_json
    from unsloth_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    cfg = dict(TINY_LLAMA)
    cfg["vocab_size"] = 320   # >= the tiny BPE's trained vocab
    cfg["bos_token_id"], cfg["eos_token_id"] = 0, 1
    make_hf_checkpoint(ckpt, cfg)
    _make_bpe_tokenizer_json(ckpt)
    rc = main(["inference", "--model_name", ckpt, "--prompt", "ab",
               "--max_new_tokens", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert isinstance(out, str)


def test_tool_call_parsing():
    """Tool-call extraction from the formats the catalogued chat
    templates produce (qwen <tool_call> blocks, bare llama-3.1 JSON)."""
    parse = InferenceServer._parse_tool_calls
    calls, rest = parse(
        'Let me check.\n<tool_call>{"name": "get_weather", '
        '"arguments": {"city": "SF"}}</tool_call>')
    assert calls == [{"name": "get_weather",
                      "arguments": {"city": "SF"}}]
    assert rest == "Let me check."
    # two calls in one turn
    calls, rest = parse(
        '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
        '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    assert [c["name"] for c in calls] == ["a", "b"] and rest == ""
    # llama-3.1 style bare JSON (uses "parameters")
    calls, rest = parse('{"name": "f", "parameters": {"q": "hi"}}')
    assert calls == [{"name": "f", "arguments": {"q": "hi"}}] \
        and rest == ""
    # plain text untouched
    calls, rest = parse("just an answer")
    assert calls == [] and rest == "just an answer"


def test_chat_completion_tool_calls(server, monkeypatch):
    """OpenAI tools round-trip: tools in -> tool_calls message out with
    finish_reason tool_calls; tool-result turns render back into the
    prompt (the `unsloth start claude|codex` agent-loop contract)."""
    from unsloth_tpu.inference import server as srv_mod

    canned = ('<tool_call>{"name": "get_weather", '
              '"arguments": {"city": "SF"}}</tool_call>')
    monkeypatch.setattr(
        srv_mod.InferenceServer, "_gen_text",
        lambda self, prompt, params, lora=None: canned)
    tools = [{"type": "function", "function": {
        "name": "get_weather", "description": "weather lookup",
        "parameters": {"type": "object", "properties": {
            "city": {"type": "string"}}}}}]
    code, body = _post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "weather in SF?"}],
        "tools": tools, "max_tokens": 32, "temperature": 0})
    assert code == 200
    choice = body["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    tc = choice["message"]["tool_calls"][0]
    assert tc["type"] == "function"
    assert tc["function"]["name"] == "get_weather"
    assert json.loads(tc["function"]["arguments"]) == {"city": "SF"}

    # follow-up turn carrying the tool result must round-trip (200)
    code, body2 = _post(server, "/v1/chat/completions", {
        "messages": [
            {"role": "user", "content": "weather in SF?"},
            {"role": "assistant", "content": None,
             "tool_calls": [tc]},
            {"role": "tool", "tool_call_id": tc["id"],
             "content": "72F sunny"}],
        "tools": tools, "max_tokens": 16, "temperature": 0})
    assert code == 200


def test_anthropic_tool_use(server, monkeypatch):
    """Anthropic tools: input_schema accepted, tool_use block + stop
    reason tool_use out; tool_result turns round-trip."""
    from unsloth_tpu.inference import server as srv_mod

    canned = ('<tool_call>{"name": "read_file", '
              '"arguments": {"path": "/a"}}</tool_call>')
    monkeypatch.setattr(
        srv_mod.InferenceServer, "_gen_text",
        lambda self, prompt, params, lora=None: canned)
    tools = [{"name": "read_file", "description": "read a file",
              "input_schema": {"type": "object", "properties": {
                  "path": {"type": "string"}}}}]
    code, body = _post(server, "/v1/messages", {
        "messages": [{"role": "user", "content": "read /a"}],
        "tools": tools, "max_tokens": 32})
    assert code == 200
    assert body["stop_reason"] == "tool_use"
    block = [b for b in body["content"] if b["type"] == "tool_use"][0]
    assert block["name"] == "read_file"
    assert block["input"] == {"path": "/a"}

    code, _ = _post(server, "/v1/messages", {
        "messages": [
            {"role": "user", "content": "read /a"},
            {"role": "assistant", "content": [
                {"type": "tool_use", "id": block["id"],
                 "name": "read_file", "input": {"path": "/a"}}]},
            {"role": "user", "content": [
                {"type": "tool_result", "tool_use_id": block["id"],
                 "content": "contents"}]}],
        "tools": tools, "max_tokens": 16})
    assert code == 200


def test_streaming_tool_calls(server, monkeypatch):
    """Tool calls in BOTH streaming APIs: markup split across stream
    chunks is buffered, parsed, and emitted as delta.tool_calls (OpenAI)
    / tool_use + input_json_delta blocks (Anthropic) — what streaming
    agent clients (`unsloth start claude`) actually consume."""
    from unsloth_tpu.inference import server as srv_mod

    def canned_stream(self, prompt, params, lora=None):
        yield '<tool_call>{"name": "f",'
        yield ' "arguments": {"x": 1}}</tool_call>'
    monkeypatch.setattr(srv_mod.InferenceServer, "_gen_stream",
                        canned_stream)
    tools = [{"type": "function", "function": {
        "name": "f", "parameters": {"type": "object"}}}]
    events = _post_sse(server, "/v1/chat/completions",
                       {"messages": [{"role": "user", "content": "go"}],
                        "tools": tools, "stream": True,
                        "max_tokens": 16, "temperature": 0})
    chunks = [json.loads(d) for _, d in events if d != "[DONE]"]
    tc_chunks = [c for c in chunks
                 if c["choices"][0]["delta"].get("tool_calls")]
    assert len(tc_chunks) == 1
    tc = tc_chunks[0]["choices"][0]["delta"]["tool_calls"][0]
    assert tc["function"]["name"] == "f"
    assert json.loads(tc["function"]["arguments"]) == {"x": 1}
    assert chunks[-1]["choices"][0]["finish_reason"] == "tool_calls"

    events = _post_sse(server, "/v1/messages",
                       {"messages": [{"role": "user", "content": "go"}],
                        "tools": [{"name": "f",
                                   "input_schema": {"type": "object"}}],
                        "stream": True, "max_tokens": 16})
    payloads = [json.loads(d) for _, d in events]
    starts = [p for p in payloads if p["type"] == "content_block_start"
              and p["content_block"]["type"] == "tool_use"]
    assert starts and starts[0]["content_block"]["name"] == "f"
    jdeltas = [p for p in payloads if p["type"] == "content_block_delta"
               and p["delta"]["type"] == "input_json_delta"]
    assert json.loads(jdeltas[0]["delta"]["partial_json"]) == {"x": 1}
    mdelta = [p for p in payloads if p["type"] == "message_delta"][0]
    assert mdelta["delta"]["stop_reason"] == "tool_use"


def test_responses_function_calls(server, monkeypatch):
    """Responses API function calling: flat tool defs in, function_call
    output items out; function_call / function_call_output input items
    round-trip into the next turn's prompt."""
    from unsloth_tpu.inference import server as srv_mod

    canned = ('<tool_call>{"name": "lookup", '
              '"arguments": {"q": "x"}}</tool_call>')
    monkeypatch.setattr(
        srv_mod.InferenceServer, "_gen_text",
        lambda self, prompt, params, lora=None: canned)
    tools = [{"type": "function", "name": "lookup",
              "parameters": {"type": "object", "properties": {
                  "q": {"type": "string"}}}}]
    code, body = _post(server, "/v1/responses", {
        "input": "find x", "tools": tools,
        "max_output_tokens": 32, "temperature": 0})
    assert code == 200
    fc = [o for o in body["output"] if o["type"] == "function_call"][0]
    assert fc["name"] == "lookup"
    assert json.loads(fc["arguments"]) == {"q": "x"}

    code, _ = _post(server, "/v1/responses", {
        "input": [
            {"role": "user", "content": "find x"},
            {"type": "function_call", "call_id": fc["call_id"],
             "name": "lookup", "arguments": fc["arguments"]},
            {"type": "function_call_output", "call_id": fc["call_id"],
             "output": "found it"}],
        "tools": tools, "max_output_tokens": 16, "temperature": 0})
    assert code == 200


@pytest.mark.slow
def test_cli_export_lora_roundtrip(tmp_path, capsys):
    """`unsloth export --format lora` (the Studio export tab's
    adapter-only option; reference save_method="lora"): train-shaped
    adapter in, peft-compatible adapter dir out, loadable back."""
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.cli import main
    from unsloth_tpu.models.loader import FastLanguageModel

    ckpt = str(tmp_path / "ckpt")
    make_hf_checkpoint(ckpt, TINY_LLAMA)

    # fabricate a trained adapter the way the studio worker leaves one
    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=False,
                                                 dtype="float32")
    model.get_peft_model(r=4, lora_alpha=4)
    adapter_in = str(tmp_path / "adapter_in")
    model.save_lora(adapter_in)

    out = str(tmp_path / "adapter_out")
    rc = main(["export", "--model_name", ckpt, "--adapter", adapter_in,
               "--output", out, "--format", "lora"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    assert os.path.exists(os.path.join(out, "adapter_config.json"))

    # the exported adapter loads back into a fresh model
    model2, _ = FastLanguageModel.from_pretrained(
        ckpt, load_in_4bit=False, dtype="float32")
    model2.load_lora(out)
    assert model2.lora is not None
