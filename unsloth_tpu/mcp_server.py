"""MCP (Model Context Protocol) stdio server.

Parity target: the reference's MCP subagent connectors (reference:
unsloth_cli/claude_subagent_mcp.py + codex_subagent_mcp.py — a JSON-RPC
stdio server that exposes a local-model "subagent" tool to claude/codex).
TPU-native form: the model runtime IS local, so the tools call our
on-device generate directly instead of shepherding a child agent process.

Protocol surface (MCP over newline-delimited JSON-RPC 2.0 on stdio):
  initialize            -> protocol + capabilities handshake
  tools/list            -> unsloth_generate / unsloth_chat
  tools/call            -> runs the local model, returns content blocks
Unknown methods answer with JSON-RPC -32601; notifications get no reply.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Any, Dict, Optional, Sequence

PROTOCOL_VERSION = "2024-11-05"


@dataclasses.dataclass
class MCPPolicy:
    """Tool policy (the reference's unsloth_cli ships a tool-policy layer
    around its subagent MCP servers): which tools are exposed and the
    resource ceilings a client call may request. Env-configurable:
    UNSLOTH_MCP_TOOLS (comma list), UNSLOTH_MCP_MAX_TOKENS,
    UNSLOTH_MCP_MAX_CALLS, UNSLOTH_MCP_MAX_PROMPT_CHARS."""

    allowed_tools: Optional[Sequence[str]] = None   # None = all
    max_tokens_cap: int = 1024
    max_calls: Optional[int] = None                 # None = unlimited
    max_prompt_chars: int = 200_000

    @classmethod
    def from_env(cls) -> "MCPPolicy":
        tools = os.environ.get("UNSLOTH_MCP_TOOLS")
        calls = os.environ.get("UNSLOTH_MCP_MAX_CALLS")
        return cls(
            allowed_tools=[t.strip() for t in tools.split(",") if t.strip()]
            if tools else None,
            max_tokens_cap=int(os.environ.get("UNSLOTH_MCP_MAX_TOKENS",
                                              1024)),
            max_calls=int(calls) if calls else None,
            max_prompt_chars=int(os.environ.get(
                "UNSLOTH_MCP_MAX_PROMPT_CHARS", 200_000)),
        )

    def allows(self, tool: str) -> bool:
        return self.allowed_tools is None or tool in self.allowed_tools

_TOOLS = [
    {
        "name": "unsloth_generate",
        "description": "Complete a raw text prompt with the locally "
                       "served model.",
        "inputSchema": {
            "type": "object",
            "properties": {
                "prompt": {"type": "string"},
                "max_tokens": {"type": "integer", "default": 256},
                "temperature": {"type": "number", "default": 0.7},
            },
            "required": ["prompt"],
        },
    },
    {
        "name": "unsloth_chat",
        "description": "Chat with the locally served model "
                       "(messages rendered through its chat template).",
        "inputSchema": {
            "type": "object",
            "properties": {
                "messages": {"type": "array", "items": {
                    "type": "object",
                    "properties": {"role": {"type": "string"},
                                   "content": {"type": "string"}},
                    "required": ["role", "content"]}},
                "max_tokens": {"type": "integer", "default": 256},
                "temperature": {"type": "number", "default": 0.7},
            },
            "required": ["messages"],
        },
    },
]


class MCPServer:
    def __init__(self, model, tokenizer, server_name: str = "unsloth_tpu",
                 policy: Optional[MCPPolicy] = None):
        self.model = model
        self.tokenizer = tokenizer
        self.server_name = server_name
        self.policy = policy or MCPPolicy.from_env()
        self._calls = 0

    # -- model calls -----------------------------------------------------
    def _generate_text(self, prompt: str, max_tokens: int,
                       temperature: float) -> str:
        from .inference.generate import SamplingParams, generate

        ids = self.tokenizer(prompt)["input_ids"]
        sp = SamplingParams(max_tokens=int(max_tokens),
                            temperature=float(temperature))
        out = generate(self.model, [ids], sp, return_token_ids=True)
        return self.tokenizer.decode(out[0], skip_special_tokens=True)

    def _chat(self, messages, max_tokens: int, temperature: float) -> str:
        if getattr(self.tokenizer, "chat_template", None):
            prompt = self.tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
        else:
            prompt = "\n".join(f"{m['role']}: {m['content']}"
                               for m in messages) + "\nassistant:"
        return self._generate_text(prompt, max_tokens, temperature)

    # -- protocol --------------------------------------------------------
    def handle(self, msg: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        method = msg.get("method")
        msg_id = msg.get("id")
        if msg_id is None:   # notification
            return None

        def ok(result):
            return {"jsonrpc": "2.0", "id": msg_id, "result": result}

        def err(code, message):
            return {"jsonrpc": "2.0", "id": msg_id,
                    "error": {"code": code, "message": message}}

        try:
            if method == "initialize":
                return ok({
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {"listChanged": False}},
                    "serverInfo": {"name": self.server_name,
                                   "version": "1.0"},
                })
            if method == "ping":
                return ok({})
            if method == "tools/list":
                return ok({"tools": [t for t in _TOOLS
                                     if self.policy.allows(t["name"])]})
            if method == "tools/call":
                params = msg.get("params") or {}
                name = params.get("name")
                args = params.get("arguments") or {}
                pol = self.policy
                if not pol.allows(name):
                    return err(-32602,
                               f"tool {name!r} denied by policy")
                if pol.max_calls is not None \
                        and self._calls >= pol.max_calls:
                    return err(-32000, "tool-call budget exhausted "
                                       f"(max_calls={pol.max_calls})")
                prompt_len = len(args.get("prompt", "") or "") + sum(
                    len(str(m.get("content", "")))
                    for m in args.get("messages", []) or [])
                if prompt_len > pol.max_prompt_chars:
                    return err(-32602, "prompt exceeds policy limit "
                                       f"({pol.max_prompt_chars} chars)")
                max_tokens = min(int(args.get("max_tokens", 256)),
                                 pol.max_tokens_cap)
                self._calls += 1
                if name == "unsloth_generate":
                    text = self._generate_text(
                        args["prompt"], max_tokens,
                        args.get("temperature", 0.7))
                elif name == "unsloth_chat":
                    text = self._chat(
                        args["messages"], max_tokens,
                        args.get("temperature", 0.7))
                else:
                    return err(-32602, f"unknown tool {name!r}")
                return ok({"content": [{"type": "text", "text": text}],
                           "isError": False})
            return err(-32601, f"method {method!r} not found")
        except Exception as e:  # tool errors become result-level errors
            return ok({"content": [{"type": "text",
                                    "text": f"error: {e}"}],
                       "isError": True})

    def serve(self, stdin=None, stdout=None) -> None:
        """Newline-delimited JSON-RPC loop (blocks until EOF)."""
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue
            resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="unsloth_tpu MCP server")
    p.add_argument("--model_name", required=True)
    p.add_argument("--load_in_4bit", action="store_true", default=True)
    args = p.parse_args(argv)
    from .models.loader import FastLanguageModel

    model, tok = FastLanguageModel.from_pretrained(
        args.model_name, load_in_4bit=args.load_in_4bit)
    MCPServer(model, tok).serve()
    return 0


if __name__ == "__main__":
    sys.exit(main())
