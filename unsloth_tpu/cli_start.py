"""`unsloth start <agent>` — connect a coding agent to a local model.

Parity target: the reference's agent-connector CLI (reference:
unsloth_cli/commands/start.py — points claude/codex/hermes at a running
Unsloth server by exporting the agent's base-URL/key env and launching
it). Here the server is our own OpenAI/Anthropic-compatible
InferenceServer (inference/server.py), so the connector reduces to:
ensure a server is up (optionally loading a model), compose the agent's
environment, and exec the agent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from typing import Dict, List, Optional, Tuple

AGENTS = ("claude", "codex", "openai")


def agent_env(agent: str, base_url: str, api_key: str = "unsloth-local",
              model: Optional[str] = None) -> Dict[str, str]:
    """Environment exports that point `agent` at `base_url`."""
    if agent == "claude":
        env = {
            "ANTHROPIC_BASE_URL": base_url,
            "ANTHROPIC_AUTH_TOKEN": api_key,
            "ANTHROPIC_API_KEY": "",
        }
        if model:
            env["ANTHROPIC_MODEL"] = model
            env["ANTHROPIC_SMALL_FAST_MODEL"] = model
        return env
    if agent in ("codex", "openai"):
        env = {
            "OPENAI_BASE_URL": base_url + "/v1",
            "OPENAI_API_KEY": api_key,
        }
        if model:
            env["OPENAI_MODEL"] = model
        return env
    raise ValueError(f"unknown agent {agent!r}; choose from {AGENTS}")


def agent_command(agent: str, extra_args: List[str]) -> List[str]:
    exe = {"claude": "claude", "codex": "codex",
           "openai": "openai"}[agent]
    path = shutil.which(exe)
    if path is None:
        raise FileNotFoundError(
            f"`{exe}` is not installed or not on PATH. Export the env "
            f"printed by `unsloth_tpu start {agent} --print-env` and run "
            f"it yourself.")
    return [path] + extra_args


def probe_server(base_url: str, timeout: float = 2.0) -> bool:
    import urllib.request

    try:
        with urllib.request.urlopen(base_url + "/v1/models",
                                    timeout=timeout):
            return True
    except Exception:
        return False


def cmd_start(args) -> int:
    base_url = args.base_url or f"http://127.0.0.1:{args.port}"
    httpd = None
    if not probe_server(base_url):
        if args.model_name:
            from .inference.server import InferenceServer
            from .models.loader import FastLanguageModel

            model, tok = FastLanguageModel.from_pretrained(
                args.model_name, load_in_4bit=not args.no_4bit)
            srv = InferenceServer(model, tok,
                                  model_name=args.model_name)
            httpd = srv.serve(port=args.port, background=True)
            print(f"serving {args.model_name} at {base_url}")
        else:
            print(f"no server at {base_url} and no --model_name given; "
                  f"start one with `unsloth_tpu serve` first",
                  file=sys.stderr)
            return 1

    env = agent_env(args.agent, base_url, model=args.model_name)
    if args.print_env:
        for k, v in env.items():
            print(f"export {k}={v!r}")
        return 0
    try:
        cmd = agent_command(args.agent, args.agent_args or [])
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        for k, v in env.items():
            print(f"export {k}={v!r}", file=sys.stderr)
        return 1
    full_env = dict(os.environ)
    full_env.update(env)
    proc = subprocess.Popen(cmd, env=full_env)
    try:
        return proc.wait()
    finally:
        if httpd is not None:
            httpd.shutdown()


def add_start_parser(sub):
    p = sub.add_parser(
        "start", help="connect a coding agent (claude/codex) to a local "
                      "model server")
    p.add_argument("agent", choices=AGENTS)
    p.add_argument("--model_name", default=None,
                   help="load + serve this model if no server is running")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--base_url", default=None)
    p.add_argument("--no_4bit", action="store_true")
    p.add_argument("--print-env", dest="print_env", action="store_true",
                   help="print the agent env exports instead of launching")
    p.add_argument("agent_args", nargs="*",
                   help="extra args passed to the agent executable")
    p.set_defaults(func=cmd_start)
    return p
