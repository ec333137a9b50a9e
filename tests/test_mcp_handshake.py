"""Cross-process MCP handshake: spawn the REAL `unsloth_tpu mcp` CLI as a
subprocess and drive the full client handshake over its stdio pipes —
initialize -> notifications/initialized -> tools/list -> tools/call ->
EOF-clean shutdown (reference: `unsloth start claude --as-subagent`
launches unsloth_cli/claude_subagent_mcp.py the same way; the in-process
tests in test_mcp.py never cross the process boundary)."""

import json
import os
import selectors
import subprocess
import sys

import pytest

from tests.helpers import TINY_LLAMA, make_hf_checkpoint
from tests.test_gguf_loader import _make_bpe_tokenizer_json

# The subprocess cannot be CPU-forced via env (the axon plugin registers
# first); inject the jax.config switch before the CLI main, exactly like
# tests/test_multichip.py's driver-environment subprocesses.
_LOADER = """
import jax, sys
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
from unsloth_tpu.cli import main
sys.exit(main(["mcp", "--model_name", {ckpt!r}, "--no_load_in_4bit"]))
"""


def _read_line(proc, timeout=180.0):
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    if not sel.select(timeout):
        raise TimeoutError("no MCP response within timeout")
    line = proc.stdout.readline()
    sel.close()
    if not line:
        raise EOFError(f"server closed stdout; stderr:\n"
                       f"{proc.stderr.read()[-2000:]}")
    return json.loads(line)


@pytest.mark.slow
def test_mcp_subprocess_handshake(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    _make_bpe_tokenizer_json(ckpt)  # real AutoTokenizer-loadable files
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.Popen(
        [sys.executable, "-c", _LOADER.format(ckpt=ckpt)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        def send(obj):
            proc.stdin.write(json.dumps(obj) + "\n")
            proc.stdin.flush()

        send({"jsonrpc": "2.0", "id": 1, "method": "initialize",
              "params": {"protocolVersion": "2024-11-05",
                         "clientInfo": {"name": "pytest", "version": "0"},
                         "capabilities": {}}})
        r = _read_line(proc)
        assert r["id"] == 1
        assert r["result"]["serverInfo"]["name"] == "unsloth_tpu"

        # notification: must produce NO reply (next read pairs with id 2)
        send({"jsonrpc": "2.0", "method": "notifications/initialized"})

        send({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        r = _read_line(proc)
        assert r["id"] == 2
        names = {t["name"] for t in r["result"]["tools"]}
        assert names == {"unsloth_generate", "unsloth_chat"}
        schemas = {t["name"]: t["inputSchema"] for t in r["result"]["tools"]}
        assert schemas["unsloth_generate"]["type"] == "object"

        send({"jsonrpc": "2.0", "id": 3, "method": "tools/call",
              "params": {"name": "unsloth_generate",
                         "arguments": {"prompt": "hello", "max_tokens": 4,
                                       "temperature": 0.0}}})
        r = _read_line(proc)
        assert r["id"] == 3
        assert r["result"]["isError"] is False
        assert r["result"]["content"][0]["type"] == "text"

        # client hangs up: server must exit cleanly on stdin EOF
        proc.stdin.close()
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
