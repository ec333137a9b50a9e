"""Supply-chain audit (reference: scripts/scan_packages.py +
lockfile_supply_chain_audit.py, tests/security/)."""

import json
import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "audit_deps.py")


def _run(*args, env=None):
    return subprocess.run([sys.executable, SCRIPT, *args],
                          capture_output=True, text=True, env=env)


def test_lock_and_verify_roundtrip(tmp_path, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location("audit", SCRIPT)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    lock = tmp_path / "deps.lock.json"
    monkeypatch.setattr(m, "LOCK_PATH", str(lock))
    assert m.cmd_lock() == 0
    data = json.loads(lock.read_text())
    assert "jax" in data["packages"]
    assert m.cmd_verify() == 0

    # tamper: change a locked core version -> fatal
    data["packages"]["jax"]["version"] = "0.0.0"
    lock.write_text(json.dumps(data))
    assert m.cmd_verify() == 1

    # tamper: flip a record hash -> fatal
    assert m.cmd_lock() == 0
    data = json.loads(lock.read_text())
    data["packages"]["numpy"]["record_sha256"] = "0" * 64
    lock.write_text(json.dumps(data))
    assert m.cmd_verify() == 1


def test_repo_lockfile_matches_environment():
    """The committed deps.lock.json must match this image (the drift
    alarm the reference's pinned-symbol tests provide)."""
    r = _run("verify")
    assert r.returncode == 0, r.stdout + r.stderr
