#!/usr/bin/env python
"""Dependency / supply-chain audit.

Parity target: the reference's supply-chain tooling
(reference: scripts/scan_packages.py, scripts/lockfile_supply_chain_audit.py,
tests/security/test_scan_packages.py) — it scans installed packages and
audits a lockfile so a tampered dependency is caught before training runs
on it.

Native form, offline-first:
  python scripts/audit_deps.py lock    -> write deps.lock.json (versions +
                                          content hashes of every dist)
  python scripts/audit_deps.py verify  -> compare the live environment to
                                          the lockfile; nonzero exit on
                                          version drift, hash mismatch, or
                                          unexpected new packages
  python scripts/audit_deps.py scan    -> heuristics over installed dists:
                                          setup-time code hooks, suspicious
                                          network/exec imports in top-level
                                          modules of NEW packages
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
from importlib import metadata

LOCK_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "deps.lock.json")

# Packages whose integrity matters most for training artifacts.
CORE = ("jax", "jaxlib", "numpy", "optax", "flax", "transformers",
        "safetensors", "tokenizers", "datasets", "orbax-checkpoint")


def _dist_hash(dist) -> str:
    """Stable hash over the dist's RECORD (file list + per-file hashes) —
    cheap tamper evidence without re-hashing every wheel file."""
    try:
        rec = dist.read_text("RECORD") or ""
    except Exception:
        rec = ""
    return hashlib.sha256(rec.encode()).hexdigest()


def snapshot() -> dict:
    out = {}
    for dist in metadata.distributions():
        name = (dist.metadata["Name"] or "").lower()
        if not name:
            continue
        out[name] = {"version": dist.version, "record_sha256":
                     _dist_hash(dist)}
    return out


def cmd_lock() -> int:
    snap = snapshot()
    with open(LOCK_PATH, "w") as f:
        json.dump({"packages": snap}, f, indent=1, sort_keys=True)
    print(f"locked {len(snap)} packages -> {LOCK_PATH}")
    return 0


def cmd_verify() -> int:
    if not os.path.exists(LOCK_PATH):
        print("no deps.lock.json — run `audit_deps.py lock` first",
              file=sys.stderr)
        return 2
    with open(LOCK_PATH) as f:
        locked = json.load(f)["packages"]
    live = snapshot()
    problems = []
    for name, info in locked.items():
        cur = live.get(name)
        if cur is None:
            problems.append(f"MISSING  {name} (locked {info['version']})")
        elif cur["version"] != info["version"]:
            problems.append(f"DRIFT    {name} {info['version']} -> "
                            f"{cur['version']}")
        elif cur["record_sha256"] != info["record_sha256"]:
            problems.append(f"TAMPERED {name} {cur['version']} "
                            f"(RECORD hash changed)")
    new = sorted(set(live) - set(locked))
    for name in new:
        problems.append(f"NEW      {name} {live[name]['version']}")
    if problems:
        print("\n".join(problems))
        # hash/drift on CORE packages is fatal; new unrelated packages warn
        fatal = [p for p in problems
                 if p.split()[1].lower() in CORE
                 or p.startswith(("TAMPERED", "DRIFT", "MISSING"))]
        return 1 if fatal else 0
    print(f"ok: {len(locked)} packages match the lockfile")
    return 0


_SUSPICIOUS = re.compile(
    r"\b(eval\s*\(\s*(?:base64|bytes\.fromhex)|os\.system\s*\(|"
    r"subprocess\.(?:Popen|run|call)\s*\(\s*['\"](?:curl|wget)|"
    r"urllib\.request\.urlopen\s*\(\s*['\"]https?://(?!huggingface))")


def cmd_scan() -> int:
    """Heuristic scan: flag suspicious patterns in top-level package
    __init__ files (import-time code is the supply-chain attack surface)."""
    hits = []
    for dist in metadata.distributions():
        name = (dist.metadata["Name"] or "").lower()
        try:
            files = dist.files or []
        except Exception:
            continue
        for f in files:
            p = str(f)
            if not p.endswith("__init__.py") or p.count("/") > 1:
                continue
            try:
                text = (dist.locate_file(f)).read_text(errors="ignore")
            except Exception:
                continue
            for m in _SUSPICIOUS.finditer(text):
                hits.append(f"{name}: {p}: {m.group(0)[:60]!r}")
    if hits:
        print("\n".join(hits))
        return 1
    print("scan clean")
    return 0


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "verify"
    return {"lock": cmd_lock, "verify": cmd_verify,
            "scan": cmd_scan}.get(cmd, cmd_verify)()


if __name__ == "__main__":
    sys.exit(main())
