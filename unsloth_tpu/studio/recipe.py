"""Data-recipe engine: declarative dataset pipelines as background jobs.

Parity target: the reference's data-recipe stack (reference:
studio/backend/routes/data_recipe/jobs.py — job create/status/current/
cancel, per-job analysis, dataset fetch, publish; core/data_recipe/jobs.py
job manager; the React node editor builds the recipe graph client-side).

TPU-native form: a recipe is a JSON document — one source plus a list of
ops applied in order — executed by a plain thread with cancel checks and
progress events. No node-graph runtime: the ops ARE the graph, already
topologically sorted by the client. LLM ops call a pluggable
``generate_fn`` (the studio server passes its loaded model's completion
path), so the engine itself stays model- and device-free.

Recipe shape::

    {"name": "my-recipe",
     "source": {"type": "inline", "rows": [...]}
             | {"type": "dataset", "name": "uploaded-name"}
             | {"type": "text", "text": "...", "chunk_chars": 1200},
     "ops": [
       {"op": "filter", "field": "text", "where": "contains",
        "value": "tpu"},                  # eq/ne/contains/min_len/max_len
       {"op": "template", "template": "Q: {q}\\nA: {a}",
        "output_field": "text"},
       {"op": "rename", "field": "old", "to": "new"},
       {"op": "select", "fields": ["text", "label"]},
       {"op": "dedup", "field": "text"},  # field omitted = whole row
       {"op": "shuffle", "seed": 0},
       {"op": "limit", "n": 100},
       {"op": "llm_generate", "prompt": "Summarize: {text}",
        "output_field": "summary", "max_tokens": 128},
       {"op": "split", "field": "split", "train_fraction": 0.9,
        "seed": 0},                        # tags rows train/eval
     ]}
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import threading
import time
import uuid
from typing import Any, Callable, Dict, List, Optional


class RecipeError(TypeError):
    """Invalid recipe or op (TypeError so the studio server's existing
    error mapping turns it into HTTP 400)."""


# ---------------------------------------------------------------------------
# Ops
# ---------------------------------------------------------------------------

def _load_source(source: Dict[str, Any],
                 datasets_dir: Optional[str]) -> List[Dict[str, Any]]:
    kind = source.get("type")
    if kind == "inline":
        rows = source.get("rows")
        if not isinstance(rows, list):
            raise RecipeError("inline source needs a 'rows' list")
        return [dict(r) for r in rows]
    if kind == "dataset":
        if not datasets_dir:
            raise RecipeError("no datasets directory configured")
        name = str(source.get("name", ""))
        path = os.path.join(datasets_dir, name + ".jsonl")
        if not os.path.exists(path):
            raise RecipeError(f"no such dataset: {name!r}")
        rows = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        return rows
    if kind == "text":
        from .rag import chunk_text

        chunks = chunk_text(str(source.get("text", "")),
                            int(source.get("chunk_chars", 1200)),
                            int(source.get("overlap", 0)))
        return [{"text": c} for c in chunks]
    raise RecipeError(f"unknown source type: {kind!r}")


def _op_filter(rows, op):
    field = op["field"]
    where = op.get("where", "eq")
    value = op.get("value")

    def keep(r):
        v = r.get(field)
        if where == "eq":
            return v == value
        if where == "ne":
            return v != value
        if where == "contains":
            return isinstance(v, str) and str(value) in v
        if where == "min_len":
            return v is not None and len(str(v)) >= int(value)
        if where == "max_len":
            return v is not None and len(str(v)) <= int(value)
        raise RecipeError(f"unknown filter where: {where!r}")

    return [r for r in rows if keep(r)]


class _Missing(dict):
    def __missing__(self, key):
        raise RecipeError(f"template references missing field {key!r}")


def _apply_ops(rows: List[Dict[str, Any]], ops: List[Dict[str, Any]],
               generate_fn: Optional[Callable[..., str]],
               progress: Optional[Callable[[Dict[str, Any]], None]] = None,
               cancelled: Optional[Callable[[], bool]] = None,
               ) -> (List[Dict[str, Any]], List[Dict[str, Any]]):
    stages = []
    for i, op in enumerate(ops):
        if cancelled and cancelled():
            raise InterruptedError("cancelled")
        kind = op.get("op")
        n_in = len(rows)
        if kind == "filter":
            rows = _op_filter(rows, op)
        elif kind == "template":
            out = op.get("output_field", "text")
            rows = [{**r, out: op["template"].format_map(_Missing(r))}
                    for r in rows]
        elif kind == "rename":
            field, to = op["field"], op["to"]
            rows = [{(to if k == field else k): v for k, v in r.items()}
                    for r in rows]
        elif kind == "select":
            fields = op["fields"]
            rows = [{k: r[k] for k in fields if k in r} for r in rows]
        elif kind == "dedup":
            field = op.get("field")
            seen, out_rows = set(), []
            for r in rows:
                key = (r.get(field) if field else
                       json.dumps(r, sort_keys=True, default=str))
                if key not in seen:
                    seen.add(key)
                    out_rows.append(r)
            rows = out_rows
        elif kind == "shuffle":
            rows = list(rows)
            random.Random(op.get("seed", 0)).shuffle(rows)
        elif kind == "limit":
            rows = rows[:int(op["n"])]
        elif kind == "llm_generate":
            if generate_fn is None:
                raise RecipeError(
                    "llm_generate op requires a loaded model")
            out = op.get("output_field", "generated")
            new_rows = []
            for j, r in enumerate(rows):
                if cancelled and cancelled():
                    raise InterruptedError("cancelled")
                prompt = op["prompt"].format_map(_Missing(r))
                text = generate_fn(
                    prompt, max_tokens=int(op.get("max_tokens", 128)))
                new_rows.append({**r, out: text})
                if progress and (j + 1) % 8 == 0:
                    progress({"event": "op.progress", "op_index": i,
                              "op": kind, "done": j + 1, "total": n_in})
            rows = new_rows
        elif kind == "split":
            frac = float(op.get("train_fraction", 0.9))
            field = op.get("field", "split")
            rng = random.Random(op.get("seed", 0))
            order = list(range(len(rows)))
            rng.shuffle(order)
            n_train = int(round(len(rows) * frac))
            train_idx = set(order[:n_train])
            rows = [{**r, field: "train" if j in train_idx else "eval"}
                    for j, r in enumerate(rows)]
        else:
            raise RecipeError(f"unknown op: {kind!r}")
        stages.append({"op": kind, "rows_in": n_in, "rows_out": len(rows)})
        if progress:
            progress({"event": "op.done", "op_index": i, "op": kind,
                      "rows": len(rows)})
    return rows, stages


def analyze_rows(rows: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Row count + per-field coverage and string-length stats (the
    reference's /analysis payload summarizing the recipe output)."""
    fields: Dict[str, Dict[str, Any]] = {}
    for r in rows:
        for k, v in r.items():
            st = fields.setdefault(k, {"present": 0, "str_lens": []})
            st["present"] += 1
            if isinstance(v, str):
                st["str_lens"].append(len(v))
    out = {}
    for k, st in fields.items():
        lens = st.pop("str_lens")
        entry = {"present": st["present"],
                 "coverage": round(st["present"] / max(len(rows), 1), 4)}
        if lens:
            lens.sort()
            entry["len_min"] = lens[0]
            entry["len_max"] = lens[-1]
            entry["len_median"] = lens[len(lens) // 2]
        out[k] = entry
    return {"rows": len(rows), "fields": out}


def run_recipe(recipe: Dict[str, Any], *,
               datasets_dir: Optional[str] = None,
               generate_fn: Optional[Callable[..., str]] = None,
               progress: Optional[Callable] = None,
               cancelled: Optional[Callable[[], bool]] = None):
    """Execute a recipe synchronously; returns (rows, analysis)."""
    rows = _load_source(recipe.get("source") or {}, datasets_dir)
    ops = recipe.get("ops") or []
    if not isinstance(ops, list):
        raise RecipeError("'ops' must be a list")
    rows, stages = _apply_ops(rows, ops, generate_fn, progress, cancelled)
    analysis = analyze_rows(rows)
    analysis["stages"] = stages
    return rows, analysis


# ---------------------------------------------------------------------------
# Job manager (reference: core/data_recipe/jobs.py get_job_manager)
# ---------------------------------------------------------------------------

class RecipeJobManager:
    """Background recipe jobs with progress events and publishable
    output. One job runs at a time (the reference's single 'current'
    job); results live in memory plus a per-job state file."""

    def __init__(self, workdir: str,
                 datasets_dir: Optional[str] = None,
                 generate_fn: Optional[Callable[..., str]] = None):
        self.workdir = os.path.join(workdir, "recipes")
        os.makedirs(self.workdir, exist_ok=True)
        self.datasets_dir = datasets_dir
        self.generate_fn = generate_fn
        self._jobs: Dict[str, Dict[str, Any]] = {}
        self._rows: Dict[str, List[Dict[str, Any]]] = {}
        self._lock = threading.Lock()
        self._current: Optional[str] = None

    def create(self, recipe: Dict[str, Any]) -> Dict[str, Any]:
        if not isinstance(recipe, dict) or "source" not in recipe:
            raise RecipeError("recipe needs a 'source'")
        with self._lock:
            cur = self._jobs.get(self._current or "")
            if cur and cur["status"] == "running":
                raise RuntimeError("a recipe job is already running")
            jid = "recipe-" + uuid.uuid4().hex[:10]
            job = {"job_id": jid, "name": recipe.get("name", jid),
                   "status": "running", "created": time.time(),
                   "events": [], "analysis": None, "error": None,
                   "cancelled": False}
            self._jobs[jid] = job
            self._current = jid
        t = threading.Thread(target=self._run, args=(jid, recipe),
                             daemon=True)
        t.start()
        job["_thread"] = t
        return {"job_id": jid, "status": "running"}

    def _emit(self, job, event: Dict[str, Any]):
        event["ts"] = time.time()
        job["events"].append(event)

    def _run(self, jid: str, recipe: Dict[str, Any]):
        job = self._jobs[jid]
        try:
            rows, analysis = run_recipe(
                recipe, datasets_dir=self.datasets_dir,
                generate_fn=self.generate_fn,
                progress=lambda e: self._emit(job, e),
                cancelled=lambda: job["cancelled"])
            self._rows[jid] = rows
            job["analysis"] = analysis
            job["status"] = "completed"
            self._emit(job, {"event": "job.completed",
                             "rows": len(rows)})
        except InterruptedError:
            job["status"] = "cancelled"
            self._emit(job, {"event": "job.cancelled"})
        except (RecipeError, Exception) as e:  # noqa: BLE001
            job["status"] = "error"
            job["error"] = f"{type(e).__name__}: {e}"
            self._emit(job, {"event": "job.error", "error": job["error"]})
        self._save(jid)

    def _save(self, jid: str):
        job = {k: v for k, v in self._jobs[jid].items()
               if k != "_thread"}
        with open(os.path.join(self.workdir, jid + ".json"), "w") as f:
            json.dump(job, f)

    def _require(self, jid: str) -> Dict[str, Any]:
        job = self._jobs.get(jid)
        if job is None:
            raise FileNotFoundError(jid)
        return job

    def wait(self, jid: str, timeout: float = 60.0) -> None:
        t = self._require(jid).get("_thread")
        if t is not None:
            t.join(timeout)

    def status(self, jid: str) -> Dict[str, Any]:
        job = self._require(jid)
        return {"job_id": jid, "name": job["name"],
                "status": job["status"], "error": job["error"],
                "n_events": len(job["events"])}

    def current(self) -> Dict[str, Any]:
        if self._current is None:
            return {"job_id": None}
        return self.status(self._current)

    def cancel(self, jid: str) -> Dict[str, Any]:
        job = self._require(jid)
        job["cancelled"] = True
        return {"job_id": jid, "cancelling": True}

    def analysis(self, jid: str) -> Dict[str, Any]:
        job = self._require(jid)
        if job["analysis"] is None:
            raise RuntimeError(f"job {jid} has no analysis "
                               f"(status={job['status']})")
        return job["analysis"]

    def dataset(self, jid: str, offset: int = 0,
                limit: int = 100) -> Dict[str, Any]:
        self._require(jid)
        rows = self._rows.get(jid)
        if rows is None:
            raise RuntimeError(f"job {jid} has no dataset yet")
        return {"rows": rows[offset:offset + limit], "total": len(rows)}

    def events(self, jid: str, after: int = 0) -> Dict[str, Any]:
        job = self._require(jid)
        return {"events": job["events"][after:],
                "next": len(job["events"]), "status": job["status"]}

    def publish(self, jid: str, name: str) -> Dict[str, Any]:
        """Write the job's rows as a jsonl dataset into the studio
        datasets dir so /api/train/start can consume it (the reference
        publishes to the Hub; offline, the datasets store IS the hub)."""
        rows = self._rows.get(jid)
        if rows is None:
            self._require(jid)
            raise RuntimeError(f"job {jid} has no dataset to publish")
        if not name or not all(c.isalnum() or c in "-_." for c in name):
            raise RecipeError("dataset name must be [-_.a-zA-Z0-9]")
        if not self.datasets_dir:
            raise RecipeError("no datasets directory configured")
        os.makedirs(self.datasets_dir, exist_ok=True)
        path = os.path.join(self.datasets_dir, name + ".jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
        sha = hashlib.sha256(open(path, "rb").read()).hexdigest()
        return {"name": name, "rows": len(rows), "path": path,
                "sha256": sha}
