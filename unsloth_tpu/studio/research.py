"""Deep-research runs: plan -> approve -> execute -> cited report.

Parity target: the reference's research stack (reference:
studio/backend/routes/research_runs.py — create 202 / active / get /
update plan with expectedRevision / approve with planRevision+planHash /
cancel / retry / event stream; sensitive-key sanitization of the stored
config at :154-172; plan bounded at 30 steps).

TPU-native form: a run is a durable JSON state file plus an executor
thread. Retrieval is the studio RagStore (exact cosine over the chosen
KB); synthesis uses a pluggable ``generate_fn`` when a model is loaded
and falls back to an extractive cited report otherwise — so research
runs work offline and model-free, like the rest of the studio. Events
are long-polled (GET ?after=N) instead of SSE, matching the studio's
polling dashboard.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import threading
import time
import uuid
from typing import Any, Callable, Dict, List, Optional

MAX_PLAN_STEPS = 30

# reference research_runs.py:26-46 — never store credential-shaped keys
_SENSITIVE_EXACT = {"authorization", "password", "secret", "token",
                    "apikey", "credential", "credentials"}
_SENSITIVE_SUFFIXES = ("apikey", "accesskey", "accesstoken", "authtoken",
                       "bearertoken", "clientsecret", "privatekey",
                       "refreshtoken", "sessiontoken")


def _is_sensitive_key(key: Any) -> bool:
    if not isinstance(key, str):
        return False
    k = re.sub(r"[^a-z0-9]", "", key.lower())
    return k in _SENSITIVE_EXACT or k.endswith(_SENSITIVE_SUFFIXES)


def sanitize_config(value: Any) -> Any:
    """Recursively drop credential-shaped keys before persisting."""
    if isinstance(value, dict):
        return {k: sanitize_config(v) for k, v in value.items()
                if not _is_sensitive_key(k)}
    if isinstance(value, list):
        return [sanitize_config(v) for v in value]
    return value


def plan_hash(plan: Dict[str, Any]) -> str:
    """Canonical sha256 of a plan (the reference's planHash approval
    token: the client approves EXACTLY the plan it saw)."""
    return hashlib.sha256(
        json.dumps(plan, sort_keys=True,
                   ensure_ascii=False).encode()).hexdigest()


def propose_plan(question: str,
                 generate_fn: Optional[Callable[..., str]] = None,
                 max_steps: int = 6) -> Dict[str, Any]:
    """Draft a research plan. With a model: ask for JSON steps (tolerant
    parse). Without: heuristic decomposition — the question itself plus
    sub-queries from its clauses and key noun phrases."""
    question = question.strip()
    if generate_fn is not None:
        prompt = (
            "Draft a research plan for the question below as JSON: "
            '{"title": ..., "steps": [{"title": ..., "query": ...}]}. '
            f"At most {max_steps} steps.\nQuestion: {question}\nJSON: ")
        try:
            text = generate_fn(prompt, max_tokens=512)
            m = re.search(r"\{.*\}", text, re.S)
            if m:
                plan = json.loads(m.group(0))
                steps = [{"title": str(s["title"])[:200],
                          "query": str(s["query"])[:500]}
                         for s in plan["steps"][:MAX_PLAN_STEPS]]
                if steps:
                    return {"title": str(plan.get("title", question))[:200],
                            "steps": steps}
        except Exception:  # noqa: BLE001 — fall through to heuristic
            pass
    queries = [question]
    # clause split on connectives; keeps multi-part questions covered
    for part in re.split(r"\band\b|;|,\s*(?:then|also)\b", question):
        part = part.strip(" ?.")
        if len(part.split()) >= 3 and part.lower() != question.lower():
            queries.append(part)
    seen, steps = set(), []
    for q in queries[:max_steps]:
        key = q.lower()
        if key not in seen:
            seen.add(key)
            steps.append({"title": q[:60], "query": q[:500]})
    return {"title": question[:200] or "research", "steps": steps}


def _validate_plan(plan: Any) -> Dict[str, Any]:
    if not isinstance(plan, dict) or not isinstance(plan.get("steps"),
                                                    list):
        raise TypeError("plan needs 'title' and a 'steps' list")
    steps = plan["steps"]
    if not 1 <= len(steps) <= MAX_PLAN_STEPS:
        raise TypeError(f"plan must have 1..{MAX_PLAN_STEPS} steps")
    out = []
    for s in steps:
        title, query = str(s.get("title", "")), str(s.get("query", ""))
        if not title or not query:
            raise TypeError("each step needs 'title' and 'query'")
        out.append({"title": title[:200], "query": query[:500]})
    return {"title": str(plan.get("title", ""))[:200] or "research",
            "steps": out}


class ResearchManager:
    """Durable research runs under ``workdir/research/``."""

    def __init__(self, workdir: str, rag=None,
                 generate_fn: Optional[Callable[..., str]] = None):
        self.workdir = os.path.join(workdir, "research")
        os.makedirs(self.workdir, exist_ok=True)
        self.rag = rag
        self.generate_fn = generate_fn
        self._runs: Dict[str, Dict[str, Any]] = {}
        self._lock = threading.Lock()
        for fn in os.listdir(self.workdir):
            if fn.endswith(".json"):
                try:
                    with open(os.path.join(self.workdir, fn)) as f:
                        run = json.load(f)
                    if run.get("status") == "running":
                        # process died mid-run; surface as retryable
                        run["status"] = "error"
                        run["error"] = "interrupted (server restart)"
                    self._runs[run["run_id"]] = run
                except (OSError, json.JSONDecodeError, KeyError):
                    continue

    # -- lifecycle ------------------------------------------------------

    def create(self, body: Dict[str, Any]) -> Dict[str, Any]:
        question = str(body.get("question", "")).strip()
        if not question:
            raise KeyError("question")
        kb_id = body.get("kb_id")
        if kb_id is not None and self.rag is not None:
            self.rag.list_docs(kb_id)  # raises FileNotFoundError
        plan = _validate_plan(body["plan"]) if body.get("plan") else \
            propose_plan(question, self.generate_fn)
        run = {"run_id": "rr-" + uuid.uuid4().hex[:12],
               "question": question, "kb_id": kb_id,
               "instructions": str(body.get("instructions", ""))[:32000],
               "config": sanitize_config(body.get("config") or {}),
               "plan": plan, "plan_revision": 1,
               "plan_hash": plan_hash(plan),
               "status": "awaiting_approval",
               "created": time.time(), "events": [], "report": None,
               "error": None, "cancelled": False}
        with self._lock:
            self._runs[run["run_id"]] = run
        self._emit(run, {"event": "run.created"})
        self._save(run)
        if body.get("auto_approve"):
            return self.approve(run["run_id"], 1, run["plan_hash"])
        return self._public(run)

    def _require(self, run_id: str) -> Dict[str, Any]:
        run = self._runs.get(run_id)
        if run is None:
            raise FileNotFoundError(run_id)
        return run

    def _public(self, run: Dict[str, Any]) -> Dict[str, Any]:
        return {k: v for k, v in run.items()
                if k not in ("events", "_thread", "cancelled")}

    def _save(self, run: Dict[str, Any]):
        state = {k: v for k, v in run.items() if k != "_thread"}
        path = os.path.join(self.workdir, run["run_id"] + ".json")
        with open(path, "w") as f:
            json.dump(state, f)

    def _emit(self, run, event: Dict[str, Any]):
        event["ts"] = time.time()
        run["events"].append(event)

    def get(self, run_id: str) -> Dict[str, Any]:
        return self._public(self._require(run_id))

    def active(self) -> List[Dict[str, Any]]:
        return [self._public(r) for r in self._runs.values()
                if r["status"] in ("awaiting_approval", "running")]

    def update_plan(self, run_id: str, plan: Dict[str, Any],
                    expected_revision: int) -> Dict[str, Any]:
        run = self._require(run_id)
        if run["status"] != "awaiting_approval":
            raise RuntimeError(f"run is {run['status']}, not editable")
        if int(expected_revision) != run["plan_revision"]:
            raise RuntimeError(
                f"plan revision conflict: expected {expected_revision}, "
                f"current {run['plan_revision']}")
        run["plan"] = _validate_plan(plan)
        run["plan_revision"] += 1
        run["plan_hash"] = plan_hash(run["plan"])
        self._emit(run, {"event": "plan.updated",
                         "revision": run["plan_revision"]})
        self._save(run)
        return self._public(run)

    def approve(self, run_id: str, plan_revision: int,
                supplied_hash: str) -> Dict[str, Any]:
        run = self._require(run_id)
        if run["status"] != "awaiting_approval":
            raise RuntimeError(f"run is {run['status']}, not approvable")
        if (int(plan_revision) != run["plan_revision"]
                or supplied_hash != run["plan_hash"]):
            raise RuntimeError("plan approval mismatch: re-fetch the "
                               "plan and approve its current hash")
        run["status"] = "running"
        self._emit(run, {"event": "run.started"})
        self._save(run)
        t = threading.Thread(target=self._execute, args=(run,),
                             daemon=True)
        run["_thread"] = t
        t.start()
        return self._public(run)

    def cancel(self, run_id: str) -> Dict[str, Any]:
        run = self._require(run_id)
        if run["status"] == "running":
            run["cancelled"] = True
        elif run["status"] == "awaiting_approval":
            run["status"] = "cancelled"
            self._emit(run, {"event": "run.cancelled"})
            self._save(run)
        return self._public(run)

    def retry(self, run_id: str) -> Dict[str, Any]:
        run = self._require(run_id)
        if run["status"] not in ("error", "cancelled"):
            raise RuntimeError(f"run is {run['status']}, not retryable")
        run.update(status="awaiting_approval", error=None,
                   cancelled=False, report=None)
        self._emit(run, {"event": "run.retried"})
        self._save(run)
        return self.approve(run_id, run["plan_revision"],
                            run["plan_hash"])

    def events(self, run_id: str, after: int = 0) -> Dict[str, Any]:
        run = self._require(run_id)
        return {"events": run["events"][after:],
                "next": len(run["events"]), "status": run["status"]}

    def wait(self, run_id: str, timeout: float = 120.0) -> None:
        t = self._require(run_id).get("_thread")
        if t is not None:
            t.join(timeout)

    # -- execution ------------------------------------------------------

    def _execute(self, run: Dict[str, Any]):
        try:
            findings = []
            for i, step in enumerate(run["plan"]["steps"]):
                if run["cancelled"]:
                    raise InterruptedError
                self._emit(run, {"event": "phase.started", "step": i,
                                 "title": step["title"]})
                hits = []
                if self.rag is not None and run["kb_id"]:
                    hits = self.rag.search(run["kb_id"], step["query"],
                                           k=5)
                findings.append({"step": step, "hits": hits})
                self._emit(run, {"event": "phase.ended", "step": i,
                                 "n_hits": len(hits)})
            if run["cancelled"]:
                raise InterruptedError
            run["report"] = self._synthesize(run, findings)
            self._emit(run, {"event": "report.updated"})
            run["status"] = "completed"
            self._emit(run, {"event": "run.completed"})
        except InterruptedError:
            run["status"] = "cancelled"
            self._emit(run, {"event": "run.cancelled"})
        except Exception as e:  # noqa: BLE001
            run["status"] = "error"
            run["error"] = f"{type(e).__name__}: {e}"
            self._emit(run, {"event": "run.error", "error": run["error"]})
        self._save(run)

    def _synthesize(self, run, findings) -> str:
        """Model-written report when a generate_fn exists; otherwise an
        extractive report: per-step sections quoting top chunks with
        [doc_id#seq] citations."""
        if self.generate_fn is not None:
            ctx = []
            for f in findings:
                for h in f["hits"][:3]:
                    ctx.append(f"[{h['doc_id']}#{h['seq']}] {h['text']}")
            prompt = (f"Question: {run['question']}\n"
                      + (f"Instructions: {run['instructions']}\n"
                         if run["instructions"] else "")
                      + "Sources:\n" + "\n".join(ctx[:20])
                      + "\n\nWrite a cited report (cite as [doc#seq]):\n")
            try:
                return self.generate_fn(prompt, max_tokens=1024)
            except Exception:  # noqa: BLE001 — fall back to extractive
                pass
        lines = [f"# {run['plan']['title']}", "",
                 f"Question: {run['question']}", ""]
        for f in findings:
            lines.append(f"## {f['step']['title']}")
            if not f["hits"]:
                lines.append("_no sources found_")
            for h in f["hits"][:3]:
                quote = h["text"][:500].replace("\n", " ")
                lines.append(f"- {quote} "
                             f"[{h['doc_id']}#{h['seq']}, "
                             f"score {h['score']}]")
            lines.append("")
        return "\n".join(lines)
