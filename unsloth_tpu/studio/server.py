"""Studio — web backend for training jobs + inference.

Parity target: the reference's Studio backend (reference: studio/backend/ —
FastAPI routes for training/inference/export, training worker as an
isolated spawn subprocess whose crash becomes a structured error event,
core/training/worker.py:1-30, progress callback -> WS events
trainer.py:280, resume scan resume.py). This is the round-1 core: job
management, live metrics, and the OpenAI/Anthropic chat endpoints, on the
stdlib HTTP server (no FastAPI in this image). The React frontend is
replaced by a single-file dashboard (inline JS polling /api/metrics).

Training runs in a SUBPROCESS (the reference's worker isolation): a crash
or OOM can't take the server down, stop is a signal, and progress streams
through the trainer's metrics.jsonl.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time
import uuid
from typing import Any, Dict, List, Optional

from ..inference.server import InferenceServer

_DASHBOARD_HTML = """<!DOCTYPE html>
<html><head><title>unsloth_tpu studio</title>
<style>
body{font-family:system-ui;margin:2rem;background:#111;color:#eee}
h1{font-size:1.2rem} .card{background:#1c1c1c;border-radius:8px;
padding:1rem;margin:1rem 0;max-width:720px}
canvas{width:100%;height:220px}
pre{white-space:pre-wrap;font-size:.85rem;color:#9c9}
button{background:#2563eb;color:#fff;border:0;border-radius:6px;
padding:.4rem .8rem;cursor:pointer} input{width:100%;padding:.4rem}
</style></head><body>
<h1>unsloth_tpu studio</h1>
<div class=card><b>Training</b> — <span id=status>?</span>
<canvas id=chart width=700 height=220></canvas><pre id=last></pre>
<button onclick="stopJob()">stop job</button></div>
<div class=card><b>Chat</b><div id=chatlog></div>
<input id=msg placeholder="message... (enter to send)"
 onkeydown="if(event.key==='Enter')send()"></div>
<script>
let TOKEN = localStorage.getItem('studio_token') || '';
function hdrs(extra){return Object.assign(
  {'Authorization':'Bearer '+TOKEN}, extra||{});}
async function fetchAuth(url, opts){
 opts = opts||{}; opts.headers = hdrs(opts.headers);
 let r = await fetch(url, opts);
 if(r.status===401){TOKEN = prompt('studio auth token:')||'';
  localStorage.setItem('studio_token', TOKEN);
  opts.headers = hdrs(opts.headers); r = await fetch(url, opts);}
 return r;
}
async function poll(){
 const r = await fetchAuth('/api/train/status'); const s = await r.json();
 document.getElementById('status').textContent =
   s.running ? 'running (pid '+s.pid+')' : 'idle';
 const m = await (await fetchAuth('/api/metrics')).json();
 draw(m.entries); if(m.entries.length)
   document.getElementById('last').textContent =
     JSON.stringify(m.entries[m.entries.length-1]);
}
function draw(es){
 const c = document.getElementById('chart'), x = c.getContext('2d');
 x.clearRect(0,0,c.width,c.height);
 const ls = es.map(e=>e.loss).filter(v=>v!==undefined);
 if(ls.length<2) return;
 const mx = Math.max(...ls), mn = Math.min(...ls);
 x.strokeStyle='#4ade80'; x.beginPath();
 ls.forEach((v,i)=>{const px=i/(ls.length-1)*c.width,
  py=c.height-((v-mn)/(mx-mn+1e-9))*(c.height-20)-10;
  i?x.lineTo(px,py):x.moveTo(px,py)});
 x.stroke();
}
async function stopJob(){await fetchAuth('/api/train/stop',{method:'POST'});}
async function send(){
 const el = document.getElementById('msg'); const text = el.value;
 el.value='';
 const log = document.getElementById('chatlog');
 log.innerHTML += '<p><b>you:</b> '+text+'</p>';
 const r = await fetchAuth('/v1/chat/completions',{method:'POST',
  headers:{'Content-Type':'application/json'},
  body:JSON.stringify({messages:[{role:'user',content:text}],
                       max_tokens:128})});
 const j = await r.json();
 log.innerHTML += '<p><b>model:</b> '+
   (j.choices?j.choices[0].message.content:JSON.stringify(j))+'</p>';
}
setInterval(poll, 2000); poll();
</script></body></html>"""


def _parse_multipart(ctype: str, raw: bytes) -> Dict[str, Any]:
    """Minimal multipart/form-data parser: name -> (filename, bytes).
    Enough for the OpenAI audio-transcription upload shape."""
    m = None
    for part in ctype.split(";"):
        part = part.strip()
        if part.startswith("boundary="):
            m = part[len("boundary="):].strip('"')
    if not m:
        raise TypeError("multipart body without boundary")
    out: Dict[str, Any] = {}
    for chunk in raw.split(b"--" + m.encode()):
        chunk = chunk.strip(b"\r\n")
        if not chunk or chunk == b"--":
            continue
        if b"\r\n\r\n" not in chunk:
            continue
        head, body = chunk.split(b"\r\n\r\n", 1)
        name, filename = None, None
        for line in head.decode("utf-8", "replace").split("\r\n"):
            if line.lower().startswith("content-disposition"):
                for piece in line.split(";"):
                    piece = piece.strip()
                    if piece.startswith("name="):
                        name = piece[5:].strip('"')
                    elif piece.startswith("filename="):
                        filename = piece[9:].strip('"')
        if name:
            out[name] = (filename, body)
    return out


class TrainingJobManager:
    """Subprocess training jobs (the reference's worker isolation)."""

    def __init__(self, workdir: str = "studio_jobs"):
        self.workdir = workdir
        self.proc: Optional[subprocess.Popen] = None
        self.job: Optional[Dict[str, Any]] = None
        os.makedirs(workdir, exist_ok=True)

    def start(self, config: Dict[str, Any]) -> Dict[str, Any]:
        if self.proc is not None and self.proc.poll() is None:
            raise RuntimeError("a training job is already running")
        job_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(self.workdir, job_id)
        os.makedirs(out_dir, exist_ok=True)
        args = [sys.executable, "-m", "unsloth_tpu.cli", "train",
                "--model_name", config["model_name"],
                "--dataset", config["dataset"],
                "--output_dir", out_dir]
        for key in ("max_steps", "learning_rate", "max_seq_length",
                    "per_device_train_batch_size", "r", "lora_alpha",
                    "save_steps", "gradient_accumulation_steps",
                    "platform"):
            if key in config:
                args += [f"--{key}", str(config[key])]
        if config.get("packing"):
            args.append("--packing")
        if config.get("save_model"):
            args.append("--save_model")
        if config.get("load_in_4bit") is False:
            args.append("--no_load_in_4bit")
        if config.get("resume_from"):
            # resume validation (reference: studio resume.py scan): the
            # checkpoint dir must exist and carry train state before we
            # spawn a worker that would crash on it
            from ..trainer.checkpoint import latest_checkpoint

            prev = config["resume_from"]
            ckpt = prev if os.path.basename(prev).startswith(
                "checkpoint-") else latest_checkpoint(prev)
            if not ckpt or not os.path.isdir(ckpt):
                raise RuntimeError(
                    f"resume_from={prev!r} has no checkpoint-* directory")
            args = [a if a != out_dir else prev for a in args]
            args.append("--resume")
        log_path = os.path.join(out_dir, "job.log")
        log_f = open(log_path, "w")
        self.proc = subprocess.Popen(args, stdout=log_f, stderr=log_f)
        self.job = {"id": job_id, "output_dir": out_dir,
                    "log": log_path, "started": time.time(),
                    "config": config}
        return {"job_id": job_id, "pid": self.proc.pid,
                "output_dir": out_dir}

    def status(self) -> Dict[str, Any]:
        if self.proc is None:
            return {"running": False}
        code = self.proc.poll()
        out = {"running": code is None, "pid": self.proc.pid,
               "returncode": code}
        if self.job:
            out.update({"job_id": self.job["id"],
                        "output_dir": self.job["output_dir"]})
            # structured error event on crash (reference: worker.py:5-8)
            if code not in (None, 0):
                try:
                    with open(self.job["log"]) as f:
                        out["error_tail"] = f.read()[-2000:]
                except OSError:
                    pass
        return out

    def stop(self) -> Dict[str, Any]:
        if self.proc is None or self.proc.poll() is not None:
            return {"stopped": False, "reason": "no running job"}
        self.proc.send_signal(signal.SIGTERM)
        try:
            self.proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            self.proc.kill()
        return {"stopped": True}

    def metrics(self, limit: int = 500) -> List[Dict[str, Any]]:
        if not self.job:
            return []
        path = os.path.join(self.job["output_dir"], "metrics.jsonl")
        if not os.path.exists(path):
            return []
        entries = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        entries.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
        return entries[-limit:]


class StudioServer(InferenceServer):
    """Inference endpoints + dashboard + training-job API.

    Auth (reference: studio/backend/auth/ hashed-API-key gate): every
    /api/* and /v1/* request must carry ``Authorization: Bearer <token>``.
    The token comes from UNSLOTH_STUDIO_TOKEN / the constructor, or is
    generated and printed once at startup; only its sha256 is kept."""

    def __init__(self, model=None, tokenizer=None, model_name="local",
                 workdir: str = "studio_jobs",
                 token: Optional[str] = None, require_auth: bool = True):
        if model is not None:
            super().__init__(model, tokenizer, model_name)
        else:
            self.model = None
            self.tokenizer = None
            self.model_name = model_name
            self._lock = threading.Lock()
        self.jobs = TrainingJobManager(workdir)
        self.require_auth = require_auth
        import hashlib
        import secrets

        token = token or os.environ.get("UNSLOTH_STUDIO_TOKEN")
        if token is None and require_auth:
            token = secrets.token_urlsafe(24)
            print(f"studio auth token: {token}")
        self._token_sha = (hashlib.sha256(token.encode()).hexdigest()
                           if token else None)
        self._started = time.time()
        self._req_counts: Dict[str, int] = {}

    # -- stats (reference: studio/backend/routes/profile_stats.py) ------

    def _count_request(self, path: str) -> None:
        fam = "/".join(path.split("?")[0].split("/")[:3]) or "/"
        self._req_counts[fam] = self._req_counts.get(fam, 0) + 1

    def stats(self) -> Dict[str, Any]:
        import jax

        wd = self.jobs.workdir
        n_jobs = sum(1 for d in os.listdir(wd)
                     if os.path.isdir(os.path.join(wd, d))) \
            if os.path.isdir(wd) else 0
        return {
            "uptime_s": round(time.time() - self._started, 1),
            "backend": jax.default_backend(),
            "n_devices": jax.device_count(),
            "model_loaded": self.model is not None,
            "jobs": n_jobs,
            "training_running": self.jobs.status().get("running", False),
            "requests": dict(sorted(self._req_counts.items())),
        }

    # -- RAG (reference: studio/backend/routes/rag.py) ------------------

    @property
    def rag(self):
        """Lazy RagStore under the job workdir (KB CRUD / ingest /
        search). Embedder defaults to the model-free HashEmbedder; set
        ``self.rag.embedder`` to a sentence-transformer encode fn to use
        the loaded model."""
        if getattr(self, "_rag", None) is None:
            from .rag import RagStore

            self._rag = RagStore(os.path.join(self.jobs.workdir,
                                              "rag.sqlite"))
        return self._rag

    def _studio_generate(self):
        """Completion callable for recipe llm ops / research synthesis,
        or None when no model is loaded (engines then run model-free)."""
        if self.model is None:
            return None
        from ..inference.generate import SamplingParams

        def gen(prompt: str, max_tokens: int = 128) -> str:
            return self._gen_text(
                prompt, SamplingParams(max_tokens=max_tokens))

        return gen

    # -- data recipes (reference: studio/backend/routes/data_recipe/) ---

    @property
    def recipes(self):
        if getattr(self, "_recipes", None) is None:
            from .recipe import RecipeJobManager

            self._recipes = RecipeJobManager(
                self.jobs.workdir, datasets_dir=self._datasets_dir(),
                generate_fn=self._studio_generate())
        return self._recipes

    # -- research runs (reference: studio/backend/routes/research_runs) -

    @property
    def research(self):
        if getattr(self, "_research", None) is None:
            from .research import ResearchManager

            self._research = ResearchManager(
                self.jobs.workdir, rag=self.rag,
                generate_fn=self._studio_generate())
        return self._research

    # -- settings / prompts / MCP registry (reference: studio/backend/
    #    routes/{settings,prompts,mcp_servers}.py — SQLite-backed CRUD;
    #    here a JSON file under the workdir) ---------------------------

    def _store_path(self, name: str) -> str:
        return os.path.join(self.jobs.workdir, name + ".json")

    def _store_load(self, name: str, default):
        try:
            with open(self._store_path(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return default

    def _store_save(self, name: str, value) -> None:
        path = self._store_path(name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(value, f)
        os.replace(tmp, path)

    def settings_get(self) -> Dict[str, Any]:
        return {"settings": self._store_load("settings", {})}

    def settings_put(self, body: Dict[str, Any]) -> Dict[str, Any]:
        from .research import sanitize_config

        cur = self._store_load("settings", {})
        for k, v in sanitize_config(body).items():
            if v is None:
                cur.pop(k, None)
            else:
                cur[k] = v
        self._store_save("settings", cur)
        return {"settings": cur}

    def prompts_list(self) -> Dict[str, Any]:
        return {"entries": self._store_load("prompts", [])}

    def prompts_add(self, body: Dict[str, Any]) -> Dict[str, Any]:
        name = str(body["name"]).strip()
        if not name:
            raise TypeError("prompt needs a name")
        entries = self._store_load("prompts", [])
        entry = {"id": "p-" + uuid.uuid4().hex[:8], "name": name,
                 "text": str(body.get("text", "")),
                 "updated": time.time()}
        entries = [e for e in entries if e["name"] != name] + [entry]
        self._store_save("prompts", entries)
        return entry

    def prompts_delete(self, pid: str) -> None:
        entries = self._store_load("prompts", [])
        kept = [e for e in entries if e["id"] != pid]
        if len(kept) == len(entries):
            raise FileNotFoundError(pid)
        self._store_save("prompts", kept)

    def mcp_list(self) -> Dict[str, Any]:
        servers = self._store_load("mcp_servers", [])
        # redact env values (credential-shaped config never round-trips)
        out = []
        for s in servers:
            s = dict(s)
            if s.get("env"):
                s["env"] = {k: "***" for k in s["env"]}
            out.append(s)
        return {"servers": out}

    def mcp_add(self, body: Dict[str, Any]) -> Dict[str, Any]:
        name = str(body["name"]).strip()
        cmd = str(body["command"]).strip()
        if not name or not cmd:
            raise TypeError("mcp server needs name and command")
        servers = self._store_load("mcp_servers", [])
        entry = {"id": "mcp-" + uuid.uuid4().hex[:8], "name": name,
                 "command": cmd, "args": list(body.get("args") or []),
                 "env": dict(body.get("env") or {})}
        servers = [s for s in servers if s["name"] != name] + [entry]
        self._store_save("mcp_servers", servers)
        return {"id": entry["id"], "name": name}

    def mcp_delete(self, sid: str) -> None:
        servers = self._store_load("mcp_servers", [])
        kept = [s for s in servers if s["id"] != sid]
        if len(kept) == len(servers):
            raise FileNotFoundError(sid)
        self._store_save("mcp_servers", kept)

    # -- whisper STT (reference: studio/backend/routes/whisper.py +
    #    core/inference/stt_sidecar.py — whisper.cpp sidecars; here the
    #    native JAX whisper model transcribes on the same backend) ------

    def _whisper_handle(self, path: Optional[str]):
        cached = getattr(self, "_whisper", None)
        if cached is not None and (path is None or cached[0] == path):
            return cached
        if path is None:
            raise KeyError("model")
        from ..models.whisper import load_whisper

        params, cfg = load_whisper(path)
        tok = None
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(path)
        except Exception:  # noqa: BLE001 — ids-only transcripts then
            tok = None
        self._whisper = (path, params, cfg, tok)
        return self._whisper

    def whisper_transcribe_api(self, body: Dict[str, Any]
                               ) -> Dict[str, Any]:
        """{model?, audio: [floats] | audio_b64: wav, sample_rate?,
        max_tokens?} -> {text} (or {tokens} without a tokenizer)."""
        import base64

        import numpy as np

        from ..data.audio import decode_wav, resample
        from ..models.whisper import whisper_transcribe

        _, params, cfg, tok = self._whisper_handle(body.get("model"))
        if body.get("audio_b64"):
            audio, rate = decode_wav(base64.b64decode(body["audio_b64"]))
        elif body.get("audio") is not None:
            audio = np.asarray(body["audio"], np.float32)
            rate = int(body.get("sample_rate", 16000))
        else:
            raise KeyError("audio")
        audio = resample(audio, rate, 16000)
        out = whisper_transcribe(
            params, cfg, audio, tokenizer=tok,
            max_tokens=body.get("max_tokens"),
            prompt_ids=body.get("prompt_ids"))
        key = "text" if tok is not None else "tokens"
        return {key: out[0], "model": self._whisper[0]}

    # -- speech synthesis (OpenAI /v1/audio/speech; reference: studio
    #    audio pipelines drive Orpheus/CSM through the trainer service —
    #    here a `tts_speaker` handle (data/tts.py OrpheusSpeaker or any
    #    object with .speak(text, voice) -> (waveform, rate)) serves
    #    natively) -----------------------------------------------------

    tts_speaker = None

    def audio_speech_api(self, body: Dict[str, Any]) -> bytes:
        """{input, voice?, response_format?: wav} -> WAV bytes."""
        if self.tts_speaker is None:
            raise FileNotFoundError("no TTS model configured "
                                    "(set server.tts_speaker)")
        fmt = body.get("response_format", "wav")
        if fmt != "wav":
            raise ValueError(f"unsupported response_format: {fmt!r} "
                             "(native output is wav)")
        text = body["input"]
        with self._lock:
            audio, rate = self.tts_speaker.speak(text,
                                                 voice=body.get("voice"))
        from ..data.audio import encode_wav

        return encode_wav(audio, rate)

    # -- image generation (reference: studio/backend/core/inference/
    #    sd_cpp_server.py — stable-diffusion.cpp sidecar; here the
    #    native JAX DiT + DDIM sampler serve on the same backend) ------

    def images_generate(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """OpenAI images shape: {model: dit checkpoint dir, n?, steps?,
        label?, seed?} -> {created, data: [{b64_json: png}]}."""
        import base64
        import io

        import jax
        import numpy as np

        from ..models.image_diffusion import ddim_sample, load_dit

        path = body.get("model")
        cached = getattr(self, "_dit", None)
        if cached is None or (path and cached[0] != path):
            if path is None:
                raise KeyError("model")
            params, cfg = load_dit(path)
            self._dit = (path, params, cfg)
        path, params, cfg = self._dit
        n = max(1, min(int(body.get("n", 1)), 8))
        steps = max(1, min(int(body.get("steps", 50)), 250))
        label = body.get("label")
        labels = None
        if label is not None and cfg.num_classes:
            labels = jax.numpy.full((n,), int(label), jax.numpy.int32)
        key = jax.random.PRNGKey(int(body.get("seed", 0)))
        imgs = ddim_sample(params, cfg, key, num_images=n, steps=steps,
                           labels=labels)
        imgs = np.asarray(jax.device_get(imgs))
        imgs = np.clip((imgs + 1.0) * 127.5, 0, 255).astype(np.uint8)

        from PIL import Image

        data = []
        for img in imgs:
            if img.shape[-1] == 1:
                img = img[..., 0]
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            data.append({"b64_json":
                         base64.b64encode(buf.getvalue()).decode()})
        return {"created": int(time.time()), "data": data,
                "model": path, "size":
                f"{cfg.image_size}x{cfg.image_size}"}

    # -- datasets (reference: studio/backend/routes/datasets.py) --------

    def _datasets_dir(self) -> str:
        d = os.path.join(self.jobs.workdir, "datasets")
        os.makedirs(d, exist_ok=True)
        return d

    def dataset_save(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """Upload a dataset as JSON rows (or raw jsonl text); stored as
        one jsonl file usable by /api/train/start via {"dataset": name}."""
        name = str(body.get("name", "")).strip()
        if not name or not all(c.isalnum() or c in "-_." for c in name):
            raise TypeError("dataset name must be [-_.a-zA-Z0-9]")
        rows = body.get("rows")
        text = body.get("text")
        path = os.path.join(self._datasets_dir(), name + ".jsonl")
        n = 0
        with open(path, "w", encoding="utf-8") as f:
            if rows is not None:
                for r in rows:
                    f.write(json.dumps(r, ensure_ascii=False) + "\n")
                    n += 1
            elif text is not None:
                for line in str(text).splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    json.loads(line)  # validate
                    f.write(line + "\n")
                    n += 1
            else:
                raise KeyError("rows")
        return {"name": name, "rows": n, "path": path}

    def dataset_list(self) -> Dict[str, Any]:
        out = []
        d = self._datasets_dir()
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".jsonl"):
                p = os.path.join(d, fn)
                with open(p, encoding="utf-8") as f:
                    n = sum(1 for line in f if line.strip())
                out.append({"name": fn[:-6], "rows": n,
                            "bytes": os.path.getsize(p)})
        return {"datasets": out}

    def dataset_preview(self, name: str, n: int = 10) -> Dict[str, Any]:
        path = os.path.join(self._datasets_dir(), name + ".jsonl")
        if not os.path.exists(path):
            raise FileNotFoundError(name)
        rows = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
                if len(rows) >= n:
                    break
        return {"name": name, "rows": rows}

    # -- hub model resolution (reference: hub/workers/hf_download.py) ---

    def hub_download(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """Resolve a model into the local store as a background job with
        progress events. Offline-first: the worker resolves through the
        local HF cache (the reference's download worker streams from the
        Hub; this environment has no egress, so 'download' = locate +
        validate the snapshot and report its files)."""
        name = body["model_name"]
        jid = "hub-" + uuid.uuid4().hex[:8]
        jd = os.path.join(self.jobs.workdir, jid)
        os.makedirs(jd, exist_ok=True)
        state = {"job_id": jid, "model_name": name, "status": "running",
                 "files": [], "error": None}

        def write_state():
            with open(os.path.join(jd, "hub.json"), "w") as f:
                json.dump(state, f)

        def worker():
            try:
                from ..models.loader import _resolve_model_path

                path = _resolve_model_path(name)
                for fn in sorted(os.listdir(path)):
                    full = os.path.join(path, fn)
                    if os.path.isfile(full):
                        state["files"].append(
                            {"name": fn, "bytes": os.path.getsize(full)})
                        write_state()
                state["path"] = path
                state["status"] = "done"
            except Exception as e:  # noqa: BLE001
                state["status"] = "error"
                state["error"] = f"{type(e).__name__}: {e}"
            write_state()

        write_state()
        t = threading.Thread(target=worker, daemon=True)
        t.start()
        t.join(timeout=10)  # local resolution is fast; stay synchronous-ish
        return {"job_id": jid, "status": state["status"]}

    def hub_status(self, jid: str) -> Dict[str, Any]:
        p = os.path.join(self.jobs.workdir, jid, "hub.json")
        if not os.path.exists(p):
            raise FileNotFoundError(jid)
        with open(p) as f:
            return json.load(f)

    # -- chat history (reference: studio chat-history routes) -----------

    def chat_completion(self, body: Dict[str, Any]) -> Dict[str, Any]:
        resp = super().chat_completion(body)
        try:
            entry = {"ts": time.time(),
                     "messages": body.get("messages", []),
                     "response": resp["choices"][0]["message"]}
            with open(os.path.join(self.jobs.workdir,
                                   "chat_history.jsonl"), "a") as f:
                f.write(json.dumps(entry, ensure_ascii=False) + "\n")
        except Exception:  # noqa: BLE001 — history is best-effort
            pass
        return resp

    def chat_history(self, limit: int = 100) -> Dict[str, Any]:
        p = os.path.join(self.jobs.workdir, "chat_history.jsonl")
        entries = []
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        try:
                            entries.append(json.loads(line))
                        except json.JSONDecodeError:
                            pass
        return {"entries": entries[-limit:]}

    def check_auth(self, headers) -> bool:
        if not self.require_auth:
            return True
        import hashlib
        import hmac

        auth = headers.get("Authorization", "")
        if not auth.startswith("Bearer "):
            return False
        supplied = hashlib.sha256(
            auth[len("Bearer "):].strip().encode()).hexdigest()
        return hmac.compare_digest(supplied, self._token_sha or "")

    def make_handler(server):
        Base = InferenceServer.make_handler(server)

        class Handler(Base):
            def _gate(self):
                """True (and respond 401) when the request is rejected."""
                if server.check_auth(self.headers):
                    return False
                self._send(401, {"error": "missing or invalid bearer "
                                          "token"})
                return True

            def do_GET(self):
                if self.path in ("/", "/index.html", "/app", "/app.html"):
                    # multi-view SPA (studio/app.html); falls back to the
                    # inline dashboard if the asset is missing
                    app_path = os.path.join(os.path.dirname(__file__),
                                            "app.html")
                    if os.path.exists(app_path):
                        with open(app_path, "rb") as f:
                            data = f.read()
                    else:
                        data = _DASHBOARD_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
                if self.path.startswith(("/api/", "/v1/")) and self._gate():
                    return
                server._count_request(self.path)
                if self.path == "/api/stats":
                    return self._send(200, server.stats())
                if self.path == "/api/train/status":
                    return self._send(200, server.jobs.status())
                if self.path.startswith("/api/train/stream"):
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    return self._stream_train(
                        int((q.get("after") or [0])[0]))
                if self.path.startswith("/api/metrics"):
                    return self._send(
                        200, {"entries": server.jobs.metrics()})
                if self.path == "/api/models/families":
                    from ..models.mapper import MODEL_CATALOG

                    return self._send(
                        200, {"families": sorted(MODEL_CATALOG)})
                if self.path.startswith("/api/models"):
                    from urllib.parse import parse_qs, urlparse

                    from ..models.mapper import search_models

                    q = parse_qs(urlparse(self.path).query)
                    return self._send(200, {"models": search_models(
                        query=(q.get("q") or [""])[0],
                        family=(q.get("family") or [None])[0])})
                if self.path.startswith("/api/jobs/") and \
                        self.path.endswith("/metrics"):
                    jid = self.path.split("/")[3]
                    if not jid.isalnum():
                        return self._send(400, {"error": "bad job id"})
                    path = os.path.join(server.jobs.workdir, jid,
                                        "metrics.jsonl")
                    entries = []
                    if os.path.exists(path):
                        with open(path) as f:
                            for line in f:
                                line = line.strip()
                                if line:
                                    try:
                                        entries.append(json.loads(line))
                                    except json.JSONDecodeError:
                                        pass
                    return self._send(200, {"entries": entries[-2000:]})
                if self.path == "/api/datasets":
                    return self._send(200, server.dataset_list())
                if self.path.startswith("/api/datasets/") and \
                        self.path.endswith("/preview"):
                    name = self.path.split("/")[3]
                    try:
                        return self._send(200,
                                          server.dataset_preview(name))
                    except FileNotFoundError:
                        return self._send(404, {"error": "no such "
                                                         "dataset"})
                if self.path.startswith("/api/hub/downloads/"):
                    jid = self.path.rsplit("/", 1)[1]
                    if not all(c.isalnum() or c == "-" for c in jid):
                        return self._send(400, {"error": "bad job id"})
                    try:
                        return self._send(200, server.hub_status(jid))
                    except FileNotFoundError:
                        return self._send(404, {"error": "no such job"})
                if self.path.startswith("/api/chat/history"):
                    return self._send(200, server.chat_history())
                if self.path == "/api/rag/kbs":
                    return self._send(200, {"kbs": server.rag.list_kbs()})
                if self.path.startswith("/api/rag/docs"):
                    from urllib.parse import parse_qs, urlparse

                    kb = (parse_qs(urlparse(self.path).query)
                          .get("kb") or [""])[0]
                    try:
                        return self._send(
                            200, {"docs": server.rag.list_docs(kb)})
                    except FileNotFoundError:
                        return self._send(404, {"error": "no such kb"})
                if self.path.startswith(("/api/recipe/jobs",
                                         "/api/research")):
                    from urllib.parse import parse_qs, urlparse

                    u = urlparse(self.path)
                    q = parse_qs(u.query)
                    parts = u.path.strip("/").split("/")
                    try:
                        if u.path == "/api/recipe/jobs/current":
                            return self._send(200,
                                              server.recipes.current())
                        if len(parts) == 5 and parts[1] == "recipe":
                            jid, leaf = parts[3], parts[4]
                            if leaf == "status":
                                return self._send(
                                    200, server.recipes.status(jid))
                            if leaf == "analysis":
                                return self._send(
                                    200, server.recipes.analysis(jid))
                            if leaf == "dataset":
                                return self._send(
                                    200, server.recipes.dataset(
                                        jid,
                                        int((q.get("offset") or [0])[0]),
                                        int((q.get("limit") or [100])[0])))
                            if leaf == "events":
                                return self._send(
                                    200, server.recipes.events(
                                        jid,
                                        int((q.get("after") or [0])[0])))
                        if u.path == "/api/research/active":
                            return self._send(
                                200, {"runs": server.research.active()})
                        if len(parts) == 3 and parts[1] == "research":
                            return self._send(
                                200, server.research.get(parts[2]))
                        if (len(parts) == 4 and parts[1] == "research"
                                and parts[3] == "events"):
                            return self._send(
                                200, server.research.events(
                                    parts[2],
                                    int((q.get("after") or [0])[0])))
                    except FileNotFoundError as e:
                        return self._send(404,
                                          {"error": f"not found: {e}"})
                    except RuntimeError as e:
                        return self._send(409, {"error": str(e)})
                    return self._send(404, {"error": "not found"})
                if self.path == "/api/settings":
                    return self._send(200, server.settings_get())
                if self.path == "/api/prompts":
                    return self._send(200, server.prompts_list())
                if self.path == "/api/mcp/servers":
                    return self._send(200, server.mcp_list())
                if self.path == "/api/jobs":
                    jobs = []
                    wd = server.jobs.workdir
                    if os.path.isdir(wd):
                        for jid in sorted(os.listdir(wd)):
                            p = os.path.join(wd, jid)
                            if os.path.isdir(p):
                                jobs.append({
                                    "job_id": jid,
                                    "has_metrics": os.path.exists(
                                        os.path.join(p, "metrics.jsonl")),
                                })
                    return self._send(200, {"jobs": jobs})
                return super().do_GET()

            def _stream_train(self, after: int = 0):
                """SSE live training metrics (reference: the WS progress
                callback in studio/backend/core/training/trainer.py:280 —
                here an SSE tail of the worker's metrics.jsonl, which
                survives worker crashes because the file does).

                Events: ``metric`` per metrics.jsonl line (skipping the
                first ``after``), ``status`` heartbeats while the line is
                quiet, and a final ``done`` carrying the job status."""
                job = server.jobs.job
                self._sse_start()
                try:
                    if not job:
                        self._sse({"running": False}, event="done")
                        return
                    path = os.path.join(job["output_dir"],
                                        "metrics.jsonl")
                    f, n_seen = None, 0

                    def drain():
                        nonlocal f, n_seen
                        if f is None:
                            if not os.path.exists(path):
                                return
                            f = open(path)
                        while True:
                            pos = f.tell()
                            line = f.readline()
                            if not line:
                                return
                            if not line.endswith("\n"):
                                f.seek(pos)  # partial write; retry later
                                return
                            n_seen += 1
                            if n_seen <= after or not line.strip():
                                continue
                            try:
                                self._sse(json.loads(line),
                                          event="metric")
                            except json.JSONDecodeError:
                                pass

                    last_beat = 0.0
                    while True:
                        running = server.jobs.status().get("running")
                        drain()
                        if not running:
                            drain()  # final lines written before exit
                            self._sse(server.jobs.status(), event="done")
                            return
                        now = time.time()
                        if now - last_beat > 2.0:
                            self._sse({"running": True, "seen": n_seen},
                                      event="status")
                            last_beat = now
                        time.sleep(0.25)
                except (BrokenPipeError, ConnectionResetError):
                    return  # client went away; the worker is unaffected
                finally:
                    if "f" in locals() and f is not None:
                        f.close()

            def do_POST(self):
                if self.path.startswith(("/api/", "/v1/")) and self._gate():
                    return
                server._count_request(self.path)
                if self.path.startswith("/api/"):
                    length = int(self.headers.get("Content-Length", 0))
                    try:
                        body = json.loads(self.rfile.read(length) or b"{}")
                    except json.JSONDecodeError:
                        return self._send(400, {"error": "invalid JSON"})
                    try:
                        if self.path == "/api/train/start":
                            ds = body.get("dataset")
                            if isinstance(ds, str):
                                # uploaded-dataset names resolve to their
                                # stored jsonl (wizard: upload -> train)
                                p = os.path.join(server._datasets_dir(),
                                                 ds + ".jsonl")
                                if os.path.exists(p):
                                    body["dataset"] = p
                            return self._send(200,
                                              server.jobs.start(body))
                        if self.path == "/api/train/stop":
                            return self._send(200, server.jobs.stop())
                        if self.path == "/api/estimate":
                            from ..utils.memory import (
                                estimate_hbm, estimate_hbm_for_config)

                            name = body.pop("model_name", None)
                            if name:
                                from ..models.config import load_hf_config
                                from ..models.loader import \
                                    _resolve_model_path

                                try:
                                    hf = load_hf_config(
                                        _resolve_model_path(name))
                                except FileNotFoundError:
                                    return self._send(404, {
                                        "error": f"{name!r} is not a "
                                        "local checkpoint (offline "
                                        "image); pass explicit dims "
                                        "(vocab_size, hidden_size, "
                                        "intermediate_size, num_layers, "
                                        "num_heads) instead"})
                                return self._send(
                                    200, estimate_hbm_for_config(
                                        hf, **body))
                            return self._send(200, estimate_hbm(**body))
                        if self.path == "/api/export":
                            return self._send(200,
                                              server.start_export(body))
                        if self.path == "/api/datasets":
                            return self._send(200,
                                              server.dataset_save(body))
                        if self.path == "/api/hub/download":
                            return self._send(200,
                                              server.hub_download(body))
                        if self.path == "/api/rag/kbs":
                            return self._send(
                                200, server.rag.create_kb(body["name"]))
                        if self.path == "/api/rag/kbs/delete":
                            try:
                                server.rag.delete_kb(body["id"])
                                return self._send(200, {"ok": True})
                            except FileNotFoundError:
                                return self._send(404,
                                                  {"error": "no such kb"})
                        if self.path == "/api/rag/docs":
                            try:
                                return self._send(200, server.rag.
                                                  add_document(
                                                      body["kb_id"],
                                                      body["name"],
                                                      body["text"]))
                            except FileNotFoundError:
                                return self._send(404,
                                                  {"error": "no such kb"})
                        if self.path == "/api/rag/docs/delete":
                            try:
                                server.rag.delete_doc(body["kb_id"],
                                                      body["doc_id"])
                                return self._send(200, {"ok": True})
                            except FileNotFoundError:
                                return self._send(
                                    404, {"error": "no such doc"})
                        if self.path == "/api/rag/search":
                            try:
                                return self._send(200, {
                                    "hits": server.rag.search(
                                        body["kb_id"], body["query"],
                                        int(body.get("k", 5)))})
                            except FileNotFoundError:
                                return self._send(404,
                                                  {"error": "no such kb"})
                        if self.path == "/api/settings":
                            return self._send(200,
                                              server.settings_put(body))
                        if self.path == "/api/prompts":
                            return self._send(200,
                                              server.prompts_add(body))
                        if self.path == "/api/prompts/delete":
                            server.prompts_delete(body["id"])
                            return self._send(200, {"ok": True})
                        if self.path == "/api/mcp/servers":
                            return self._send(200, server.mcp_add(body))
                        if self.path == "/api/mcp/servers/delete":
                            server.mcp_delete(body["id"])
                            return self._send(200, {"ok": True})
                        if self.path == "/api/whisper/transcribe":
                            return self._send(
                                200, server.whisper_transcribe_api(body))
                        if self.path == "/api/recipe/jobs":
                            return self._send(
                                200, server.recipes.create(body))
                        if self.path.startswith("/api/recipe/jobs/"):
                            parts = self.path.strip("/").split("/")
                            jid, leaf = parts[3], parts[4]
                            if leaf == "cancel":
                                return self._send(
                                    200, server.recipes.cancel(jid))
                            if leaf == "publish":
                                return self._send(
                                    200, server.recipes.publish(
                                        jid, body["name"]))
                        if self.path == "/api/research":
                            return self._send(
                                202, server.research.create(body))
                        if self.path.startswith("/api/research/"):
                            parts = self.path.strip("/").split("/")
                            rid, leaf = parts[2], parts[3]
                            if leaf == "plan":
                                return self._send(
                                    200, server.research.update_plan(
                                        rid, body["plan"],
                                        body["expected_revision"]))
                            if leaf == "approve":
                                return self._send(
                                    200, server.research.approve(
                                        rid, body["plan_revision"],
                                        body["plan_hash"]))
                            if leaf == "cancel":
                                return self._send(
                                    200, server.research.cancel(rid))
                            if leaf == "retry":
                                return self._send(
                                    200, server.research.retry(rid))
                        return self._send(404, {"error": "not found"})
                    except KeyError as e:
                        return self._send(400, {"error":
                                                f"missing field: {e}"})
                    except (TypeError, IndexError) as e:
                        return self._send(400, {"error": str(e)})
                    except FileNotFoundError as e:
                        return self._send(404,
                                          {"error": f"not found: {e}"})
                    except RuntimeError as e:
                        return self._send(409, {"error": str(e)})
                if self.path == "/v1/audio/speech":
                    length = int(self.headers.get("Content-Length", 0))
                    try:
                        body = json.loads(self.rfile.read(length)
                                          or b"{}")
                        wav = server.audio_speech_api(body)
                        self.send_response(200)
                        self.send_header("Content-Type", "audio/wav")
                        self.send_header("Content-Length",
                                         str(len(wav)))
                        self.end_headers()
                        self.wfile.write(wav)
                        return
                    except KeyError as e:
                        return self._send(400, {"error":
                                                f"missing field: {e}"})
                    except (TypeError, ValueError) as e:
                        return self._send(400, {"error": str(e)})
                    except FileNotFoundError as e:
                        return self._send(404,
                                          {"error": f"not found: {e}"})
                if self.path == "/v1/images/generations":
                    length = int(self.headers.get("Content-Length", 0))
                    try:
                        body = json.loads(self.rfile.read(length)
                                          or b"{}")
                        return self._send(200,
                                          server.images_generate(body))
                    except KeyError as e:
                        return self._send(400, {"error":
                                                f"missing field: {e}"})
                    except (TypeError, ValueError) as e:
                        return self._send(400, {"error": str(e)})
                    except FileNotFoundError as e:
                        return self._send(404,
                                          {"error": f"not found: {e}"})
                if self.path == "/v1/audio/transcriptions":
                    # OpenAI-compatible STT: multipart {file, model} or
                    # JSON {audio|audio_b64, model}
                    length = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(length)
                    ctype = self.headers.get("Content-Type", "")
                    try:
                        if ctype.startswith("multipart/form-data"):
                            fields = _parse_multipart(ctype, raw)
                            if "file" not in fields:
                                raise KeyError("file")
                            import base64

                            body = {"audio_b64": base64.b64encode(
                                fields["file"][1]).decode()}
                            if "model" in fields:
                                body["model"] = fields["model"][1] \
                                    .decode().strip()
                        else:
                            body = json.loads(raw or b"{}")
                        return self._send(
                            200, server.whisper_transcribe_api(body))
                    except KeyError as e:
                        return self._send(400, {"error":
                                                f"missing field: {e}"})
                    except (TypeError, ValueError) as e:
                        return self._send(400, {"error": str(e)})
                    except FileNotFoundError as e:
                        return self._send(404,
                                          {"error": f"not found: {e}"})
                if server.model is None and self.path.startswith("/v1/"):
                    return self._send(503, {"error":
                                            "no model loaded for chat"})
                return super().do_POST()

        return Handler

    def start_export(self, config: Dict[str, Any]) -> Dict[str, Any]:
        """Export as a subprocess CLI job (merged / lora / gguf)."""
        out_dir = config.get("output_dir") or os.path.join(
            self.jobs.workdir, "export-" + uuid.uuid4().hex[:8])
        args = [sys.executable, "-m", "unsloth_tpu.cli", "export",
                "--model_name", config["model_name"],
                "--output", out_dir,
                "--format", config.get("format", "merged")]
        if config.get("adapter"):
            args += ["--adapter", config["adapter"]]
        if config.get("quantization"):
            args += ["--quantization", config["quantization"]]
        log_path = out_dir + ".log"
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        proc = subprocess.Popen(args, stdout=open(log_path, "w"),
                                stderr=subprocess.STDOUT)
        return {"pid": proc.pid, "output_dir": out_dir, "log": log_path}
