"""Studio backend tests: auth gate, dashboard, job lifecycle over real
HTTP with a real training subprocess, models/estimate routes (reference:
studio/backend tests + auth/ hashed-API-key gate)."""

import json
import os
import time
import urllib.request

import pytest

from tests.helpers import TINY_LLAMA, make_hf_checkpoint
from unsloth_tpu.studio.server import StudioServer

TOKEN = "test-studio-token"


def _req(url, path, body=None, method=None, token=TOKEN):
    data = json.dumps(body).encode() if body is not None else None
    headers = {"Content-Type": "application/json"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url + path, data=data, method=method,
                                 headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, (json.loads(r.read())
                              if "json" in r.headers.get("Content-Type", "")
                              else r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def studio(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("jobs"))
    srv = StudioServer(workdir=workdir, token=TOKEN)
    httpd = srv.serve(port=18372, background=True)
    yield "http://127.0.0.1:18372", srv, tmp_path_factory
    srv.jobs.stop()
    httpd.shutdown()


def test_auth_gate(studio):
    """API endpoints reject missing/wrong tokens; dashboard stays open."""
    url, _, _ = studio
    code, _ = _req(url, "/api/train/status", token=None)
    assert code == 401
    code, _ = _req(url, "/api/train/status", token="wrong")
    assert code == 401
    code, _ = _req(url, "/api/train/stop", {}, token=None)
    assert code == 401
    code, _ = _req(url, "/v1/chat/completions",
                   {"messages": []}, token=None)
    assert code == 401
    code, html = _req(url, "/", token=None)
    assert code == 200 and "unsloth_tpu studio" in html


def test_dashboard_and_status(studio):
    url, _, _ = studio
    code, html = _req(url, "/")
    assert code == 200 and "unsloth_tpu studio" in html
    code, status = _req(url, "/api/train/status")
    assert code == 200 and status["running"] is False
    code, m = _req(url, "/api/metrics")
    assert m["entries"] == []


def test_models_route(studio):
    url, _, _ = studio
    code, out = _req(url, "/api/models?q=llama-3.1")
    assert code == 200
    assert any("Llama-3.1" in m for m in out["models"])


def test_estimate_route(studio):
    url, _, _ = studio
    code, out = _req(url, "/api/estimate", {
        "vocab_size": 128256, "hidden_size": 4096,
        "intermediate_size": 14336, "num_layers": 32,
        "num_heads": 32, "num_kv_heads": 8,
        "seq_length": 8192, "batch_size": 1, "load_in_4bit": True})
    assert code == 200
    # llama-3.1-8B QLoRA at 8K measured 15.2 GB peak: estimate in range
    assert 4 < out["weights_gb"] < 5
    assert 8 < out["total_gb"] < 18
    assert isinstance(out["fits"], bool)


def test_chat_without_model_is_503(studio):
    url, _, _ = studio
    code, body = _req(url, "/v1/chat/completions",
                      {"messages": [{"role": "user", "content": "x"}]})
    assert code == 503


@pytest.mark.slow
def test_training_job_lifecycle(studio):
    url, srv, tmp = studio
    data_dir = str(tmp.mktemp("data"))
    ckpt = os.path.join(data_dir, "ckpt")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    dataset = os.path.join(data_dir, "d.jsonl")
    with open(dataset, "w") as f:
        for i in range(6):
            f.write(json.dumps(
                {"input_ids": list(range(3, 30))}) + "\n")

    code, out = _req(url, "/api/train/start", {
        "model_name": ckpt, "dataset": dataset, "max_steps": 2,
        "max_seq_length": 32, "per_device_train_batch_size": 2,
        "gradient_accumulation_steps": 1, "platform": "cpu"})
    assert code == 200 and "job_id" in out, out

    # double-start rejected while running
    code2, _ = _req(url, "/api/train/start", {
        "model_name": ckpt, "dataset": dataset})
    assert code2 in (409, 200)  # may already have finished

    deadline = time.time() + 240
    while time.time() < deadline:
        code, status = _req(url, "/api/train/status")
        if not status["running"]:
            break
        time.sleep(2)
    assert status["running"] is False
    assert status.get("returncode") == 0, status

    code, m = _req(url, "/api/metrics")
    assert len(m["entries"]) >= 2
    assert "loss" in m["entries"][-1]

    code, jobs = _req(url, "/api/jobs")
    assert code == 200 and len(jobs["jobs"]) >= 1


@pytest.mark.slow
def test_train_stream_sse_live(studio):
    """/api/train/stream pushes per-step metric events WHILE the job is
    running — the SSE replacement for polling (reference: the WS progress
    callback in studio/backend/core/training/trainer.py:280)."""
    import threading

    url, srv, tmp = studio
    data_dir = str(tmp.mktemp("sse_data"))
    ckpt = os.path.join(data_dir, "ckpt")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    dataset = os.path.join(data_dir, "d.jsonl")
    with open(dataset, "w") as f:
        for i in range(16):
            f.write(json.dumps({"input_ids": list(range(3, 30))}) + "\n")

    code, out = _req(url, "/api/train/start", {
        "model_name": ckpt, "dataset": dataset, "max_steps": 8,
        "max_seq_length": 32, "per_device_train_batch_size": 2,
        "gradient_accumulation_steps": 1, "platform": "cpu"})
    assert code == 200 and "job_id" in out, out

    events = []  # (arrival time, event name, payload)

    def read_stream():
        req = urllib.request.Request(
            url + "/api/train/stream",
            headers={"Authorization": f"Bearer {TOKEN}"})
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            ev = None
            for raw in r:
                line = raw.decode().rstrip("\n")
                if line.startswith("event: "):
                    ev = line[7:]
                elif line.startswith("data: "):
                    events.append((time.time(), ev,
                                   json.loads(line[6:])))
                    if ev == "done":
                        return
                    ev = None

    reader = threading.Thread(target=read_stream, daemon=True)
    reader.start()

    deadline = time.time() + 240
    job_end = None
    while time.time() < deadline:
        _, status = _req(url, "/api/train/status")
        if not status["running"]:
            job_end = time.time()
            break
        time.sleep(0.5)
    assert job_end is not None and status.get("returncode") == 0, status
    reader.join(timeout=30)
    assert not reader.is_alive()

    names = [e[1] for e in events]
    assert names[-1] == "done"
    metrics = [e for e in events if e[1] == "metric"]
    assert len(metrics) >= 8, names
    assert all("loss" in e[2] for e in metrics)
    # liveness: metric events STREAMED while the worker was still alive,
    # not dumped after the fact
    early = [e for e in metrics if e[0] < job_end]
    assert len(early) >= 2, (len(early), job_end, names)


def test_resume_validation_rejects_bad_dir(studio):
    url, _, tmp = studio
    code, out = _req(url, "/api/train/start", {
        "model_name": "x", "dataset": "y",
        "resume_from": str(tmp.mktemp("empty"))})
    assert code == 409
    assert "checkpoint" in out["error"]


def test_spa_served_and_new_routes(studio):
    """The multi-view SPA (studio/app.html) is served at / with all six
    views; families + per-job metrics endpoints answer (reference:
    studio/frontend React app surface)."""
    url, srv, _ = studio
    code, html = _req(url, "/", token=None)
    assert code == 200
    for view in ("Dashboard", "Train", "Chat", "Models", "Export",
                 "Jobs"):
        assert view in html, view
    assert "api/train/start" in html or "train/start" in html

    code, fams = _req(url, "/api/models/families")
    assert code == 200 and "llama" in fams["families"]

    code, out = _req(url, "/api/jobs/nonexistent1/metrics")
    assert code == 200 and out["entries"] == []

    code, out = _req(url, "/api/jobs/../../etc/metrics")
    assert code == 400

    # recipe pipeline builder (reference frontend's data-recipe node
    # editor): step list + op palette with every engine op wired up
    for marker in ("rc_steps", "rc_addop", "OPDEFS", "llm_generate",
                   "train_fraction"):
        assert marker in html, marker


def test_estimate_with_model_name(studio):
    """model_name resolution: a local checkpoint dir feeds
    estimate_hbm_for_config; an unknown hub name gets a clear 404."""
    url, _, tmp = studio
    path = str(tmp.mktemp("est"))
    make_hf_checkpoint(path, TINY_LLAMA)
    code, out = _req(url, "/api/estimate", {
        "model_name": path, "seq_length": 512, "batch_size": 1,
        "load_in_4bit": True})
    assert code == 200 and "total_gb" in out

    code, out = _req(url, "/api/estimate", {
        "model_name": "org/definitely-not-local", "seq_length": 512})
    assert code == 404 and "dims" in out["error"]


def test_datasets_routes(studio):
    """Upload -> list -> preview (reference:
    studio/backend/routes/datasets.py)."""
    url, srv, _ = studio
    rows = [{"text": f"example {i}"} for i in range(5)]
    code, out = _req(url, "/api/datasets",
                     {"name": "my-set", "rows": rows})
    assert code == 200 and out["rows"] == 5
    code, out = _req(url, "/api/datasets")
    assert code == 200
    assert any(d["name"] == "my-set" and d["rows"] == 5
               for d in out["datasets"])
    code, out = _req(url, "/api/datasets/my-set/preview")
    assert code == 200 and out["rows"][0] == {"text": "example 0"}
    # raw jsonl text upload
    code, out = _req(url, "/api/datasets",
                     {"name": "raw", "text": '{"a": 1}\n{"a": 2}\n'})
    assert code == 200 and out["rows"] == 2
    # bad name rejected
    code, out = _req(url, "/api/datasets",
                     {"name": "../evil", "rows": rows})
    assert code == 400
    # missing dataset 404
    code, _ = _req(url, "/api/datasets/nope/preview")
    assert code == 404
    # auth still gates
    code, _ = _req(url, "/api/datasets", token=None)
    assert code == 401


def test_hub_download_route(studio, tmp_path_factory):
    """Hub resolution worker (reference: hub/workers/hf_download.py):
    a local checkpoint resolves with its file list; a missing model
    reports a structured error."""
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint

    url, srv, _ = studio
    ckpt = str(tmp_path_factory.mktemp("hub") / "m")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    code, out = _req(url, "/api/hub/download", {"model_name": ckpt})
    assert code == 200
    jid = out["job_id"]
    code, st = _req(url, f"/api/hub/downloads/{jid}")
    assert code == 200 and st["status"] == "done"
    assert any(f["name"].endswith(".safetensors") for f in st["files"])

    code, out = _req(url, "/api/hub/download",
                     {"model_name": "no/such-model-xyz"})
    jid = out["job_id"]
    code, st = _req(url, f"/api/hub/downloads/{jid}")
    assert st["status"] == "error" and st["error"]


def test_chat_history_route(studio):
    url, srv, _ = studio
    code, out = _req(url, "/api/chat/history")
    assert code == 200 and out["entries"] == []
    # log an entry through the server-side hook
    import os

    with open(os.path.join(srv.jobs.workdir, "chat_history.jsonl"),
              "a") as f:
        f.write(json.dumps({"ts": 0, "messages": [],
                            "response": {"role": "assistant",
                                         "content": "hi"}}) + "\n")
    code, out = _req(url, "/api/chat/history")
    assert len(out["entries"]) == 1


def test_audio_speech_endpoint(studio):
    """/v1/audio/speech (OpenAI TTS shape): speaker waveform comes back
    as a WAV body; 404 when no TTS model is configured."""
    import numpy as np

    from unsloth_tpu.data.audio import decode_wav

    url, srv, _ = studio
    wave = np.sin(np.linspace(0, 2 * np.pi * 10, 2400)) \
        .astype(np.float32)

    class Speaker:
        def speak(self, text, voice=None):
            assert text == "hello" and voice == "tara"
            return wave, 24000

    srv.tts_speaker = Speaker()
    try:
        req = urllib.request.Request(
            url + "/v1/audio/speech",
            data=json.dumps({"input": "hello", "voice": "tara"}).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {TOKEN}"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            audio, rate = decode_wav(r.read())
        assert rate == 24000
        assert np.max(np.abs(audio - wave)) < 1e-3  # int16 quantization
    finally:
        srv.tts_speaker = None
    code, body = _req(url, "/v1/audio/speech", {"input": "x"})
    assert code == 404


def test_orpheus_speaker_pipeline():
    """OrpheusSpeaker: prompt framing -> generate -> SNAC layer split ->
    codec decode, with the exact token protocol of data/tts.py."""
    import numpy as np

    from unsloth_tpu.data.tts import (ORPHEUS_TOKENS, OrpheusSpeaker,
                                      interleave_snac_codes)

    l0, l1, l2 = [5, 9], [1, 2, 3, 4], [10, 11, 12, 13, 14, 15, 16, 17]
    codes = interleave_snac_codes([l0, l1, l2])

    class Tok:
        def encode(self, s, add_special_tokens=True):
            return [ord(c) for c in s]

    class Model:
        def generate(self, prompts, params, **kw):
            ids = prompts[0]
            t = ORPHEUS_TOKENS
            # prompt framing must match the training-side example
            assert ids[0] == t.start_of_human
            assert ids[-2:] == [t.start_of_ai, t.start_of_speech]
            assert kw.get("return_token_ids")
            return [list(codes) + [t.end_of_speech]]

    class Codec:
        def decode(self, layers):
            assert list(layers[0]) == l0
            assert list(layers[1]) == l1
            assert list(layers[2]) == l2
            return np.ones(64, np.float32) * 0.5

    spk = OrpheusSpeaker(Model(), Tok(), Codec())
    audio, rate = spk.speak("hi", voice="tara")
    assert rate == 24000 and audio.shape == (64,)
    assert np.allclose(audio, 0.5)
