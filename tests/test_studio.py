"""Studio backend tests: dashboard, job lifecycle over real HTTP with a
real training subprocess (reference: studio/backend tests)."""

import json
import os
import time
import urllib.request

import pytest

from tests.helpers import TINY_LLAMA, make_hf_checkpoint
from unsloth_tpu.studio.server import StudioServer


def _req(url, path, body=None, method=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url + path, data=data, method=method,
        headers={"Content-Type": "application/json"})
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
    srv = StudioServer(workdir=workdir)
    httpd = srv.serve(port=18372, background=True)
    yield "http://127.0.0.1:18372", srv, tmp_path_factory
    srv.jobs.stop()
    httpd.shutdown()


def test_dashboard_and_status(studio):
    url, _, _ = studio
    code, html = _req(url, "/")
    assert code == 200 and "unsloth_tpu studio" in html
    code, status = _req(url, "/api/train/status")
    assert code == 200 and status["running"] is False
    code, m = _req(url, "/api/metrics")
    assert m["entries"] == []


def test_chat_without_model_is_503(studio):
    url, _, _ = studio
    code, body = _req(url, "/v1/chat/completions",
                      {"messages": [{"role": "user", "content": "x"}]})
    assert code == 503


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
