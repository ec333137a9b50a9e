"""Continuous batching over the paged KV pool (reference: llama-server's
admission control / continuous batching, studio llama_admission.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.inference.scheduler import ContinuousBatcher
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_params


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=None)
    return LanguageModel(cfg=cfg,
                        params=init_params(cfg, jax.random.PRNGKey(0)))


def _greedy_reference(model, prompt, n):
    """Reference greedy continuation via full-forward logits."""
    ids = list(prompt)
    for _ in range(n):
        logits = model.logits(jnp.asarray([ids]))
        ids.append(int(jnp.argmax(logits[0, -1])))
    return ids[len(prompt):]


@pytest.mark.slow
def test_single_request_matches_full_forward(model):
    prompt = [3, 14, 15, 92, 65, 35]
    ref = _greedy_reference(model, prompt, 6)
    cb = ContinuousBatcher(model, max_batch=2, max_len=128)
    rid = cb.submit(prompt, max_new_tokens=6)
    out = cb.run()
    assert out[rid] == ref, (out[rid], ref)


@pytest.mark.slow
def test_concurrent_and_staggered_requests(model):
    p1 = [3, 14, 15, 92]
    p2 = [27, 18, 28, 18, 28, 45, 90, 45]
    p3 = [11, 22, 33]
    refs = {i: _greedy_reference(model, p, n)
            for i, (p, n) in enumerate([(p1, 5), (p2, 7), (p3, 4)])}
    cb = ContinuousBatcher(model, max_batch=2, max_len=128)
    r1 = cb.submit(p1, max_new_tokens=5)
    r2 = cb.submit(p2, max_new_tokens=7)
    r3 = cb.submit(p3, max_new_tokens=4)   # queued until a slot frees
    out = cb.run()
    assert out[r1] == refs[0]
    assert out[r2] == refs[1]
    assert out[r3] == refs[2]


def test_pages_are_reclaimed(model):
    cb = ContinuousBatcher(model, max_batch=2, max_len=128, page_size=64)
    used0 = cb.alloc.pages_in_use()
    for i in range(4):
        cb.submit([5, 6, 7, 8], max_new_tokens=3)
    cb.run()
    assert cb.alloc.pages_in_use() == used0  # everything freed


def test_server_continuous_batching(model):
    """Concurrent HTTP chat requests share the batched decode loop and
    each gets its own greedy completion."""
    import json
    import threading
    import urllib.request

    class Tok:
        eos_token_id = None
        pad_token_id = 0
        chat_template = None

        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 100 + 3 for c in text[:12]]}

        def decode(self, ids, **kw):
            return " ".join(str(i) for i in ids)

    from unsloth_tpu.inference.server import InferenceServer

    model.tokenizer = Tok()
    srv = InferenceServer(model, Tok(), continuous_batching=True,
                          max_batch=2, max_len=128)
    httpd = srv.serve(port=18975, background=True)
    try:
        results = {}

        def hit(name, content):
            body = json.dumps({
                "messages": [{"role": "user", "content": content}],
                "max_tokens": 5}).encode()
            req = urllib.request.Request(
                "http://127.0.0.1:18975/v1/chat/completions", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                results[name] = json.loads(r.read())

        threads = [threading.Thread(target=hit, args=(i, f"hello {i}"))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 3
        for r in results.values():
            msg = r["choices"][0]["message"]["content"]
            assert msg and msg.split()
    finally:
        srv._batcher.stop()
        httpd.shutdown()


def test_server_streaming_continuous_batching(model):
    """stream=true over the shared decode loop: true per-token deltas
    (more than one content chunk for a multi-token completion)."""
    import json
    import urllib.request

    class Tok:
        eos_token_id = None
        pad_token_id = 0
        chat_template = None

        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 100 + 3 for c in text[:12]]}

        def decode(self, ids, **kw):
            return " ".join(str(i) for i in ids)

    from unsloth_tpu.inference.server import InferenceServer

    model.tokenizer = Tok()
    srv = InferenceServer(model, Tok(), continuous_batching=True,
                          max_batch=2, max_len=128)
    httpd = srv.serve(port=18976, background=True)
    try:
        body = json.dumps({
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 6, "stream": True}).encode()
        req = urllib.request.Request(
            "http://127.0.0.1:18976/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"})
        deltas = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for raw in r:
                line = raw.decode().rstrip("\n")
                if line.startswith("data: ") and line != "data: [DONE]":
                    c = json.loads(line[6:])
                    d = c["choices"][0]["delta"].get("content")
                    if d:
                        deltas.append(d)
        # one delta per decode step (modulo detok holdback): streaming,
        # not one blob at the end
        assert len(deltas) >= 3, deltas
        assert len("".join(deltas).split()) == 6
    finally:
        httpd.shutdown()
        if srv._batcher:
            srv._batcher.stop()


# ---------------------------------------------------------------------------
# Automatic prefix caching (the vLLM APC analog)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_prefix_cache_reuses_pages_and_matches(model):
    """Second request with the same long prompt reuses cached KV pages
    (cached_tokens > 0, fewer fresh allocations) and its output is
    identical to the uncached run."""
    prompt = list(np.random.RandomState(0).randint(3, 120, 100))
    ref = _greedy_reference(model, prompt, 5)

    cb = ContinuousBatcher(model, max_batch=1, max_len=256, page_size=32,
                           prefix_caching=True)
    r1 = cb.submit(prompt, max_new_tokens=5)
    out1 = cb.run()
    assert out1[r1] == ref
    assert cb.requests[r1].cached_tokens == 0

    used_before = cb.alloc.pages_in_use()
    r2 = cb.submit(prompt, max_new_tokens=5)
    out2 = cb.run()
    assert out2[r2] == ref
    # 100-token prompt @ page 32 -> 3 full pages cached
    assert cb.requests[r2].cached_tokens == 96
    assert cb.alloc.pages_in_use() == used_before  # nothing leaked


@pytest.mark.slow
def test_prefix_cache_partial_prefix(model):
    """A request sharing only a prefix reuses the common full pages and
    still decodes exactly."""
    rng = np.random.RandomState(1)
    common = list(rng.randint(3, 120, 64))
    a = common + list(rng.randint(3, 120, 10))
    b = common + list(rng.randint(3, 120, 12))
    ref_a = _greedy_reference(model, a, 4)
    ref_b = _greedy_reference(model, b, 4)

    cb = ContinuousBatcher(model, max_batch=1, max_len=256, page_size=32,
                           prefix_caching=True)
    ra = cb.submit(a, max_new_tokens=4)
    out = cb.run()
    assert out[ra] == ref_a
    rb = cb.submit(b, max_new_tokens=4)
    out = cb.run()
    assert out[rb] == ref_b
    assert cb.requests[rb].cached_tokens == 64  # the two common pages


@pytest.mark.slow
def test_prefix_cache_eviction_under_pressure(model):
    """When the pool runs dry, unreferenced cached pages are evicted and
    admission succeeds."""
    cb = ContinuousBatcher(model, max_batch=1, max_len=128, page_size=32,
                           n_pages=9, prefix_caching=True)
    rng = np.random.RandomState(2)
    refs = []
    for i in range(4):
        p = list(rng.randint(3, 120, 64))
        refs.append((p, _greedy_reference(model, p, 3)))
    for p, want in refs:
        rid = cb.submit(p, max_new_tokens=3)
        out = cb.run()
        assert out[rid] == want


# ---------------------------------------------------------------------------
# Speculative decoding inside the shared loop
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_spec_batcher_matches_plain(model):
    """speculative=True produces the same greedy outputs as the plain
    loop for a mixed batch, with per-slot acceptance/rewind."""
    rng = np.random.RandomState(0)
    phrase = list(rng.randint(3, 120, 8))
    prompts = [phrase * 6,                       # self-similar: accepts
               list(rng.randint(3, 120, 20)),    # random: mostly rejects
               phrase * 4]
    ns = [10, 6, 8]
    refs = [_greedy_reference(model, p, n) for p, n in zip(prompts, ns)]

    cb = ContinuousBatcher(model, max_batch=2, max_len=256,
                           speculative=True, draft_len=4)
    rids = [cb.submit(p, max_new_tokens=n) for p, n in zip(prompts, ns)]
    out = cb.run()
    for rid, want in zip(rids, refs):
        assert out[rid] == want, (out[rid], want)


@pytest.mark.slow
def test_spec_batcher_takes_fewer_steps(model):
    """On a self-similar prompt the spec loop uses measurably fewer
    decode steps than tokens generated."""
    phrase = [11, 12, 13, 14, 15, 16, 17, 18]
    prompt = phrase * 6
    n = 24
    ref = _greedy_reference(model, prompt, n)

    cb = ContinuousBatcher(model, max_batch=1, max_len=256,
                           speculative=True, draft_len=6)
    rid = cb.submit(prompt, max_new_tokens=n)
    steps = 0
    while cb.step() or cb.queue:
        steps += 1
    assert cb.requests[rid].output_ids == ref
    assert steps < n, steps


def test_spec_batcher_eos_and_reclaim(model):
    """EOS inside an accepted block finishes the request; pages are
    reclaimed."""
    cb = ContinuousBatcher(model, max_batch=2, max_len=128,
                           speculative=True, draft_len=4)
    used0 = cb.alloc.pages_in_use()
    for _ in range(3):
        cb.submit([5, 6, 7, 8, 5, 6, 7, 8], max_new_tokens=5)
    cb.run()
    assert cb.alloc.pages_in_use() == used0


@pytest.mark.slow
def test_spec_plus_prefix_caching_compose(model):
    """Both serving features on at once: cached prefix pages + block
    verify + per-slot rewind still produce exact greedy outputs."""
    prompt = list(np.random.RandomState(4).randint(3, 120, 80))
    ref = _greedy_reference(model, prompt, 6)
    cb = ContinuousBatcher(model, max_batch=1, max_len=256, page_size=32,
                           prefix_caching=True, speculative=True,
                           draft_len=4)
    r1 = cb.submit(prompt, max_new_tokens=6)
    out = cb.run()
    assert out[r1] == ref
    r2 = cb.submit(prompt, max_new_tokens=6)
    out = cb.run()
    assert out[r2] == ref
    assert cb.requests[r2].cached_tokens == 64
