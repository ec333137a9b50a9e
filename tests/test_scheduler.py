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


def test_single_request_matches_full_forward(model):
    prompt = [3, 14, 15, 92, 65, 35]
    ref = _greedy_reference(model, prompt, 6)
    cb = ContinuousBatcher(model, max_batch=2, max_len=128)
    rid = cb.submit(prompt, max_new_tokens=6)
    out = cb.run()
    assert out[rid] == ref, (out[rid], ref)


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
