"""N-gram speculative decoding (inference/speculative.py).

The contract is exactness: greedy output must be bit-identical to the
plain decode loop, with fewer forward passes on self-similar text (the
reference reaches this feature through vLLM's ngram speculative config).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.inference.generate import (SamplingParams, _generate_jit,
                                            generate)
from unsloth_tpu.inference.speculative import (_generate_ngram_spec_jit,
                                               supports_ngram_spec)
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_params


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=2048, eos_token_id=None)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return LanguageModel(cfg=cfg, params=params)


def _plain(model, prompt_ids, prompt_mask, n, eos):
    sp = SamplingParams(max_tokens=n, temperature=0.0)
    return np.asarray(_generate_jit(
        model.params, None, jnp.asarray(prompt_ids),
        jnp.asarray(prompt_mask), model.cfg, jax.random.PRNGKey(0),
        n, eos, sp))


def _spec(model, prompt_ids, prompt_mask, n, eos, k=4):
    out, iters = _generate_ngram_spec_jit(
        model.params, None, jnp.asarray(prompt_ids),
        jnp.asarray(prompt_mask), model.cfg, n, eos, draft_len=k)
    return np.asarray(out), int(iters)


def _mask_after_eos(out, eos_set):
    """Plain loop zeroes tokens after EOS; spec stops writing — compare
    only up to and including the first EOS per row."""
    out = out.copy()
    for r in range(out.shape[0]):
        for i, t in enumerate(out[r]):
            if int(t) in eos_set:
                out[r, i + 1:] = 0
                break
    return out


@pytest.mark.slow
def test_spec_matches_plain_greedy_no_eos(model):
    rng = np.random.RandomState(0)
    b, t = 3, 16
    prompt = rng.randint(5, 120, (b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    mask[0, :5] = 0      # left-padded row
    prompt[0, :5] = 0
    eos = jnp.asarray([], jnp.int32)
    ref = _plain(model, prompt, mask, 24, eos)
    got, iters = _spec(model, prompt, mask, 24, eos)
    np.testing.assert_array_equal(got, ref)
    assert iters <= 24


@pytest.mark.slow
def test_spec_matches_plain_greedy_with_eos(model):
    """EOS semantics: identical emitted prefix, decode stops."""
    rng = np.random.RandomState(1)
    b, t = 2, 12
    prompt = rng.randint(5, 120, (b, t)).astype(np.int32)
    mask = np.ones((b, t), np.int32)
    # pick eos ids that the tiny random model actually emits
    probe = _plain(model, prompt, mask, 24, jnp.asarray([], jnp.int32))
    eos_id = int(probe[0, 10])
    eos = jnp.asarray([eos_id], jnp.int32)
    ref = _plain(model, prompt, mask, 24, eos)
    got, _ = _spec(model, prompt, mask, 24, eos)
    es = {eos_id}
    np.testing.assert_array_equal(_mask_after_eos(got, es),
                                  _mask_after_eos(ref, es))


@pytest.mark.slow
def test_spec_accepts_on_repetitive_context(model):
    """A context that is one repeated phrase must accept drafts: the
    loop takes measurably fewer forwards than tokens generated."""
    phrase = [11, 12, 13, 14, 15, 16, 17, 18]
    prompt = np.asarray([phrase * 6], np.int32)
    mask = np.ones_like(prompt)
    eos = jnp.asarray([], jnp.int32)
    n = 32
    ref = _plain(model, prompt, mask, n, eos)
    got, iters = _spec(model, prompt, mask, n, eos, k=6)
    np.testing.assert_array_equal(got, ref)
    # worst case (no accepts) would be n iterations; greedy continuation
    # of a tiny random model is itself repetitive, so lookup hits
    assert iters < n, iters


@pytest.mark.slow
def test_generate_api_speculative_flag(model):
    class Tok:
        eos_token_id = None

        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 120 + 5 for c in text]}

        def decode(self, ids, **kw):
            return "".join(chr(i) for i in ids)

    model.tokenizer = Tok()
    plain = generate(model, ["abcabcabc"], max_new_tokens=12,
                     temperature=0.0, return_token_ids=True)
    spec = generate(model, ["abcabcabc"], max_new_tokens=12,
                    temperature=0.0, return_token_ids=True,
                    speculative=True)
    assert spec == plain


def test_supports_gate():
    assert supports_ngram_spec(ModelConfig(
        vocab_size=8, hidden_size=8, intermediate_size=16, num_layers=1,
        num_heads=1, num_kv_heads=1, max_position_embeddings=32))
    assert not supports_ngram_spec(ModelConfig(
        vocab_size=8, hidden_size=8, intermediate_size=16, num_layers=1,
        num_heads=1, num_kv_heads=1, max_position_embeddings=32,
        sliding_window=16, layer_pattern=("sliding",)))


# ---------------------------------------------------------------------------
# Quantized KV cache (kv_cache_dtype) — llama.cpp --cache-type-k/v analog
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_fp8_kv_cache_generates_close(model):
    """fp8 KV storage must track bf16-KV greedy decode closely (identical
    for the vast majority of tokens on this tiny model) and never nan."""
    rng = np.random.RandomState(3)
    prompt = rng.randint(5, 120, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    eos = jnp.asarray([], jnp.int32)
    sp = SamplingParams(max_tokens=16, temperature=0.0)

    def run(kv):
        return np.asarray(_generate_jit(
            model.params, None, jnp.asarray(prompt), jnp.asarray(mask),
            model.cfg, jax.random.PRNGKey(0), 16, eos, sp, kv_dtype=kv))

    ref = run("bf16")
    got = run("fp8_e4m3")
    agreement = (got == ref).mean()
    assert agreement >= 0.75, (agreement, got, ref)
    assert np.all(got < model.cfg.vocab_size)


@pytest.mark.slow
def test_kv_cache_dtype_generate_api(model):
    class Tok:
        eos_token_id = None

        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 120 + 5 for c in text]}

        def decode(self, ids, **kw):
            return "".join(chr(i) for i in ids)

    model.tokenizer = Tok()
    out = generate(model, ["hello"], max_new_tokens=6, temperature=0.0,
                   kv_cache_dtype="fp8_e4m3", return_token_ids=True)
    assert len(out) == 1 and len(out[0]) <= 6
