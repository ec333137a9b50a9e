"""Paged KV-cache tests: logits parity with the dense cache through
prefill + decode (non-trivially shuffled page tables), pool reuse via the
allocator (reference: models/llama.py:346-565 paged inference buffers)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.inference.decode import (forward_with_cache, init_cache,
                                          logits_from_hidden)
from unsloth_tpu.inference.paged import (PageAllocator, PagedKVCache,
                                         forward_paged, gather_pages,
                                         init_paged_cache)
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_params


def _cfg():
    return ModelConfig(vocab_size=128, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=2,
                       num_kv_heads=2, max_position_embeddings=64)


def test_allocator_reuse():
    a = PageAllocator(8)
    p1 = a.alloc("s1", 3)
    p2 = a.alloc("s2", 4)
    assert len(set(p1) | set(p2)) == 7
    assert a.pages_in_use() == 7
    with pytest.raises(RuntimeError):
        a.alloc("s3", 2)
    a.free_seq("s1")
    p3 = a.alloc("s3", 3)
    assert set(p3) == set(p1)  # pages recycled


@pytest.mark.slow
def test_paged_matches_dense_decode(rng):
    """Prefill + 3 decode steps: paged logits == dense-cache logits, with
    a shuffled page table proving the indirection is real."""
    cfg = _cfg()
    params = init_params(cfg, rng, dtype=jnp.float32)
    b, t = 2, 8
    ids = jax.random.randint(rng, (b, t), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                 (b, t))

    # dense path
    dense = init_cache(cfg, b, 32, dtype=jnp.float32)
    h_d, dense = forward_with_cache(params, None, ids, cfg, dense,
                                    positions=positions)

    # paged path: 4-slot pages, deliberately scrambled pool order
    ps, max_pages = 4, 8
    paged = init_paged_cache(cfg, n_pages=32, page_size=ps, batch=b,
                             max_pages_per_seq=max_pages,
                             dtype=jnp.float32)
    alloc = PageAllocator(32)
    table = np.zeros((b, max_pages), np.int32)
    rng_np = np.random.RandomState(0)
    for s in range(b):
        pages = alloc.alloc(s, max_pages)
        rng_np.shuffle(pages)
        table[s] = pages
    paged = PagedKVCache(paged.k_pool, paged.v_pool,
                         jnp.asarray(table), paged.seq_lens)
    h_p, paged = forward_paged(params, None, ids, cfg, paged,
                               positions=positions)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_d),
                               atol=1e-5, rtol=1e-4)

    # three decode steps
    last = ids[:, -1:]
    for step in range(3):
        pos = jnp.full((b, 1), t + step, jnp.int32)
        tok = jax.random.randint(jax.random.fold_in(rng, step), (b, 1), 0,
                                 cfg.vocab_size)
        h_d, dense = forward_with_cache(params, None, tok, cfg, dense,
                                        positions=pos)
        h_p, paged = forward_paged(params, None, tok, cfg, paged,
                                   positions=pos)
        ld = logits_from_hidden(params, h_d, cfg)
        lp = logits_from_hidden(params, h_p, cfg)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                                   atol=1e-5, rtol=1e-4)
    assert int(paged.seq_lens[0]) == t + 3


def test_gather_pages_layout(rng):
    pool = jax.random.normal(rng, (6, 2, 1, 4), jnp.float32)
    table = jnp.asarray([[4, 1, 0], [2, 3, 5]], jnp.int32)
    out = gather_pages(pool, table)
    assert out.shape == (2, 6, 1, 4)
    np.testing.assert_array_equal(np.asarray(out[0, :2]),
                                  np.asarray(pool[4]))
    np.testing.assert_array_equal(np.asarray(out[1, 2:4]),
                                  np.asarray(pool[3]))
