"""Paged KV-cache decode buffers.

Parity target: the reference's preallocated paged inference buffers
(reference: models/llama.py:346-565 — fixed pools reused across requests
so batched serving never reallocates per sequence).

TPU-native design: one page pool per layer (``[n_pages, page_size, Hkv,
Dh]``), a per-sequence page table of pool indices, and host-side page
allocation between steps (the device step consumes the table as a plain
array — no dynamic shapes under jit). Attention gathers a sequence's
pages into its logical view; writes scatter through the table. Sequences
of different lengths share the pool, pages return to the free list when a
sequence finishes, and a shared prefix can alias the same pages across
sequences (copy-on-write is the allocator's job).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    k_pool: Any            # list per layer: [P, page, Hkv, Dh]
    v_pool: Any
    page_table: jnp.ndarray   # [B, max_pages] int32 pool indices (0 ok)
    seq_lens: jnp.ndarray     # [B] int32 tokens written per sequence

    def tree_flatten(self):
        return ((self.k_pool, self.v_pool, self.page_table,
                 self.seq_lens), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def page_size(self) -> int:
        return self.k_pool[0].shape[1]


class PageAllocator:
    """Host-side page bookkeeping (runs between jitted steps)."""

    def __init__(self, n_pages: int):
        self.free: List[int] = list(range(n_pages))
        self.owned: dict = {}

    def alloc(self, seq_id, n: int) -> List[int]:
        if n > len(self.free):
            raise RuntimeError(
                f"KV page pool exhausted: need {n}, free {len(self.free)}")
        pages = [self.free.pop() for _ in range(n)]
        self.owned.setdefault(seq_id, []).extend(pages)
        return pages

    def free_seq(self, seq_id) -> None:
        self.free.extend(self.owned.pop(seq_id, []))

    def pages_in_use(self) -> int:
        return sum(len(v) for v in self.owned.values())


def init_paged_cache(cfg: ModelConfig, n_pages: int, page_size: int,
                     batch: int, max_pages_per_seq: int,
                     dtype=jnp.bfloat16) -> PagedKVCache:
    shape = (n_pages, page_size, cfg.num_kv_heads, cfg.head_dim)
    return PagedKVCache(
        k_pool=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        v_pool=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        page_table=jnp.zeros((batch, max_pages_per_seq), jnp.int32),
        seq_lens=jnp.zeros((batch,), jnp.int32),
    )


def paged_write(k_pool, v_pool, k_new, v_new, page_table, slots):
    """Scatter [B, T, Hkv, Dh] new K/V into the pool at logical `slots`
    [B, T] (slot -> (page_table[b, slot // page], slot % page))."""
    ps = k_pool.shape[1]
    b, t = slots.shape
    page_idx = jnp.take_along_axis(page_table, slots // ps, axis=1)  # [B,T]
    off = slots % ps
    flat_pages = page_idx.reshape(-1)
    flat_off = off.reshape(-1)
    k_pool = k_pool.at[flat_pages, flat_off].set(
        k_new.reshape(b * t, *k_new.shape[2:]).astype(k_pool.dtype))
    v_pool = v_pool.at[flat_pages, flat_off].set(
        v_new.reshape(b * t, *v_new.shape[2:]).astype(v_pool.dtype))
    return k_pool, v_pool


def gather_pages(pool, page_table):
    """[P, page, Hkv, Dh] + [B, max_pages] -> logical [B, S, Hkv, Dh]."""
    b, mp = page_table.shape
    pages = jnp.take(pool, page_table.reshape(-1), axis=0)
    return pages.reshape(b, mp * pool.shape[1], *pool.shape[2:])


def paged_attend(q, k_pool, v_pool, page_table, *, q_slots, seq_lens,
                 window: Optional[int] = None, softcap=None, scale=None):
    """Decode attention over the paged cache: gather the sequence's pages
    into its logical view and run the masked cached-attention math."""
    from .decode import _attend_cached

    k = gather_pages(k_pool, page_table)
    v = gather_pages(v_pool, page_table)
    s = k.shape[1]
    kv_len_mask = jnp.arange(s, dtype=jnp.int32)[None, :] \
        < seq_lens[:, None]
    return _attend_cached(q, k, v, q_slots=q_slots,
                          kv_len_mask=kv_len_mask, window=window,
                          softcap=softcap, scale=scale)


def forward_paged(params, lora, input_ids, cfg: ModelConfig,
                  cache: PagedKVCache, *, positions: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, PagedKVCache]:
    """forward_with_cache over paged buffers: the same hidden-state math
    as decode.forward_with_cache, but K/V live in the page pool and
    attention reads through the page table. Slot == position (the
    allocator guarantees each sequence's pages cover [0, len))."""
    from ..models.decoder import _norm, _proj, _rope_tables
    from ..ops.activations import glu_for
    from ..ops.rms_norm import rms_norm
    from ..ops.rope import apply_rope_qk

    b, t = input_ids.shape
    lora_layers = (lora or {}).get("layers")
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)

    cos, sin, cos_l, sin_l = _rope_tables(cfg, positions)
    slots = positions
    new_k_pool, new_v_pool = [], []
    seq_lens = jnp.maximum(cache.seq_lens, positions[:, -1] + 1)
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        h = _norm(x, layer_p["input_norm"], cfg)
        hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        q = _proj(h, layer_p, lora_p, "q").reshape(b, t, hq, dh)
        k = _proj(h, layer_p, lora_p, "k").reshape(b, t, hkv, dh)
        v = _proj(h, layer_p, lora_p, "v").reshape(b, t, hkv, dh)
        if cfg.qk_norm is True:
            q = rms_norm(q, layer_p["q_norm"], cfg.rms_norm_eps,
                         cfg.gemma_norm)
            k = rms_norm(k, layer_p["k_norm"], cfg.rms_norm_eps,
                         cfg.gemma_norm)
        kind = cfg.layer_kind(i)
        if kind == "sliding" and cos_l is not None:
            q, k = apply_rope_qk(q, k, cos_l, sin_l)
        else:
            q, k = apply_rope_qk(q, k, cos, sin)
        kp, vp = paged_write(cache.k_pool[i], cache.v_pool[i], k, v,
                             cache.page_table, slots)
        new_k_pool.append(kp)
        new_v_pool.append(vp)
        attn = paged_attend(
            q, kp, vp, cache.page_table, q_slots=slots,
            seq_lens=seq_lens,
            window=cfg.sliding_window if kind == "sliding" else None,
            softcap=cfg.attn_softcap, scale=cfg.attn_logit_scale)
        attn = _proj(attn.reshape(b, t, hq * dh), layer_p, lora_p, "o")
        x = x + attn
        h2 = _norm(x, layer_p["post_attn_norm"], cfg)
        glu = glu_for(cfg.hidden_act)
        e = _proj(h2, layer_p, lora_p, "gate")
        g = _proj(h2, layer_p, lora_p, "up")
        x = x + _proj(glu(e, g), layer_p, lora_p, "down")
    x = _norm(x, params["final_norm"], cfg)
    return x, PagedKVCache(new_k_pool, new_v_pool, cache.page_table,
                           seq_lens)
