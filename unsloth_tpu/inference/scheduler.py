"""Continuous batching over the paged KV pool.

Parity target: the reference serves GGUF models through llama.cpp's
`llama-server` (reference: studio/backend/core/inference/llama_cpp.py,
llama_admission.py — admission control + continuous batching in the C++
server). TPU-native form: a scheduler over our paged KV cache
(inference/paged.py) — requests are admitted into slots of a fixed
[B, 1] decode batch as others finish, prefill runs per slot into its
pages, and every active sequence advances one token per jitted decode
step. Static shapes throughout: the decode step compiles once per
(batch, table-width) and is reused for the server's lifetime.

Page 0 is a reserved trash page: inactive slots' decode writes land
there, so a partially-filled batch needs no masking inside the kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .paged import (PageAllocator, PagedKVCache, forward_paged,
                    init_paged_cache)


@dataclasses.dataclass
class Request:
    req_id: int
    prompt_ids: List[int]
    max_new_tokens: int
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    slot: Optional[int] = None
    cached_tokens: int = 0     # prompt tokens served from the prefix cache
    reused_pages: List[int] = dataclasses.field(default_factory=list)


class PrefixCache:
    """Automatic prefix caching (the vLLM APC analog): full prompt pages
    are indexed by a rolling chain hash (hash of all tokens up to and
    including the page), so a new request reuses the longest cached
    page-chain prefix and prefills only the suffix. Cached pages are
    read-only by construction — reuse covers FULL pages only, and every
    later write (suffix prefill, decode) lands in pages past the reused
    chain. Eviction is LRU over unreferenced pages under pool pressure.
    """

    def __init__(self, page_size: int):
        self.page_size = page_size
        self.chains: dict = {}     # chain_hash -> page_id
        self.hash_of: dict = {}    # page_id -> chain_hash
        self.refs: dict = {}       # page_id -> active users
        self.last_use: dict = {}   # page_id -> tick
        self.tick = 0

    def _chain_hashes(self, prompt_ids: List[int]) -> List[int]:
        ps = self.page_size
        hashes, h = [], 0
        for p in range(len(prompt_ids) // ps):
            h = hash((h, tuple(prompt_ids[p * ps:(p + 1) * ps])))
            hashes.append(h)
        return hashes

    def lookup(self, prompt_ids: List[int]):
        """Longest cached chain -> (pages, n_cached_tokens). At least one
        prompt token is always left for prefill (its logits seed decode)."""
        self.tick += 1
        max_full = (len(prompt_ids) - 1) // self.page_size
        pages = []
        for h in self._chain_hashes(prompt_ids)[:max_full]:
            page = self.chains.get(h)
            if page is None:
                break
            pages.append(page)
        for page in pages:
            self.refs[page] = self.refs.get(page, 0) + 1
            self.last_use[page] = self.tick
        return pages, len(pages) * self.page_size

    def insert(self, prompt_ids: List[int], page_ids: List[int]) -> List[int]:
        """Index this prompt's fully-written pages; returns the page ids
        newly ADOPTED by the cache (ownership transfers to the cache)."""
        self.tick += 1
        adopted = []
        n_full = len(prompt_ids) // self.page_size
        for i, h in enumerate(self._chain_hashes(prompt_ids)[:n_full]):
            if i >= len(page_ids):
                break
            if h in self.chains:
                continue                    # chain already cached
            page = page_ids[i]
            if page in self.hash_of:
                continue                    # page already indexed
            self.chains[h] = page
            self.hash_of[page] = h
            self.refs.setdefault(page, 0)
            self.last_use[page] = self.tick
            adopted.append(page)
        return adopted

    def release(self, pages: List[int]) -> None:
        for page in pages:
            if page in self.refs:
                self.refs[page] = max(self.refs[page] - 1, 0)

    def evict(self, n: int) -> List[int]:
        """Drop up to n unreferenced pages, oldest first."""
        victims = sorted(
            (p for p, r in self.refs.items() if r == 0),
            key=lambda p: self.last_use.get(p, 0))[:n]
        for p in victims:
            h = self.hash_of.pop(p, None)
            if h is not None:
                self.chains.pop(h, None)
            self.refs.pop(p, None)
            self.last_use.pop(p, None)
        return victims


class ContinuousBatcher:
    """Greedy continuous-batching decode loop.

    submit() queues requests; step() admits into free slots (prefill)
    and advances every active slot one token; run() drains the queue.
    """

    def __init__(self, model, *, max_batch: int = 4, max_len: int = 512,
                 page_size: int = 64, n_pages: Optional[int] = None,
                 prefix_caching: bool = False,
                 speculative: bool = False, draft_len: int = 5):
        self.model = model
        cfg = model.cfg
        self.cfg = cfg
        self.max_batch = max_batch
        self.max_len = max_len
        self.page_size = page_size
        self.prefix_cache = (PrefixCache(page_size) if prefix_caching
                             else None)
        # ngram speculative decoding inside the shared loop: drafts come
        # from host-side bigram lookup over each request's own tokens;
        # one [B, K] forward verifies every slot's block, and per-slot
        # rewind is free because seq_lens/page positions are host state
        # (rejected pool entries are simply overwritten next step).
        self.speculative = speculative
        self.draft_len = max(int(draft_len), 2) if speculative else 1
        max_pages_per_seq = -(-max_len // page_size)
        n_pages = n_pages or (1 + max_batch * max_pages_per_seq)
        self.cache = init_paged_cache(cfg, n_pages, page_size,
                                      batch=max_batch,
                                      max_pages_per_seq=max_pages_per_seq)
        self.alloc = PageAllocator(n_pages)
        self.alloc.alloc("__trash__", 1)        # reserve page 0
        self.page_table = np.zeros((max_batch, max_pages_per_seq),
                                   np.int32)
        self.seq_lens = np.zeros((max_batch,), np.int32)
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.queue: List[Request] = []
        self.requests: Dict[int, Request] = {}
        self._next_id = 0
        self._decode = jax.jit(self._decode_impl)
        self._decode_block = jax.jit(self._decode_block_impl)
        self._prefill = jax.jit(self._prefill_impl,
                                static_argnames=("t",))

    # -- jitted bodies ---------------------------------------------------

    def _prefill_impl(self, params, lora, ids, cache, positions, *, t):
        h, cache = forward_paged(params, lora, ids, self.cfg, cache,
                                 positions=positions)
        from .decode import logits_from_hidden

        logits = logits_from_hidden(params, h[:, -1:], self.cfg,
                                    lora=lora)
        return jnp.argmax(logits[:, -1], axis=-1), cache

    def _decode_impl(self, params, lora, ids, cache, positions):
        h, cache = forward_paged(params, lora, ids, self.cfg, cache,
                                 positions=positions)
        from .decode import logits_from_hidden

        logits = logits_from_hidden(params, h, self.cfg, lora=lora)
        return jnp.argmax(logits[:, -1], axis=-1), cache

    def _decode_block_impl(self, params, lora, ids, cache, positions):
        """Speculative verify: greedy next-token for EVERY position of
        the [B, K] block."""
        h, cache = forward_paged(params, lora, ids, self.cfg, cache,
                                 positions=positions)
        from .decode import logits_from_hidden

        logits = logits_from_hidden(params, h, self.cfg, lora=lora)
        return jnp.argmax(logits, axis=-1), cache

    # -- host-side scheduling --------------------------------------------

    def submit(self, prompt_ids, max_new_tokens: int = 64) -> int:
        rid = self._next_id
        self._next_id += 1
        req = Request(rid, list(prompt_ids), max_new_tokens)
        self.queue.append(req)
        self.requests[rid] = req
        return rid

    def _sync_tables(self):
        self.cache = dataclasses.replace(
            self.cache,
            page_table=jnp.asarray(self.page_table),
            seq_lens=jnp.asarray(self.seq_lens))

    def _alloc_pages(self, seq_id, n: int) -> List[int]:
        """Allocate, evicting unreferenced prefix-cache pages on pressure."""
        try:
            return self.alloc.alloc(seq_id, n)
        except RuntimeError:
            if self.prefix_cache is None:
                raise
            shortfall = n - len(self.alloc.free)
            evicted = self.prefix_cache.evict(shortfall)
            if len(evicted) < shortfall:
                raise
            cache_owned = self.alloc.owned.get("__prefix_cache__", [])
            for p in evicted:
                if p in cache_owned:
                    cache_owned.remove(p)
            self.alloc.free.extend(evicted)
            return self.alloc.alloc(seq_id, n)

    def _admit(self, req: Request, slot: int):
        t = len(req.prompt_ids)
        cached_pages: List[int] = []
        t_cached = 0
        if self.prefix_cache is not None:
            cached_pages, t_cached = self.prefix_cache.lookup(
                req.prompt_ids)
            req.cached_tokens = t_cached
        suffix = t - t_cached
        # bucket SUFFIX length to limit prefill recompiles
        t_pad = max(64, 1 << (suffix - 1).bit_length())
        n_new = -(-(t + req.max_new_tokens) // self.page_size) \
            - len(cached_pages)
        pages = cached_pages + self._alloc_pages(req.req_id, n_new)
        self.page_table[slot] = 0
        self.page_table[slot, :len(pages)] = pages
        self.seq_lens[slot] = t_cached
        self._sync_tables()

        ids = np.zeros((1, t_pad), np.int32)
        ids[0, :suffix] = req.prompt_ids[t_cached:]
        positions = np.zeros((1, t_pad), np.int32)
        positions[0] = t_cached + np.arange(t_pad)   # pads write in-page
        sub = dataclasses.replace(
            self.cache,
            page_table=self.cache.page_table[slot:slot + 1],
            seq_lens=self.cache.seq_lens[slot:slot + 1])
        next_tok, sub = self._prefill(
            self.model.params, self.model.lora, jnp.asarray(ids), sub,
            jnp.asarray(positions), t=t_pad)
        # merge updated pools back (pools are global; tables stay host-side)
        self.cache = dataclasses.replace(
            self.cache, k_pool=sub.k_pool, v_pool=sub.v_pool)
        # the prefill's argmax used the padded last column; recompute from
        # the true last prompt token happens on the first decode step, so
        # instead we store the prompt length and let decode produce token 1
        req.slot = slot
        self.slots[slot] = req
        self.seq_lens[slot] = t
        self._sync_tables()
        if self.prefix_cache is not None:
            # index this prompt's full pages; the cache adopts ownership
            # of the newly-indexed ones so free_seq won't recycle them
            adopted = self.prefix_cache.insert(req.prompt_ids, pages)
            owned = self.alloc.owned.get(req.req_id, [])
            for p in adopted:
                if p in owned:
                    owned.remove(p)
                self.alloc.owned.setdefault("__prefix_cache__",
                                            []).append(p)
                # this request still attends its own prompt pages: hold a
                # ref until it finishes so eviction can't free live pages
                self.prefix_cache.refs[p] = \
                    self.prefix_cache.refs.get(p, 0) + 1
            req.reused_pages = cached_pages + adopted

    @staticmethod
    def _ngram_draft(toks: List[int], n: int) -> List[int]:
        """Bigram prompt-lookup draft over the request's own tokens."""
        if n <= 0:
            return []
        if len(toks) < 2:
            return [toks[-1]] * n
        prev, cur = toks[-2], toks[-1]
        for j in range(len(toks) - 3, -1, -1):
            if toks[j] == prev and toks[j + 1] == cur:
                cont = list(toks[j + 2:j + 2 + n])
                return cont + [cur] * (n - len(cont))
        return [cur] * n

    def _finish(self, i: int, req: Request):
        req.done = True
        self.alloc.free_seq(req.req_id)
        if self.prefix_cache is not None:
            self.prefix_cache.release(req.reused_pages)
        self.slots[i] = None

    def _step_spec(self, active: List[int]) -> int:
        """Speculative decode step: one [B, K] verify forward; per-slot
        acceptance + rewind are pure host bookkeeping (rejected pool
        entries get overwritten when their positions are next written)."""
        k = self.draft_len
        ids = np.zeros((self.max_batch, k), np.int32)
        positions = np.zeros((self.max_batch, k), np.int32)
        table = self.page_table.copy()
        drafts = {}
        for i in range(self.max_batch):
            req = self.slots[i]
            if req is None:
                table[i] = 0
                continue
            toks = req.prompt_ids + req.output_ids
            d = self._ngram_draft(toks, k - 1)
            drafts[i] = d
            ids[i] = [toks[-1]] + d
            positions[i] = self.seq_lens[i] - 1 + np.arange(k)

        self.cache = dataclasses.replace(
            self.cache, page_table=jnp.asarray(table),
            seq_lens=jnp.asarray(self.seq_lens))
        g, cache = self._decode_block(
            self.model.params, self.model.lora, jnp.asarray(ids),
            self.cache, jnp.asarray(positions))
        self.cache = dataclasses.replace(
            self.cache, k_pool=cache.k_pool, v_pool=cache.v_pool)
        g = np.asarray(jax.device_get(g))

        eos = self.cfg.eos_token_id
        for i in active:
            req = self.slots[i]
            d = drafts[i]
            a = 0
            while a < k - 1 and d[a] == g[i, a]:
                a += 1
            cand = [int(t) for t in g[i, :a + 1]]
            room = min(req.max_new_tokens - len(req.output_ids),
                       self.max_len - int(self.seq_lens[i]))
            cand = cand[:max(room, 0)]
            emitted = []
            for t in cand:
                emitted.append(t)
                if eos is not None and t == eos:
                    break
            req.output_ids.extend(emitted)
            self.seq_lens[i] += len(emitted)
            hit_eos = bool(emitted) and eos is not None \
                and emitted[-1] == eos
            full = len(req.output_ids) >= req.max_new_tokens
            if hit_eos or full or self.seq_lens[i] >= self.max_len \
                    or not emitted:
                self._finish(i, req)
        return len(active)

    def step(self) -> int:
        """Admit + advance one token; returns number of active slots."""
        for i in range(self.max_batch):
            if self.slots[i] is None and self.queue:
                self._admit(self.queue.pop(0), i)

        active = [i for i in range(self.max_batch)
                  if self.slots[i] is not None]
        if not active:
            return 0
        if self.speculative:
            return self._step_spec(active)

        # batched single-token decode over ALL slots; inactive slots point
        # at the trash page
        ids = np.zeros((self.max_batch, 1), np.int32)
        positions = np.zeros((self.max_batch, 1), np.int32)
        table = self.page_table.copy()
        for i in range(self.max_batch):
            req = self.slots[i]
            if req is None:
                table[i] = 0                   # trash page
                continue
            last = (req.output_ids[-1] if req.output_ids
                    else req.prompt_ids[-1])
            ids[i, 0] = last
            positions[i, 0] = self.seq_lens[i] - 1 + 1  # next slot
        # decode consumes the LAST token and predicts the next: feed the
        # last token at its own position
        for i in active:
            positions[i, 0] = self.seq_lens[i] - 1

        self.cache = dataclasses.replace(
            self.cache, page_table=jnp.asarray(table),
            seq_lens=jnp.asarray(self.seq_lens))
        next_tok, cache = self._decode(
            self.model.params, self.model.lora, jnp.asarray(ids),
            self.cache, jnp.asarray(positions))
        self.cache = dataclasses.replace(
            self.cache, k_pool=cache.k_pool, v_pool=cache.v_pool)
        toks = np.asarray(jax.device_get(next_tok))

        eos = self.cfg.eos_token_id
        for i in active:
            req = self.slots[i]
            tok = int(toks[i])
            req.output_ids.append(tok)
            self.seq_lens[i] += 1
            full = len(req.output_ids) >= req.max_new_tokens
            if (eos is not None and tok == eos) or full \
                    or self.seq_lens[i] >= self.max_len:
                self._finish(i, req)
        return len(active)

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Drain queue + slots; returns {req_id: output token ids}."""
        finished: Dict[int, List[int]] = {}
        all_reqs = list(self.queue) + [r for r in self.slots if r]
        for _ in range(max_steps):
            if not self.step() and not self.queue:
                break
        for r in all_reqs:
            finished[r.req_id] = r.output_ids
        return finished


class BatcherThread:
    """Background driver for a ContinuousBatcher: HTTP handler threads
    submit and block on their request while one loop advances all active
    sequences together (the llama-server serving shape)."""

    def __init__(self, batcher: ContinuousBatcher):
        import threading

        self.batcher = batcher
        self._cv = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            with self._cv:
                while not self._stop and not self.batcher.queue and \
                        not any(self.batcher.slots):
                    self._cv.wait(timeout=0.5)
                if self._stop:
                    return
            self.batcher.step()
            with self._cv:
                self._cv.notify_all()

    def generate(self, prompt_ids, max_new_tokens: int = 64,
                 timeout: float = 600.0) -> List[int]:
        import time as _time

        with self._cv:
            rid = self.batcher.submit(prompt_ids, max_new_tokens)
            self._cv.notify_all()
        deadline = _time.monotonic() + timeout
        with self._cv:
            while not self.batcher.requests[rid].done:
                if _time.monotonic() > deadline:
                    raise TimeoutError(f"request {rid} timed out")
                self._cv.wait(timeout=0.5)
            return self.batcher.requests.pop(rid).output_ids

    def stream(self, prompt_ids, max_new_tokens: int = 64,
               timeout: float = 600.0):
        """Generator yielding NEW output token ids as the shared decode
        loop produces them (true per-token streaming — each step of the
        batched loop appends to every active request)."""
        import time as _time

        with self._cv:
            rid = self.batcher.submit(prompt_ids, max_new_tokens)
            self._cv.notify_all()
        deadline = _time.monotonic() + timeout
        seen = 0
        req = self.batcher.requests[rid]
        while True:
            with self._cv:
                while len(req.output_ids) <= seen and not req.done:
                    if _time.monotonic() > deadline:
                        raise TimeoutError(f"request {rid} timed out")
                    self._cv.wait(timeout=0.5)
                new = req.output_ids[seen:]
                seen = len(req.output_ids)
                done = req.done
            if new:
                yield new
            if done and len(req.output_ids) <= seen:
                self.batcher.requests.pop(rid, None)
                return

    def stop(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)
