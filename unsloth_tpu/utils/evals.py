"""Evaluation helpers — sliding-window perplexity and merge-fidelity.

Parity target: the reference's eval utilities
(reference: tests/utils/perplexity_eval.py:12-36 — per-example
perplexity with a sliding window for texts longer than the context;
tests/qlora/README.md:24-35 — the merge-fidelity methodology: a trained
fact must survive `save_pretrained_merged`, which peft's
merge_and_unload is shown to lose).

TPU-native: windows of one text are BATCHED into a single [W, T] forward
(one dispatch instead of one per window — the tunnel costs ~2ms per
dispatch), and the loss comes from the fused linear+CE machinery so
full logits never materialize.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def sliding_window_perplexity(model, texts: Sequence[str],
                              max_length: int = 2048, stride: int = 512,
                              tokenizer=None) -> float:
    """Mean perplexity over ``texts`` with the reference's windowing: for
    each window [begin, end), only the last (end - prev_end) tokens carry
    labels, so every token is scored exactly once."""
    from ..models.decoder import loss_fn

    tok = tokenizer or model.tokenizer
    assert tok is not None, "needs a tokenizer"

    windows: List[np.ndarray] = []
    labels: List[np.ndarray] = []
    for text in texts:
        ids = np.asarray(tok(text)["input_ids"], np.int32)
        seq_len = len(ids)
        prev_end = 0
        for begin in range(0, seq_len, stride):
            end = min(begin + max_length, seq_len)
            trg = end - prev_end
            w = ids[begin:end]
            lab = np.full_like(w, -100)
            lab[-trg:] = w[-trg:]
            windows.append(w)
            labels.append(lab)
            prev_end = end
            if end == seq_len:
                break

    if not windows:
        return float("nan")
    t_max = max(8, ((max(len(w) for w in windows) + 127) // 128) * 128)
    ids_arr = np.zeros((len(windows), t_max), np.int32)
    lab_arr = np.full((len(windows), t_max), -100, np.int32)
    seg_arr = np.zeros((len(windows), t_max), np.int32)
    for i, (w, lab) in enumerate(zip(windows, labels)):
        ids_arr[i, :len(w)] = w
        lab_arr[i, :len(lab)] = lab
        seg_arr[i, :len(w)] = 1

    @jax.jit
    def nll(params, lora, batch):
        return loss_fn(params, lora, batch, model.cfg, remat=False)

    # token-weighted mean over windows == mean NLL over all scored tokens
    total_nll = 0.0
    total_tok = 0
    bsz = 8
    losses = []
    counts = []
    for i in range(0, len(windows), bsz):
        chunk_ids = ids_arr[i:i + bsz]
        chunk_lab = lab_arr[i:i + bsz]
        chunk_seg = seg_arr[i:i + bsz]
        if chunk_ids.shape[0] < bsz:   # pad batch for shape stability
            pad = bsz - chunk_ids.shape[0]
            chunk_ids = np.pad(chunk_ids, ((0, pad), (0, 0)))
            chunk_lab = np.pad(chunk_lab, ((0, pad), (0, 0)),
                               constant_values=-100)
            chunk_seg = np.pad(chunk_seg, ((0, pad), (0, 0)))
        batch = {"input_ids": jnp.asarray(chunk_ids),
                 "labels": jnp.asarray(chunk_lab),
                 "segment_ids": jnp.asarray(chunk_seg)}
        losses.append(nll(model.params, model.lora, batch))
        counts.append(int((chunk_lab[:, 1:] != -100).sum()))
    total = float(jnp.sum(jnp.stack(losses)
                          * jnp.asarray(counts, jnp.float32)))
    total_tok = sum(counts)
    return float(np.exp(total / max(total_tok, 1)))


def fact_retained(model, prompt: str, expected: str,
                  max_new_tokens: int = 16, tokenizer=None) -> bool:
    """Merge-fidelity probe (reference: tests/qlora/README.md:24-35 —
    train an unanswerable QA pair, assert the answer survives training
    AND the merged save): greedy-generate and check the expected string
    appears."""
    from ..inference.generate import SamplingParams, generate

    tok = tokenizer or model.tokenizer
    sp = SamplingParams(max_tokens=max_new_tokens, temperature=0.0)
    out = generate(model, [prompt], sp, tokenizer=tok)[0]
    return expected.strip().lower() in out.strip().lower()
