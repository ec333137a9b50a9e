"""Whisper ASR fine-tuning loop (seq2seq SFT).

Parity target: the reference trains Whisper through Studio's audio branch
(reference: studio/backend/core/training/trainer.py whisper path, which
preprocesses audio to log-mel + transcript tokens and runs HF
Seq2SeqTrainer). TPU-native form: one jitted full-FT step over the
functional whisper model (models/whisper.py), with on-device log-mel for
raw-audio examples.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.whisper import log_mel_spectrogram, whisper_loss
from .sft import SFTConfig, TrainOutput, build_schedule

IGNORE = -100


def prepare_whisper_batch(examples, cfg, tokenizer=None, max_label_len=64):
    """Examples carry either precomputed {"features": [n_mels, frames]}
    or raw {"audio": {"array", "sampling_rate"}}, plus {"labels": [ids]}
    or {"text": str}. Returns (features [B, n_mels, F], decoder_input_ids,
    labels) with HF's teacher-forcing shift (decoder input starts at
    decoder_start_token)."""
    feats, label_rows = [], []
    for ex in examples:
        if "features" in ex:
            f = np.asarray(ex["features"], np.float32)
        else:
            audio = ex["audio"]
            arr = audio["array"] if isinstance(audio, dict) else audio
            f = np.asarray(log_mel_spectrogram(jnp.asarray(arr)))
        feats.append(f)
        if "labels" in ex:
            ids = list(ex["labels"])
        else:
            ids = tokenizer(ex["text"]).input_ids
        label_rows.append(ids[:max_label_len])
    frames = max(f.shape[-1] for f in feats)
    feats = np.stack([np.pad(f, ((0, 0), (0, frames - f.shape[-1])))
                      for f in feats])
    t = max(len(r) for r in label_rows)
    start = cfg.decoder_start_token_id
    dec_in = np.full((len(label_rows), t), cfg.pad_token_id, np.int32)
    labels = np.full((len(label_rows), t), IGNORE, np.int32)
    for i, row in enumerate(label_rows):
        dec_in[i, 0] = start
        dec_in[i, 1:len(row)] = row[:-1]
        labels[i, :len(row)] = row
    return (jnp.asarray(feats), jnp.asarray(dec_in), jnp.asarray(labels))


class WhisperTrainer:
    """Seq2seq trainer over the functional whisper model.

    Full FT by default; pass ``lora`` (from
    models.whisper.init_whisper_lora) to train adapters only — the base
    stays frozen (and can be bf16), matching the reference's Whisper
    LoRA notebook (get_peft_model on q_proj/v_proj)."""

    def __init__(self, model, tokenizer=None, train_dataset=None,
                 args: Optional[SFTConfig] = None, lora=None, **kwargs):
        self.model = model       # (params, cfg) handle from load_whisper
        self.tokenizer = tokenizer
        self.train_dataset = train_dataset
        self.args = args or SFTConfig()
        self.lora = lora
        self.state_log: List[Dict[str, Any]] = []

    def train(self) -> TrainOutput:
        args = self.args
        params, cfg = self.model
        ds = list(self.train_dataset)
        bsz = args.per_device_train_batch_size
        batches = [
            prepare_whisper_batch(ds[i:i + bsz], cfg, self.tokenizer,
                                  max_label_len=args.max_seq_length)
            for i in range(0, len(ds), bsz)
        ]
        total = args.max_steps if args.max_steps > 0 else \
            max(int(len(batches) * args.num_train_epochs), 1)
        schedule = build_schedule(args, total)
        tx = optax.chain(optax.clip_by_global_norm(args.max_grad_norm),
                         optax.adamw(schedule,
                                     weight_decay=args.weight_decay))
        trainable = self.lora if self.lora is not None else params
        opt = tx.init(trainable)

        if self.lora is not None:
            @jax.jit
            def step(lora, opt, params, feats, dec_in, labels):
                loss, g = jax.value_and_grad(
                    lambda l: whisper_loss(params, feats, dec_in, labels,
                                           cfg, lora=l))(lora)
                upd, opt = tx.update(g, opt, lora)
                return optax.apply_updates(lora, upd), opt, loss
        else:
            @jax.jit
            def step(params, opt, _frozen, feats, dec_in, labels):
                loss, g = jax.value_and_grad(
                    lambda p: whisper_loss(p, feats, dec_in, labels,
                                           cfg))(params)
                upd, opt = tx.update(g, opt, params)
                return optax.apply_updates(params, upd), opt, loss

        t0 = time.time()
        global_step = 0
        losses = []
        while global_step < total:
            for feats, dec_in, labels in batches:
                if global_step >= total:
                    break
                trainable, opt, loss = step(
                    trainable, opt,
                    params if self.lora is not None else None,
                    feats, dec_in, labels)
                global_step += 1
                if global_step % args.logging_steps == 0:
                    entry = {"loss": float(loss), "step": global_step}
                    losses.append(float(loss))
                    self.state_log.append(entry)
        if self.lora is not None:
            self.lora = trainable
        else:
            params = trainable
        self.model = (params, cfg)
        return TrainOutput(global_step,
                           float(np.mean(losses)) if losses else
                           float("nan"),
                           {"train_runtime": time.time() - t0})
