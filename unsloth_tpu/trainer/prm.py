"""PRM trainer — process reward models with step-level labels.

Parity target: TRL's PRMTrainer (patched generically by the reference
with every other trl.trainer module — reference: models/rl.py:2286-2299).
A process reward model scores each REASONING STEP of a solution: steps
are joined with a separator token, and a classification head predicts
each step's correctness at its separator position (token-level
classification, labels -100 everywhere else — TRL PRMTrainer's
tokenize_row semantics).

TPU-native form: a trainable [1, D] step-score head over the decoder's
hidden states rides next to the LoRA tree in one optax pytree (same
pattern as trainer/reward.py); the loss is BCE-with-logits at the
separator positions.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.decoder import forward
from .sft import SFTConfig, TrainOutput, build_optimizer


@dataclasses.dataclass
class PRMConfig(SFTConfig):
    """TRL-PRMConfig-compatible surface (subset)."""

    max_length: int = 1024
    step_separator: str = "\n"


def prm_loss(logits, labels):
    """BCE with logits at labeled positions (labels: 1/0 at separator
    positions, -100 elsewhere). Returns (loss, accuracy)."""
    mask = (labels != -100).astype(jnp.float32)
    y = jnp.clip(labels, 0, 1).astype(jnp.float32)
    # stable BCE-with-logits
    per = jnp.maximum(logits, 0.0) - logits * y \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    n = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(per * mask) / n
    acc = jnp.sum(((logits > 0) == (y > 0.5)).astype(jnp.float32)
                  * mask) / n
    return loss, acc


class PRMTrainer:
    """PRMTrainer(model=..., args=PRMConfig(...), train_dataset=...,
    processing_class=tok). Dataset rows: {"prompt": str,
    "completions": [step, ...], "labels": [bool, ...]}.

    After train(), `self.step_head` is the trained [1, D] head and
    `self.score_steps(prompt, steps)` returns per-step probabilities.
    """

    def __init__(self, model, args: Optional[PRMConfig] = None,
                 train_dataset=None, processing_class=None, **kwargs):
        self.model = model
        self.args = args or PRMConfig()
        self.train_dataset = train_dataset
        self.tokenizer = processing_class or getattr(model, "tokenizer",
                                                     None)
        d = model.cfg.hidden_size
        key = jax.random.PRNGKey((self.args.seed or 0) + 5)
        self.step_head = (jax.random.normal(key, (1, d), jnp.float32)
                          * (d ** -0.5))
        self.state_log: List[Dict[str, Any]] = []

    # -- data ---------------------------------------------------------------
    def _encode_row(self, ex):
        """-> (ids, labels) with the step label at each separator's last
        token (TRL: the separator token carries the step's label)."""
        tok = self.tokenizer
        sep = tok(self.args.step_separator)["input_ids"]
        ids = list(tok(ex["prompt"])["input_ids"])
        labels = [-100] * len(ids)
        for step, good in zip(ex["completions"], ex["labels"]):
            s = tok(step)["input_ids"]
            ids += list(s) + list(sep)
            labels += [-100] * len(s) + [-100] * (len(sep) - 1) \
                + [1 if good else 0]
        t_max = self.args.max_length
        return ids[:t_max], labels[:t_max]

    def _build_batch(self, examples):
        rows = [self._encode_row(ex) for ex in examples]
        t = ((max(len(r[0]) for r in rows) + 63) // 64) * 64
        n = len(rows)
        input_ids = np.zeros((n, t), np.int32)
        labels = np.full((n, t), -100, np.int32)
        for i, (ids, lab) in enumerate(rows):
            input_ids[i, :len(ids)] = ids
            labels[i, :len(lab)] = lab
        return jnp.asarray(input_ids), jnp.asarray(labels)

    # -- scoring -------------------------------------------------------------
    def _step_logits(self, trainable, params, ids):
        cfg = self.model.cfg
        h = forward(params, trainable["lora"], ids, cfg, remat=True)
        return (h.astype(jnp.float32)
                @ trainable["head"].T.astype(jnp.float32))[..., 0]

    def score_steps(self, prompt: str, steps: List[str]) -> np.ndarray:
        """Per-step P(correct) with the trained head."""
        ids, labels = self._build_batch(
            [{"prompt": prompt, "completions": steps,
              "labels": [True] * len(steps)}])
        trainable = {"lora": self.model.lora, "head": self.step_head}
        logits = self._step_logits(trainable, self.model.params, ids)
        mask = np.asarray(labels[0]) != -100
        return np.asarray(jax.nn.sigmoid(logits[0]))[mask]

    # -- training -----------------------------------------------------------
    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, \
            "PRM trains LoRA + step head — call get_peft_model"
        ds = list(self.train_dataset)
        bsz = args.per_device_train_batch_size
        total = args.max_steps if args.max_steps > 0 else max(
            int(len(ds) // bsz * args.num_train_epochs), 1)
        tx, _ = build_optimizer(args, total)
        trainable = {"lora": model.lora, "head": self.step_head}
        opt_state = tx.init(trainable)

        def loss_fn(trainable, params, ids, labels):
            logits = self._step_logits(trainable, params, ids)
            return prm_loss(logits, labels)

        @jax.jit
        def step(trainable, opt_state, params, ids, labels):
            (loss, acc), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, params, ids, labels)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return (optax.apply_updates(trainable, updates), opt_state,
                    loss, acc)

        t0 = time.time()
        global_step = 0
        idx = 0
        while global_step < total:
            examples = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            ids, labels = self._build_batch(examples)
            trainable, opt_state, loss, acc = step(
                trainable, opt_state, model.params, ids, labels)
            global_step += 1
            if global_step % args.logging_steps == 0:
                self.state_log.append({"loss": float(loss),
                                       "accuracy": float(acc),
                                       "step": global_step})
        model.lora = trainable["lora"]
        self.step_head = trainable["head"]
        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(global_step,
                           float(np.mean(losses)) if losses else
                           float("nan"),
                           {"train_runtime": time.time() - t0})
