"""Reward-model trainer (Bradley-Terry pairwise preference loss).

Parity target: TRL's RewardTrainer, which the reference patches
generically with every other trl.trainer module (reference:
models/rl.py:2286-2299 `patch_trl_rl_trainers` iterates all
`trl.trainer.*_trainer` files). TPU-native form: instead of wrapping an
`AutoModelForSequenceClassification`, a trainable score head (one
[1, D] linear over the last token's hidden state) rides next to the
LoRA tree in a single optax-updated pytree; chosen/rejected rows run
through the same functional decoder forward.

Loss (TRL reward_trainer semantics): -logsigmoid(r_chosen - r_rejected
- margin), with the optional `center_rewards_coefficient *
mean((r_c + r_r)^2)` regularizer.
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
class RewardConfig(SFTConfig):
    """TRL-RewardConfig-compatible surface (subset)."""

    max_length: int = 1024
    center_rewards_coefficient: Optional[float] = None


def reward_loss(r_chosen, r_rejected, margin=None,
                center_rewards_coefficient: Optional[float] = None):
    """Pairwise Bradley-Terry loss over scalar rewards [N]."""
    delta = r_chosen - r_rejected
    if margin is not None:
        delta = delta - margin
    loss = -jnp.mean(jax.nn.log_sigmoid(delta))
    if center_rewards_coefficient is not None:
        loss = loss + center_rewards_coefficient * jnp.mean(
            (r_chosen + r_rejected) ** 2)
    acc = jnp.mean((r_chosen > r_rejected).astype(jnp.float32))
    return loss, acc


class RewardTrainer:
    """RewardTrainer(model=..., args=RewardConfig(...), train_dataset=...,
    processing_class=tokenizer). Dataset rows: {"chosen", "rejected"} as
    strings or message lists, optionally {"margin": float}.

    After train(), `self.score_head` ([1, D] f32) is the trained head;
    `self.reward(texts)` scores new completions with it.
    """

    def __init__(self, model, args: Optional[RewardConfig] = None,
                 train_dataset=None, processing_class=None, **kwargs):
        self.model = model
        self.args = args or RewardConfig()
        self.train_dataset = train_dataset
        self.tokenizer = processing_class or getattr(model, "tokenizer",
                                                     None)
        d = model.cfg.hidden_size
        key = jax.random.PRNGKey(self.args.seed or 0)
        # HF seq-cls head init: small normal, f32
        self.score_head = (jax.random.normal(key, (1, d), jnp.float32)
                           * (d ** -0.5))
        self.state_log: List[Dict[str, Any]] = []

    # -- data ------------------------------------------------------------
    def _to_text(self, x) -> str:
        if isinstance(x, str):
            return x
        return self.tokenizer.apply_chat_template(
            x, tokenize=False, add_generation_prompt=False)

    def _build_batch(self, examples):
        """Interleaved [chosen_0, rejected_0, chosen_1, ...] rows,
        right-padded, with the last real-token index per row."""
        tok = self.tokenizer
        t_max = self.args.max_length
        rows, margins = [], []
        for ex in examples:
            for key in ("chosen", "rejected"):
                ids = tok(self._to_text(ex[key]))["input_ids"][:t_max]
                rows.append(ids)
            margins.append(float(ex.get("margin", 0.0)))
        t = max(len(r) for r in rows)
        t = ((t + 63) // 64) * 64          # compile-cache bucketing
        n = len(rows)
        input_ids = np.zeros((n, t), np.int32)
        last_idx = np.zeros((n,), np.int32)
        for i, r in enumerate(rows):
            input_ids[i, :len(r)] = r
            last_idx[i] = max(len(r) - 1, 0)
        return (jnp.asarray(input_ids), jnp.asarray(last_idx),
                jnp.asarray(np.asarray(margins, np.float32)))

    # -- scoring ---------------------------------------------------------
    def _rewards(self, trainable, params, ids, last_idx):
        cfg = self.model.cfg
        h = forward(params, trainable["lora"], ids, cfg, remat=True)
        pooled = h[jnp.arange(ids.shape[0]), last_idx]        # [N, D]
        return (pooled.astype(jnp.float32)
                @ trainable["score"].T.astype(jnp.float32))[:, 0]

    def reward(self, texts) -> np.ndarray:
        """Score texts with the trained head (inference helper)."""
        exs = [{"chosen": t, "rejected": t} for t in texts]
        ids, last_idx, _ = self._build_batch(exs)
        trainable = {"lora": self.model.lora, "score": self.score_head}
        r = self._rewards(trainable, self.model.params, ids, last_idx)
        return np.asarray(r)[0::2]

    # -- training ---------------------------------------------------------
    def _make_step(self, tx):
        args = self.args
        params = self.model.params

        def loss_fn(trainable, params, ids, last_idx, margins):
            r = self._rewards(trainable, params, ids, last_idx)
            return reward_loss(
                r[0::2], r[1::2], margin=margins,
                center_rewards_coefficient=args.center_rewards_coefficient)

        def step(trainable, opt_state, params, ids, last_idx, margins):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, params, ids, last_idx, margins)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return (optax.apply_updates(trainable, updates), opt_state,
                    loss, acc)

        return jax.jit(step, donate_argnums=(0, 1))

    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, \
            "RewardTrainer trains LoRA + score head — call get_peft_model"
        ds = list(self.train_dataset)
        bsz = args.per_device_train_batch_size
        total = args.max_steps if args.max_steps > 0 else max(
            int(len(ds) // bsz * args.num_train_epochs), 1)
        tx, _ = build_optimizer(args, total)
        trainable = {"lora": model.lora, "score": self.score_head}
        opt_state = tx.init(trainable)
        step_fn = self._make_step(tx)

        t0 = time.time()
        global_step = 0
        idx = 0
        while global_step < total:
            examples = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            ids, last_idx, margins = self._build_batch(examples)
            trainable, opt_state, loss, acc = step_fn(
                trainable, opt_state, model.params, ids, last_idx,
                margins)
            global_step += 1
            if global_step % args.logging_steps == 0:
                self.state_log.append({"loss": float(loss),
                                       "rewards/accuracies": float(acc),
                                       "step": global_step})
        model.lora = trainable["lora"]
        self.score_head = trainable["score"]
        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(global_step,
                           float(np.mean(losses)) if losses else
                           float("nan"),
                           {"train_runtime": time.time() - t0})
