"""Online DPO trainer — generate pairs, judge, preference-update.

Parity target: TRL's OnlineDPOTrainer (patched generically by the
reference with every other trl.trainer module — reference:
models/rl.py:2286-2299). Each step samples TWO completions per prompt
from the current policy (shared-prefix fanout rollout, like GRPO),
ranks them with a pairwise judge or reward functions, and applies the
DPO sigmoid loss against the frozen-base reference policy (LoRA
disabled — the same no-second-model trick as offline DPO/GRPO here).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .dpo import dpo_loss
from .grpo import GRPOConfig, GRPOTrainer, grpo_per_token_logps
from .sft import TrainOutput, build_optimizer


@dataclasses.dataclass
class OnlineDPOConfig(GRPOConfig):
    """TRL-OnlineDPOConfig-compatible surface (subset)."""

    beta: float = 0.1                  # TRL OnlineDPO default
    num_generations: int = 2           # one preference pair per prompt
    loss_type: str = "sigmoid"
    label_smoothing: float = 0.0


class OnlineDPOTrainer(GRPOTrainer):
    """OnlineDPOTrainer(model=..., judge=... | reward_funcs=[...],
    args=OnlineDPOConfig(...), train_dataset=..., processing_class=tok).

    judge(prompts, completion_pairs) -> list of 0/1 — the index of the
    preferred completion per pair (TRL BasePairwiseJudge shape). With
    reward_funcs instead, the higher-scoring completion is chosen.
    """

    def __init__(self, model, judge: Optional[Callable] = None,
                 reward_funcs=None, args: Optional[OnlineDPOConfig] = None,
                 train_dataset=None, processing_class=None, **kwargs):
        assert judge is not None or reward_funcs is not None, \
            "OnlineDPO needs a pairwise judge or reward_funcs"
        args = args or OnlineDPOConfig()
        args.num_generations = 2
        super().__init__(model, reward_funcs or [], args=args,
                         train_dataset=train_dataset,
                         processing_class=processing_class, **kwargs)
        self.judge = judge

    # -- pair construction -------------------------------------------------
    def _rank_pairs(self, prompts, completions_text, examples):
        """-> chosen index (0/1) per prompt."""
        n = len(prompts)
        if self.judge is not None:
            pairs = [(completions_text[2 * i], completions_text[2 * i + 1])
                     for i in range(n)]
            return [int(r) for r in self.judge(prompts, pairs)]
        rewards, _ = self._compute_rewards(prompts, completions_text,
                                           examples)
        return [int(rewards[2 * i + 1] > rewards[2 * i])
                for i in range(n)]

    def _build_pair_batch(self, prompt_ids, completion_ids, chosen_idx):
        """Rows interleaved [chosen_0, rejected_0, chosen_1, ...] with
        shifted targets (-100 outside the completion)."""
        args = self.args
        t = args.max_prompt_length + args.max_completion_length + 1
        order = []
        for i, c in enumerate(chosen_idx):
            order += [2 * i + c, 2 * i + (1 - c)]
        eos = self.tokenizer.eos_token_id if self.tokenizer else None
        n = len(order)
        input_ids = np.zeros((n, t), np.int32)
        targets = np.full((n, t), -100, np.int32)
        for row, j in enumerate(order):
            p = list(prompt_ids[j])
            c = list(completion_ids[j])
            if eos is not None and len(c) < args.max_completion_length:
                c = c + [eos]
            seq = (p + c)[:t]
            input_ids[row, :len(seq)] = seq
            targets[row, len(p):len(seq)] = seq[len(p):]
        shifted = np.full_like(targets, -100)
        shifted[:, :-1] = targets[:, 1:]
        return jnp.asarray(input_ids), jnp.asarray(shifted)

    # -- training -----------------------------------------------------------
    def _make_dpo_step(self, tx):
        model = self.model
        cfg = model.cfg
        args = self.args

        def seq_logps(lora, params, ids, targets):
            per_tok = grpo_per_token_logps(params, lora, ids, targets,
                                           cfg)
            return jnp.sum(jnp.where(targets != -100, per_tok, 0.0),
                           axis=-1)

        def loss_fn(lora, params, ids, targets, ref_logps):
            logps = seq_logps(lora, params, ids, targets)       # [2N]
            pc, pr = logps[0::2], logps[1::2]
            rc, rr = ref_logps[0::2], ref_logps[1::2]
            loss, (cr, rj) = dpo_loss(
                pc, pr, rc, rr, beta=args.beta,
                label_smoothing=args.label_smoothing,
                loss_type=args.loss_type)
            acc = jnp.mean((cr > rj).astype(jnp.float32))
            return loss, (cr, rj, acc)

        def step(lora, opt_state, params, ids, targets, ref_logps):
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(lora, params, ids, targets,
                                       ref_logps)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss, aux

        ref_fn = jax.jit(lambda params, ids, targets: seq_logps(
            None, params, ids, targets))
        return jax.jit(step, donate_argnums=(0, 1)), ref_fn

    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, \
            "OnlineDPO requires get_peft_model (LoRA)"
        ds = list(self.train_dataset)
        bsz = args.per_device_train_batch_size
        total = args.max_steps if args.max_steps > 0 else max(
            int(len(ds) // bsz * args.num_train_epochs), 1)
        tx, _ = build_optimizer(args, total)
        opt_state = tx.init(model.lora)
        step_fn, ref_fn = self._make_dpo_step(tx)

        t0 = time.time()
        global_step = 0
        idx = 0
        while global_step < total:
            examples = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            prompts = [self._prompt_text(ex) for ex in examples]
            prompt_ids, completion_ids = self._generate_batch(prompts)
            completions_text = [
                self.tokenizer.decode(c, skip_special_tokens=True)
                for c in completion_ids]
            chosen = self._rank_pairs(prompts, completions_text, examples)
            ids, targets = self._build_pair_batch(prompt_ids,
                                                  completion_ids, chosen)
            ref_logps = jax.lax.stop_gradient(
                ref_fn(model.params, ids, targets))
            model.lora, opt_state, loss, (cr, rj, acc) = step_fn(
                model.lora, opt_state, model.params, ids, targets,
                ref_logps)
            global_step += 1
            if global_step % args.logging_steps == 0:
                self.state_log.append({
                    "loss": float(loss),
                    "rewards/chosen": float(cr),
                    "rewards/rejected": float(rj),
                    "rewards/accuracies": float(acc),
                    "step": global_step,
                })
        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(global_step,
                           float(np.mean(losses)) if losses else
                           float("nan"),
                           {"train_runtime": time.time() - t0})
