"""PPO trainer — classic RLHF with a value head and GAE.

Parity target: TRL's PPOTrainer (patched generically by the reference
with every other trl.trainer module — reference: models/rl.py:2286-2299).
TPU-native form, sharing the GRPO machinery's shape:

  * rollouts from the on-device generate loop;
  * per-token rewards = -kl_coef * (logp - ref_logp) with the scalar
    score (reward functions) added at the last completion token — the
    reference policy is the frozen base with LoRA disabled (the same
    no-second-model trick as GRPO/DPO here);
  * values from a trainable [1, D] head over the hidden states, trained
    jointly with the LoRA tree in one optax pytree;
  * GAE(gamma, lam) advantages (whitened) + clipped surrogate policy
    loss + clipped value loss, `num_ppo_epochs` passes per rollout.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.decoder import forward
from .grpo import GRPOConfig, GRPOTrainer, _lm_head_and_scale
from .sft import TrainOutput, build_optimizer


@dataclasses.dataclass
class PPOConfig(GRPOConfig):
    """TRL-PPOConfig-compatible surface (subset)."""

    num_generations: int = 1
    num_ppo_epochs: int = 2
    gamma: float = 1.0
    lam: float = 0.95
    cliprange: float = 0.2
    cliprange_value: float = 0.2
    vf_coef: float = 0.1
    kl_coef: float = 0.05
    whiten_advantages: bool = True


def compute_gae(rewards, values, mask, *, gamma: float, lam: float):
    """GAE over [N, T] per-token rewards/values (mask 1 on completion
    tokens). Scans right-to-left; positions outside the mask carry 0."""
    maskf = mask.astype(jnp.float32)
    # v_{t+1} with 0 after the last completion token
    v_next = jnp.concatenate(
        [values[:, 1:] * maskf[:, 1:], jnp.zeros_like(values[:, :1])],
        axis=1)
    deltas = rewards + gamma * v_next - values

    def scan_fn(carry, x):
        delta_t, m_t = x
        adv = delta_t + gamma * lam * carry * m_t
        return adv, adv

    # scan over time reversed; carry resets through the mask edge via m_t
    _, adv_rev = jax.lax.scan(
        scan_fn, jnp.zeros(rewards.shape[0]),
        (deltas[:, ::-1].T, maskf[:, ::-1].T))
    adv = adv_rev.T[:, ::-1] * maskf
    returns = adv + values * maskf
    return adv, returns


def whiten(x, mask):
    maskf = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(maskf), 1.0)
    mean = jnp.sum(x * maskf) / n
    var = jnp.sum(((x - mean) ** 2) * maskf) / n
    return (x - mean) * jax.lax.rsqrt(var + 1e-8) * maskf


def ppo_losses(logp, old_logp, values, old_values, adv, returns, mask,
               *, cliprange: float, cliprange_value: float):
    """Clipped surrogate + clipped value loss (TRL PPO semantics);
    returns (policy_loss, value_loss, clipfrac)."""
    maskf = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(maskf), 1.0)
    ratio = jnp.exp(logp - old_logp)
    pg1 = -adv * ratio
    pg2 = -adv * jnp.clip(ratio, 1.0 - cliprange, 1.0 + cliprange)
    pg = jnp.maximum(pg1, pg2)
    policy_loss = jnp.sum(pg * maskf) / n
    clipfrac = jnp.sum((pg2 > pg1).astype(jnp.float32) * maskf) / n

    v_clip = old_values + jnp.clip(values - old_values,
                                   -cliprange_value, cliprange_value)
    vf1 = (values - returns) ** 2
    vf2 = (v_clip - returns) ** 2
    value_loss = 0.5 * jnp.sum(jnp.maximum(vf1, vf2) * maskf) / n
    return policy_loss, value_loss, clipfrac


class PPOTrainer(GRPOTrainer):
    """PPOTrainer(model=..., reward_funcs=[...], args=PPOConfig(...),
    train_dataset=..., processing_class=tok). The value head is created
    internally and trained jointly with the LoRA tree."""

    def __init__(self, model, reward_funcs, args: Optional[PPOConfig] = None,
                 train_dataset=None, processing_class=None, **kwargs):
        super().__init__(model, reward_funcs, args=args or PPOConfig(),
                         train_dataset=train_dataset,
                         processing_class=processing_class, **kwargs)
        d = model.cfg.hidden_size
        key = jax.random.PRNGKey((self.args.seed or 0) + 11)
        self.value_head = (jax.random.normal(key, (1, d), jnp.float32)
                           * (d ** -0.5))

    # -- per-token logps + values in one forward ---------------------------
    def _logps_values(self, trainable, params, ids, targets):
        from ..ops.fused_ce_linear import selective_log_softmax

        cfg = self.model.cfg
        h = forward(params, trainable["lora"], ids, cfg, remat=True)
        b, t, d = h.shape
        wd, scale = _lm_head_and_scale(params, cfg, h.dtype,
                                       self.args.temperature)
        logps = selective_log_softmax(
            h.reshape(-1, d), wd, targets.reshape(-1),
            softcap=cfg.final_softcap, logit_scale=scale).reshape(b, t)
        values = (h.astype(jnp.float32).reshape(-1, d)
                  @ trainable["value"].T.astype(jnp.float32)
                  ).reshape(b, t)
        return logps, values

    def _ref_logps(self, params, ids, targets):
        from .grpo import grpo_per_token_logps

        return grpo_per_token_logps(params, None, ids, targets,
                                    self.model.cfg,
                                    temperature=self.args.temperature)

    # -- training -----------------------------------------------------------
    def _make_ppo_step(self, tx):
        args = self.args
        model = self.model

        def loss_fn(trainable, params, ids, targets, mask, old_logp,
                    old_values, adv, returns):
            logp, values = self._logps_values(trainable, params, ids,
                                              targets)
            pl, vl, clipfrac = ppo_losses(
                logp, old_logp, values, old_values, adv, returns, mask,
                cliprange=args.cliprange,
                cliprange_value=args.cliprange_value)
            return pl + args.vf_coef * vl, (pl, vl, clipfrac)

        def step(trainable, opt_state, params, ids, targets, mask,
                 old_logp, old_values, adv, returns):
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, params, ids, targets,
                                       mask, old_logp, old_values, adv,
                                       returns)
            updates, opt_state = tx.update(grads, opt_state, trainable)
            return (optax.apply_updates(trainable, updates), opt_state,
                    loss, aux)

        rollout_fn = jax.jit(
            lambda trainable, params, ids, targets:
            self._logps_values(trainable, params, ids, targets))
        ref_fn = jax.jit(lambda params, ids, targets:
                         self._ref_logps(params, ids, targets))
        gae_fn = jax.jit(
            lambda rewards, values, mask: compute_gae(
                rewards, values, mask, gamma=args.gamma, lam=args.lam))
        return jax.jit(step, donate_argnums=(0, 1)), rollout_fn, ref_fn, \
            gae_fn

    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, \
            "PPO trains LoRA + value head — call get_peft_model"
        ds = list(self.train_dataset)
        bsz = args.per_device_train_batch_size
        total = args.max_steps if args.max_steps > 0 else max(
            int(len(ds) // bsz * args.num_train_epochs), 1)
        tx, _ = build_optimizer(args, total)
        trainable = {"lora": model.lora, "value": self.value_head}
        opt_state = tx.init(trainable)
        step_fn, rollout_fn, ref_fn, gae_fn = self._make_ppo_step(tx)

        t0 = time.time()
        global_step = 0
        idx = 0
        while global_step < total:
            examples = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            prompts = [self._prompt_text(ex) for ex in examples]
            # model.lora must reflect the current policy for generation
            model.lora = trainable["lora"]
            prompt_ids, completion_ids = self._generate_batch(prompts)
            completions_text = [
                self.tokenizer.decode(c, skip_special_tokens=True)
                for c in completion_ids]
            scores, _ = self._compute_rewards(prompts, completions_text,
                                              examples)
            batch = self._build_batch(prompt_ids, completion_ids,
                                      np.zeros(len(prompt_ids),
                                               np.float32))
            ids, targets = batch.input_ids, batch.logp_targets
            mask = (targets != -100).astype(jnp.float32)

            old_logp, old_values = jax.tree_util.tree_map(
                jax.lax.stop_gradient,
                rollout_fn(trainable, model.params, ids, targets))
            ref_logp = jax.lax.stop_gradient(
                ref_fn(model.params, ids, targets))
            # per-token KL penalty; scalar score at the LAST completion
            # token (TRL PPO reward shaping)
            rewards = -args.kl_coef * (old_logp - ref_logp) * mask
            last = jnp.maximum(
                jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0)
            first = jnp.argmax(mask, axis=1).astype(jnp.int32)
            last_pos = first + last
            rewards = rewards.at[
                jnp.arange(rewards.shape[0]), last_pos].add(
                jnp.asarray(scores, jnp.float32))
            adv, returns = gae_fn(rewards, old_values * mask, mask)
            if args.whiten_advantages:
                adv = whiten(adv, mask)
            adv = jax.lax.stop_gradient(adv)
            returns = jax.lax.stop_gradient(returns)

            for _ in range(args.num_ppo_epochs):
                trainable, opt_state, loss, (pl, vl, cf) = step_fn(
                    trainable, opt_state, model.params, ids, targets,
                    mask, old_logp, old_values, adv, returns)
            global_step += 1
            if global_step % args.logging_steps == 0:
                self.state_log.append({
                    "loss": float(loss),
                    "policy_loss": float(pl),
                    "value_loss": float(vl),
                    "clipfrac": float(cf),
                    "reward": float(np.mean(scores)),
                    "step": global_step,
                })
        model.lora = trainable["lora"]
        self.value_head = trainable["value"]
        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(global_step,
                           float(np.mean(losses)) if losses else
                           float("nan"),
                           {"train_runtime": time.time() - t0})
