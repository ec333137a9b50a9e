"""GKD trainer — on-policy generalized knowledge distillation.

Parity target: TRL's GKDTrainer (patched generically by the reference
with every other trl.trainer module — reference: models/rl.py:2286-2299
`patch_trl_rl_trainers`). Semantics (GKD paper / TRL):

  * loss = generalized Jensen-Shannon divergence between the teacher's
    and the student's token distributions on completion tokens:
      JSD_beta(P_t || Q_s) = beta * KL(P_t || M) + (1-beta) * KL(Q_s || M),
      M = beta * P_t + (1-beta) * Q_s
    (beta -> 1: forward KL; beta -> 0: reverse KL), computed at a
    distillation temperature.
  * on-policy mixing: with probability `lmbda` a step's completions are
    SAMPLED FROM THE STUDENT (self-generated data scored by the
    teacher); otherwise the dataset's completions are used.

TPU-native form: the teacher is a second frozen param pytree scored
with the same functional forward; the student is LoRA over its own
base. Logits are evaluated per sequence-chunk so [N, T, V] never
materializes whole.
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
class GKDConfig(SFTConfig):
    """TRL-GKDConfig-compatible surface (subset)."""

    lmbda: float = 0.5                 # on-policy fraction
    beta: float = 0.5                  # JSD interpolation
    temperature: float = 0.9           # distillation temperature
    max_prompt_length: int = 256
    max_completion_length: int = 128


def generalized_jsd_loss(student_logits, teacher_logits, mask,
                         *, beta: float = 0.5,
                         temperature: float = 1.0):
    """JSD_beta over [N, T, V] logits, averaged over masked tokens
    (mask [N, T], 1 on completion tokens)."""
    s_lp = jax.nn.log_softmax(
        student_logits.astype(jnp.float32) / temperature, axis=-1)
    t_lp = jax.nn.log_softmax(
        teacher_logits.astype(jnp.float32) / temperature, axis=-1)
    if beta >= 1.0:           # forward KL(teacher || student)
        per_tok = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)
    elif beta <= 0.0:         # reverse KL(student || teacher)
        per_tok = jnp.sum(jnp.exp(s_lp) * (s_lp - t_lp), axis=-1)
    else:
        # log M = logsumexp([log(beta) + t_lp, log(1-beta) + s_lp])
        m_lp = jnp.logaddexp(jnp.log(beta) + t_lp,
                             jnp.log1p(-beta) + s_lp)
        kl_t = jnp.sum(jnp.exp(t_lp) * (t_lp - m_lp), axis=-1)
        kl_s = jnp.sum(jnp.exp(s_lp) * (s_lp - m_lp), axis=-1)
        per_tok = beta * kl_t + (1.0 - beta) * kl_s
    maskf = mask.astype(jnp.float32)
    return jnp.sum(per_tok * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)


class GKDTrainer:
    """GKDTrainer(model=student, teacher_model=..., args=GKDConfig(...),
    train_dataset=..., processing_class=tok). Dataset rows:
    {"prompt": str|messages, "completion": str} (the off-policy data;
    on-policy steps sample completions from the student)."""

    def __init__(self, model, teacher_model, args: Optional[GKDConfig] = None,
                 train_dataset=None, processing_class=None, **kwargs):
        self.model = model
        self.teacher = teacher_model
        self.args = args or GKDConfig()
        self.train_dataset = train_dataset
        self.tokenizer = processing_class or getattr(model, "tokenizer",
                                                     None)
        self.state_log: List[Dict[str, Any]] = []

    # -- data ---------------------------------------------------------------
    def _to_text(self, x, add_gen=False) -> str:
        if isinstance(x, str):
            return x
        return self.tokenizer.apply_chat_template(
            x, tokenize=False, add_generation_prompt=add_gen)

    def _encode_prompt(self, ex):
        p = self.tokenizer(self._to_text(ex["prompt"], add_gen=True))[
            "input_ids"]
        return p[-self.args.max_prompt_length:]

    def _build_batch(self, prompt_ids, completion_ids):
        args = self.args
        t = args.max_prompt_length + args.max_completion_length
        n = len(prompt_ids)
        input_ids = np.zeros((n, t), np.int32)
        comp_mask = np.zeros((n, t), np.int32)
        for i, (p, c) in enumerate(zip(prompt_ids, completion_ids)):
            seq = (list(p) + list(c))[:t]
            input_ids[i, :len(seq)] = seq
            comp_mask[i, len(p):len(seq)] = 1
        # distill on NEXT-token distributions at completion positions:
        # position j predicts token j+1, so shift the mask left
        shifted = np.zeros_like(comp_mask)
        shifted[:, :-1] = comp_mask[:, 1:]
        return jnp.asarray(input_ids), jnp.asarray(shifted)

    # -- training -----------------------------------------------------------
    def _make_step(self, tx):
        args = self.args
        student = self.model
        teacher = self.teacher
        cfg = student.cfg

        def logits_of(params, lora, model_cfg, ids):
            from ..ops.lora import base_matmul

            h = forward(params, lora, ids, model_cfg, remat=True)
            w = params.get("lm_head")
            if w is None:
                w = params["embed"]
            return base_matmul(h, w)

        def loss_fn(lora, params, t_params, ids, mask):
            s_logits = logits_of(params, lora, cfg, ids)
            t_logits = jax.lax.stop_gradient(
                logits_of(t_params, None, teacher.cfg, ids))
            return generalized_jsd_loss(
                s_logits, t_logits, mask, beta=args.beta,
                temperature=args.temperature)

        def step(lora, opt_state, params, t_params, ids, mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                lora, params, t_params, ids, mask)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def train(self):
        from ..inference.generate import SamplingParams, generate

        args = self.args
        model = self.model
        assert model.lora is not None, \
            "GKD trains the student's LoRA — call get_peft_model"
        ds = list(self.train_dataset)
        bsz = args.per_device_train_batch_size
        total = args.max_steps if args.max_steps > 0 else max(
            int(len(ds) // bsz * args.num_train_epochs), 1)
        tx, _ = build_optimizer(args, total)
        opt_state = tx.init(model.lora)
        step_fn = self._make_step(tx)
        rng = np.random.RandomState(args.seed or 0)

        t0 = time.time()
        global_step = 0
        idx = 0
        while global_step < total:
            examples = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            prompts = [self._encode_prompt(ex) for ex in examples]
            on_policy = bool(rng.rand() < args.lmbda)
            if on_policy:
                sp = SamplingParams(
                    max_tokens=args.max_completion_length,
                    temperature=max(args.temperature, 1e-3),
                    seed=int(rng.randint(2 ** 31)))
                completions = generate(model, prompts, sp,
                                       return_token_ids=True,
                                       tokenizer=self.tokenizer)
            else:
                completions = [
                    self.tokenizer(self._to_text(ex["completion"]))[
                        "input_ids"][:args.max_completion_length]
                    for ex in examples]
            ids, mask = self._build_batch(prompts, completions)
            model.lora, opt_state, loss = step_fn(
                model.lora, opt_state, model.params,
                self.teacher.params, ids, mask)
            global_step += 1
            if global_step % args.logging_steps == 0:
                self.state_log.append({"loss": float(loss),
                                       "on_policy": on_policy,
                                       "step": global_step})
        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(global_step,
                           float(np.mean(losses)) if losses else
                           float("nan"),
                           {"train_runtime": time.time() - t0})
