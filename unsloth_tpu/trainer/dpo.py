"""DPO trainer (Direct Preference Optimization).

Parity target: the reference patches TRL's DPOTrainer (reference:
models/rl_replacements.py:204-437 DPO dataset/vision fixes; models/dpo.py
API stubs; PatchDPOTrainer). Here DPO is native: the implicit reference
policy is the frozen base model with LoRA disabled (same trick as GRPO —
no second model in memory), and sequence logprobs go through the chunked
selective log-softmax so logits are never materialized.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .grpo import grpo_per_token_logps
from .sft import SFTConfig, TrainOutput, build_optimizer


@dataclasses.dataclass
class DPOConfig(SFTConfig):
    """TRL-DPOConfig-compatible surface (subset)."""

    beta: float = 0.1
    label_smoothing: float = 0.0
    loss_type: str = "sigmoid"         # sigmoid | ipo
    max_prompt_length: int = 256
    max_completion_length: int = 256


def dpo_loss(policy_chosen, policy_rejected, ref_chosen, ref_rejected,
             *, beta: float, label_smoothing: float = 0.0,
             loss_type: str = "sigmoid"):
    """Sequence-level logps in, scalar loss + (chosen, rejected) rewards."""
    pi_ratio = policy_chosen - policy_rejected
    ref_ratio = ref_chosen - ref_rejected
    logits = pi_ratio - ref_ratio
    if loss_type == "ipo":
        loss = jnp.mean((logits - 1.0 / (2.0 * beta)) ** 2)
    else:
        loss = jnp.mean(
            -jax.nn.log_sigmoid(beta * logits) * (1.0 - label_smoothing)
            - jax.nn.log_sigmoid(-beta * logits) * label_smoothing)
    chosen_reward = beta * (policy_chosen - ref_chosen)
    rejected_reward = beta * (policy_rejected - ref_rejected)
    return loss, (jnp.mean(chosen_reward), jnp.mean(rejected_reward))


class DPOTrainer:
    """DPOTrainer(model=..., args=DPOConfig(...), train_dataset=...,
    processing_class=tokenizer). Dataset rows: {"prompt", "chosen",
    "rejected"} as strings or message lists."""

    def __init__(self, model, ref_model=None, args: Optional[DPOConfig] = None,
                 train_dataset=None, processing_class=None, **kwargs):
        assert ref_model is None, (
            "pass ref_model=None — the frozen base weights (LoRA disabled) "
            "are the reference policy, like the reference's "
            "peft disable_adapter path")
        self.model = model
        self.args = args or DPOConfig()
        self.train_dataset = train_dataset
        self.tokenizer = processing_class or getattr(model, "tokenizer", None)
        self.state_log: List[Dict[str, Any]] = []

    def _encode(self, ex):
        tok = self.tokenizer
        args = self.args

        def to_text(x, add_gen=False):
            if isinstance(x, str):
                return x
            return tok.apply_chat_template(x, tokenize=False,
                                           add_generation_prompt=add_gen)

        p = tok(to_text(ex["prompt"], add_gen=True))["input_ids"]
        if ex.get("images"):
            # vision DPO (reference: rl_replacements.py:204-437 handles
            # vision rows in DPO): make sure the prompt carries the image
            # placeholder span; if the chat template didn't insert it,
            # prepend one span per image (llava-style).
            img_id = getattr(self.model, "image_token_id", None)
            n_tok = getattr(self.model, "mm_tokens_per_image", None)
            if img_id is not None and n_tok and img_id not in p:
                p = [img_id] * (n_tok * len(ex["images"])) + p
        p = p[-args.max_prompt_length:]
        out = []
        for key in ("chosen", "rejected"):
            c = tok(to_text(ex[key]), add_special_tokens=False)["input_ids"]
            c = c[:args.max_completion_length]
            if tok.eos_token_id is not None:
                c = c + [tok.eos_token_id]
            out.append((p, c))
        return out

    def _build_batch(self, examples):
        args = self.args
        t = args.max_prompt_length + args.max_completion_length + 1
        rows = []
        pixel_rows = []
        for ex in examples:
            rows.extend(self._encode(ex))  # chosen, rejected interleaved
            if ex.get("images"):
                # the n-th image token (row-major over the batch) maps to
                # the n-th feature row, so each example's images appear
                # once per preference row (chosen AND rejected)
                pixel_rows.extend(list(ex["images"]) * 2)
        n = len(rows)
        input_ids = np.zeros((n, t), np.int32)
        targets = np.full((n, t), -100, np.int32)
        for i, (p, c) in enumerate(rows):
            seq = (p + c)[:t]
            input_ids[i, :len(seq)] = seq
            lo, hi = len(p), len(seq)
            targets[i, lo:hi] = seq[lo:hi]
        shifted = np.full_like(targets, -100)
        shifted[:, :-1] = targets[:, 1:]
        pixels = (jnp.asarray(np.stack(pixel_rows))
                  if pixel_rows else None)
        return jnp.asarray(input_ids), jnp.asarray(shifted), pixels

    def _vlm_per_token_logps(self, lora, ids, targets, pixels):
        """Per-token logps through the VLM forward: image features
        spliced into the embeddings, then the text decoder + chunked
        selective log-softmax (vision DPO; reference:
        rl_replacements.py:204-437)."""
        from ..models.decoder import forward as text_forward
        from ..ops.fused_ce_linear import selective_log_softmax
        from .grpo import _lm_head_and_scale

        model = self.model
        cfg = model.cfg
        prev = model.lora
        model.lora = lora
        try:
            embeds, spans = model.embed_multimodal(ids, pixels)
        finally:
            model.lora = prev
        h = text_forward(model.params, lora, ids, cfg,
                         inputs_embeds=embeds, image_spans=spans,
                         remat=True)
        b, t, d = h.shape
        wd, scale = _lm_head_and_scale(model.params, cfg, h.dtype, 1.0)
        lp = selective_log_softmax(
            h.reshape(-1, d), wd, targets.reshape(-1),
            softcap=cfg.final_softcap, logit_scale=scale)
        return lp.reshape(b, t)

    def _make_step(self, tx):
        model = self.model
        cfg = model.cfg
        args = self.args

        def seq_logps(lora, params, ids, targets, pixels):
            if pixels is not None:
                per_tok = self._vlm_per_token_logps(lora, ids, targets,
                                                    pixels)
            else:
                per_tok = grpo_per_token_logps(params, lora, ids,
                                               targets, cfg)
            return jnp.sum(jnp.where(targets != -100, per_tok, 0.0), axis=-1)

        def loss_fn(lora, params, ids, targets, ref_logps, pixels):
            logps = seq_logps(lora, params, ids, targets, pixels)  # [2N]
            pc, pr = logps[0::2], logps[1::2]
            rc, rr = ref_logps[0::2], ref_logps[1::2]
            loss, (cr, rj) = dpo_loss(
                pc, pr, rc, rr, beta=args.beta,
                label_smoothing=args.label_smoothing,
                loss_type=args.loss_type)
            acc = jnp.mean((cr > rj).astype(jnp.float32))
            return loss, (cr, rj, acc)

        def step(lora, opt_state, params, ids, targets, ref_logps,
                 pixels):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                lora, params, ids, targets, ref_logps, pixels)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss, aux

        ref_fn = jax.jit(
            lambda params, ids, targets, pixels: seq_logps(
                None, params, ids, targets, pixels))
        return jax.jit(step, donate_argnums=(0, 1)), ref_fn

    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, "DPO requires get_peft_model (LoRA)"
        ds = list(self.train_dataset)
        bsz = args.per_device_train_batch_size
        steps_per_epoch = max(len(ds) // bsz, 1)
        total = args.max_steps if args.max_steps > 0 else int(
            steps_per_epoch * args.num_train_epochs)
        total = max(total, 1)
        tx, _ = build_optimizer(args, total)
        opt_state = tx.init(model.lora)
        step_fn, ref_fn = self._make_step(tx)

        t0 = time.time()
        global_step = 0
        idx = 0
        while global_step < total:
            examples = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            ids, targets, pixels = self._build_batch(examples)
            ref_logps = jax.lax.stop_gradient(
                ref_fn(model.params, ids, targets, pixels))
            model.lora, opt_state, loss, (cr, rj, acc) = step_fn(
                model.lora, opt_state, model.params, ids, targets,
                ref_logps, pixels)
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
                           float(np.mean(losses)) if losses else float("nan"),
                           {"train_runtime": time.time() - t0})


def PatchDPOTrainer(*args, **kwargs):
    """Reference API no-op (reference: models/dpo.py:21-26 keeps these as
    stubs for compatibility)."""
    return DPOTrainer


def PatchKTOTrainer(*args, **kwargs):
    """Reference API no-op (reference: models/__init__.py exports it from
    models/dpo.py alongside PatchDPOTrainer)."""
    return KTOTrainer


# ---------------------------------------------------------------------------
# KTO — reference patches TRL's KTOTrainer tokenizer handling
# (rl_replacements.py:791-872); native here. Unpaired feedback: each row is
# (prompt, completion, label desirable/undesirable). Rewards are
# beta * (logp_policy - logp_ref); the KL reference point is estimated from
# mismatched prompt/completion pairs (TRL's estimator) and clamped >= 0.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class KTOConfig(DPOConfig):
    desirable_weight: float = 1.0
    undesirable_weight: float = 1.0


def kto_loss(policy_logps, ref_logps, labels, kl, *, beta: float,
             desirable_weight: float = 1.0,
             undesirable_weight: float = 1.0):
    """Sequence logps [N]; labels [N] (1 = desirable); kl scalar >= 0."""
    rewards = beta * (policy_logps - ref_logps)
    des = 1.0 - jax.nn.sigmoid(rewards - beta * kl)
    und = 1.0 - jax.nn.sigmoid(beta * kl - rewards)
    lab = labels.astype(jnp.float32)
    per = lab * desirable_weight * des + (1 - lab) * undesirable_weight * und
    return jnp.mean(per), rewards


class KTOTrainer:
    """KTOTrainer(model=..., args=KTOConfig(...), train_dataset=[{"prompt",
    "completion", "label"}], processing_class=tokenizer)."""

    def __init__(self, model, args: Optional[KTOConfig] = None,
                 train_dataset=None, processing_class=None, **kw):
        self.model = model
        self.args = args or KTOConfig()
        self.train_dataset = list(train_dataset or [])
        self.tokenizer = processing_class or getattr(model, "tokenizer",
                                                     None)
        self.state_log: List[Dict[str, Any]] = []

    def _build_batch(self, examples):
        tok = self.tokenizer
        args = self.args
        t = args.max_prompt_length + args.max_completion_length + 1
        n = len(examples)
        prompts, comps, labels = [], [], []
        for ex in examples:
            prompts.append(tok(ex["prompt"])["input_ids"]
                           [-args.max_prompt_length:])
            c = tok(ex["completion"], add_special_tokens=False)["input_ids"]
            c = c[:args.max_completion_length]
            if tok.eos_token_id is not None:
                c = c + [tok.eos_token_id]
            comps.append(c)
            labels.append(1 if ex["label"] else 0)

        def assemble(p_list, c_list):
            ids = np.zeros((n, t), np.int32)
            targets = np.full((n, t), -100, np.int32)
            for i, (p, c) in enumerate(zip(p_list, c_list)):
                seq = (list(p) + list(c))[:t]
                ids[i, :len(seq)] = seq
                targets[i, len(p):len(seq)] = seq[len(p):len(seq)]
            shifted = np.full_like(targets, -100)
            shifted[:, :-1] = targets[:, 1:]
            return jnp.asarray(ids), jnp.asarray(shifted)

        ids, targets = assemble(prompts, comps)
        # KL estimate pairs: prompt_i with completion_{i+1} (mismatched)
        kl_ids, kl_targets = assemble(prompts, comps[1:] + comps[:1])
        return ids, targets, kl_ids, kl_targets, jnp.asarray(labels)

    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, "KTO requires get_peft_model (LoRA)"
        total = args.max_steps if args.max_steps > 0 else max(
            len(self.train_dataset) // args.per_device_train_batch_size, 1)
        tx, _ = build_optimizer(args, total)
        opt_state = tx.init(model.lora)
        cfg = model.cfg

        def seq_logps(lora, params, ids, targets):
            per_tok = grpo_per_token_logps(params, lora, ids, targets, cfg)
            return jnp.sum(jnp.where(targets != -100, per_tok, 0.0), -1)

        ref_fn = jax.jit(lambda params, ids, tg:
                         seq_logps(None, params, ids, tg))
        pol_fn = jax.jit(lambda params, lora, ids, tg:
                         seq_logps(lora, params, ids, tg))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(lora, opt_state, params, ids, targets, ref, kl, labels):
            def lf(lora):
                logps = seq_logps(lora, params, ids, targets)
                return kto_loss(
                    logps, ref, labels, kl, beta=args.beta,
                    desirable_weight=args.desirable_weight,
                    undesirable_weight=args.undesirable_weight)

            (loss, rewards), grads = jax.value_and_grad(
                lf, has_aux=True)(lora)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return (optax.apply_updates(lora, updates), opt_state, loss,
                    rewards)

        bsz = args.per_device_train_batch_size
        ds = self.train_dataset
        t0 = time.time()
        idx = 0
        for s in range(total):
            batch = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            ids, targets, kl_ids, kl_targets, labels = self._build_batch(
                batch)
            ref = jax.lax.stop_gradient(
                ref_fn(model.params, ids, targets))
            # KL estimate: mean policy-vs-ref gap on mismatched pairs
            kl_pol = pol_fn(model.params, model.lora, kl_ids, kl_targets)
            kl_ref = ref_fn(model.params, kl_ids, kl_targets)
            kl = jnp.maximum(jnp.mean(kl_pol - kl_ref), 0.0)
            model.lora, opt_state, loss, rewards = step(
                model.lora, opt_state, model.params, ids, targets, ref,
                kl, labels)
            if (s + 1) % args.logging_steps == 0 or s == 0:
                lab = np.asarray(labels)
                rew = np.asarray(rewards)
                self.state_log.append({
                    "loss": float(loss),
                    "rewards/chosen": float(rew[lab == 1].mean())
                    if (lab == 1).any() else 0.0,
                    "rewards/rejected": float(rew[lab == 0].mean())
                    if (lab == 0).any() else 0.0,
                    "kl": float(kl),
                    "step": s + 1,
                })
        from .sft import TrainOutput

        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(total, float(np.mean(losses)) if losses
                           else float("nan"),
                           {"train_runtime": time.time() - t0})


# ---------------------------------------------------------------------------
# ORPO — reference patches TRL's ORPOTrainer (rl_replacements.py:791-872);
# native here. No reference policy at all: NLL on chosen + odds-ratio
# penalty between chosen and rejected.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ORPOConfig(DPOConfig):
    beta: float = 0.1  # lambda weighting the odds-ratio term


def orpo_loss(policy_chosen_logps_mean, policy_rejected_logps_mean,
              chosen_nll, *, beta: float):
    """Sequence-MEAN token logps in (ORPO uses length-normalized logps).
    loss = NLL(chosen) + beta * -log sigmoid(log odds-ratio)."""
    def log_odds(logp):
        # log( p / (1-p) ) computed stably from log p
        return logp - jnp.log1p(-jnp.exp(jnp.minimum(logp, -1e-7)))

    ratio = log_odds(policy_chosen_logps_mean) - log_odds(
        policy_rejected_logps_mean)
    or_term = -jax.nn.log_sigmoid(ratio)
    return jnp.mean(chosen_nll) + beta * jnp.mean(or_term), jnp.mean(ratio)


@dataclasses.dataclass
class CPOConfig(DPOConfig):
    cpo_alpha: float = 1.0   # weight of the chosen-NLL term


class CPOTrainer(DPOTrainer):
    """CPO (reference patches TRL's CPOTrainer tokenizer handling,
    rl_replacements.py:791-872): reference-free sigmoid preference loss on
    sequence logps + alpha * NLL(chosen)."""

    def __init__(self, model, args: Optional[CPOConfig] = None, **kw):
        super().__init__(model, args=args or CPOConfig(), **kw)

    def _make_step(self, tx):
        model = self.model
        cfg = model.cfg
        args = self.args

        def seq_stats(lora, params, ids, targets):
            per_tok = grpo_per_token_logps(params, lora, ids, targets, cfg)
            mask = (targets != -100).astype(jnp.float32)
            n = jnp.maximum(jnp.sum(mask, -1), 1.0)
            summed = jnp.sum(jnp.where(targets != -100, per_tok, 0.0), -1)
            return summed, summed / n

        def loss_fn(lora, params, ids, targets, _unused):
            summed, mean_lp = seq_stats(lora, params, ids, targets)
            pc, pr = summed[0::2], summed[1::2]
            pref = -jax.nn.log_sigmoid(
                args.beta * (pc - pr)) * (1 - args.label_smoothing) \
                - jax.nn.log_sigmoid(
                    args.beta * (pr - pc)) * args.label_smoothing
            nll = -mean_lp[0::2]
            loss = jnp.mean(pref) + args.cpo_alpha * jnp.mean(nll)
            acc = jnp.mean((pc > pr).astype(jnp.float32))
            return loss, (jnp.mean(pc), jnp.mean(pr), acc)

        def step(lora, opt_state, params, ids, targets, ref_logps,
                 pixels=None):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                lora, params, ids, targets, ref_logps)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss, aux

        ref_fn = jax.jit(lambda params, ids, targets, pixels=None:
                         jnp.zeros((ids.shape[0],), jnp.float32))
        return jax.jit(step, donate_argnums=(0, 1)), ref_fn


class ORPOTrainer(DPOTrainer):
    """Same data plumbing as DPO; different loss, no reference logps."""

    def __init__(self, model, args: Optional[ORPOConfig] = None, **kw):
        super().__init__(model, args=args or ORPOConfig(), **kw)

    def _make_step(self, tx):
        model = self.model
        cfg = model.cfg
        args = self.args

        def seq_stats(lora, params, ids, targets):
            per_tok = grpo_per_token_logps(params, lora, ids, targets, cfg)
            mask = (targets != -100).astype(jnp.float32)
            n = jnp.maximum(jnp.sum(mask, -1), 1.0)
            mean_logp = jnp.sum(jnp.where(targets != -100, per_tok, 0.0),
                                -1) / n
            return mean_logp

        def loss_fn(lora, params, ids, targets, _unused_ref):
            mean_logps = seq_stats(lora, params, ids, targets)   # [2N]
            pc, pr = mean_logps[0::2], mean_logps[1::2]
            loss, ratio = orpo_loss(pc, pr, -pc, beta=args.beta)
            acc = jnp.mean((pc > pr).astype(jnp.float32))
            return loss, (jnp.mean(pc), jnp.mean(pr), acc)

        def step(lora, opt_state, params, ids, targets, ref_logps,
                 pixels=None):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                lora, params, ids, targets, ref_logps)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss, aux

        # ORPO needs no reference logps; keep the interface and return zeros
        ref_fn = jax.jit(lambda params, ids, targets, pixels=None:
                         jnp.zeros((ids.shape[0],), jnp.float32))
        return jax.jit(step, donate_argnums=(0, 1)), ref_fn


# ---------------------------------------------------------------------------
# BCO — Binary Classifier Optimization (KTO's unpaired sibling with a
# running-mean reward baseline). Reference patches TRL's bco_trainer
# generically (models/rl.py:2286-2299); native here.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BCOConfig(DPOConfig):
    """TRL-BCOConfig-compatible surface (subset).

    delta (the reward baseline) is the RUNNING MEAN of beta*logratio
    across training, updated each step (TRL's running delta; the UDM
    classifier variant is not implemented)."""

    running_delta_momentum: float = 0.99


def bco_loss(policy_logps, ref_logps, labels, delta, *, beta: float):
    """Unpaired BCO: -logsigmoid(r - delta) for desirable rows,
    -logsigmoid(-(r - delta)) for undesirable, r = beta*logratio."""
    rewards = beta * (policy_logps - ref_logps)
    centered = rewards - delta
    lab = labels.astype(jnp.float32)
    per = -(lab * jax.nn.log_sigmoid(centered)
            + (1 - lab) * jax.nn.log_sigmoid(-centered))
    return jnp.mean(per), rewards


class BCOTrainer(KTOTrainer):
    """BCOTrainer(model=..., args=BCOConfig(...), train_dataset=
    [{"prompt", "completion", "label"}], processing_class=tok)."""

    def __init__(self, model, args: Optional[BCOConfig] = None, **kw):
        super().__init__(model, args=args or BCOConfig(), **kw)

    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, "BCO requires get_peft_model (LoRA)"
        total = args.max_steps if args.max_steps > 0 else max(
            len(self.train_dataset) // args.per_device_train_batch_size, 1)
        tx, _ = build_optimizer(args, total)
        opt_state = tx.init(model.lora)
        cfg = model.cfg

        def seq_logps(lora, params, ids, targets):
            per_tok = grpo_per_token_logps(params, lora, ids, targets, cfg)
            return jnp.sum(jnp.where(targets != -100, per_tok, 0.0), -1)

        ref_fn = jax.jit(lambda params, ids, tg:
                         seq_logps(None, params, ids, tg))

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(lora, opt_state, params, ids, targets, ref, delta,
                 labels):
            def lf(lora):
                logps = seq_logps(lora, params, ids, targets)
                return bco_loss(logps, ref, labels, delta, beta=args.beta)

            (loss, rewards), grads = jax.value_and_grad(
                lf, has_aux=True)(lora)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return (optax.apply_updates(lora, updates), opt_state, loss,
                    rewards)

        bsz = args.per_device_train_batch_size
        ds = self.train_dataset
        mom = args.running_delta_momentum
        delta = 0.0
        t0 = time.time()
        idx = 0
        for s in range(total):
            batch = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            ids, targets, _, _, labels = self._build_batch(batch)
            ref = jax.lax.stop_gradient(ref_fn(model.params, ids, targets))
            model.lora, opt_state, loss, rewards = step(
                model.lora, opt_state, model.params, ids, targets, ref,
                jnp.float32(delta), labels)
            batch_mean = float(np.asarray(rewards).mean())
            delta = (mom * delta + (1 - mom) * batch_mean) if s else \
                batch_mean
            if (s + 1) % args.logging_steps == 0 or s == 0:
                lab = np.asarray(labels)
                rew = np.asarray(rewards)
                self.state_log.append({
                    "loss": float(loss),
                    "delta": float(delta),
                    "rewards/chosen": float(rew[lab == 1].mean())
                    if (lab == 1).any() else 0.0,
                    "rewards/rejected": float(rew[lab == 0].mean())
                    if (lab == 0).any() else 0.0,
                    "step": s + 1,
                })
        from .sft import TrainOutput

        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(total, float(np.mean(losses)) if losses
                           else float("nan"),
                           {"train_runtime": time.time() - t0})
