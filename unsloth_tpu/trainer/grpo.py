"""GRPO trainer (Group Relative Policy Optimization).

Parity target: the reference's GRPO stack — TRL GRPOTrainer rewritten at
import time (reference: models/rl.py:815-1954 source rewriting,
rl_replacements.py:889-1410: `_prepare_inputs`, generation via colocated
vLLM, chunked `_get_per_token_logps`, GRPO sequence packing) plus the
"80% less VRAM" memory story (README.md:220).

TPU-native redesign — the pieces the reference assembles from three
frameworks (TRL loop + vLLM generation + Triton logprobs) collapse into one
runtime:
  * generation: our on-device `lax.while_loop` generate (inference/) — no
    vLLM colocation, no weight sync (`_move_model_to_vllm` disappears: the
    policy params ARE the generation params);
  * reference policy without a second model: QLoRA's trick — the frozen
    base weights with LoRA disabled are the reference policy (the
    reference does this via peft disable_adapter);
  * logprobs: chunked selective log-softmax over hidden states
    (ops/fused_ce_linear.selective_log_softmax) — logits never
    materialized, the analog of rl_replacements.py:1355-1410;
  * loss: token-level PPO-style clipped surrogate with group-normalized
    advantages + k3 KL penalty (TRL GRPO semantics).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..inference.generate import SamplingParams, generate
from ..models.decoder import forward
from ..ops.fused_ce_linear import selective_log_softmax
from .sft import build_optimizer, SFTConfig


@dataclasses.dataclass
class GRPOConfig(SFTConfig):
    """TRL-GRPOConfig-compatible surface (subset)."""

    num_generations: int = 4
    max_prompt_length: int = 256
    max_completion_length: int = 128
    beta: float = 0.04                 # KL coefficient (0 => no ref policy)
    epsilon: float = 0.2               # PPO clip
    epsilon_high: Optional[float] = None
    temperature: float = 0.9
    top_p: float = 1.0
    top_k: int = 0
    num_iterations: int = 1            # policy epochs per generation round
    scale_rewards: bool = True         # divide advantages by group std
    loss_type: str = "grpo"            # grpo | bnpo | dr_grpo
    # GSPO (TRL GRPOConfig.importance_sampling_level): "token" is vanilla
    # GRPO; "sequence" clips one sequence-level ratio
    # exp(mean_t(logp - old)); "sequence_token" (GSPO-token) uses the
    # detached sequence ratio as a per-token coefficient so token grads
    # still flow. Sequence levels force the unpacked batch layout.
    importance_sampling_level: str = "token"
    mask_truncated_completions: bool = False
    # GRPO sequence packing (reference: rl_replacements.py:55-61 gates it
    # behind UNSLOTH_ENABLE_GRPO_PACKING; here it's a config flag):
    # pack prompt+completion sequences into full rows via segment ids.
    packing: Any = False
    # Training-side PrefixGrouper (reference: utils/prefix_grouper.py:218 +
    # prefix_grouper_kernel.py:384): attend each group's shared prompt
    # ONCE in the loss pass — rows are [P prompt slots | G completion
    # regions]; the prompt's forward/backward (linear ops AND attention)
    # runs once instead of num_generations times.
    prefix_grouping: bool = False


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GRPOBatch:
    """Device arrays for one optimization round."""

    input_ids: jnp.ndarray        # [N, T] prompt+completion, right-padded
    completion_mask: jnp.ndarray  # [N, T] 1 on completion tokens
    logp_targets: jnp.ndarray     # [N, T] token ids shifted (-100 outside)
    advantages: jnp.ndarray       # [N]

    def tree_flatten(self):
        return ((self.input_ids, self.completion_mask, self.logp_targets,
                 self.advantages), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _lm_head_and_scale(params, cfg, dtype, temperature):
    w = params.get("lm_head")
    if w is None:
        w = params["embed"]
    from ..ops.nf4 import NF4Tensor, dequantize_nf4

    if isinstance(w, NF4Tensor):
        wd = dequantize_nf4(w, dtype).T
    else:
        wd = w.T.astype(dtype)
    scale = (1.0 / temperature) if temperature != 1.0 else None
    # combine with cfg logit scaling if present
    if cfg.logit_scale is not None:
        scale = (scale or 1.0) * cfg.logit_scale
    return wd, scale


def grpo_per_token_logps(params, lora, input_ids, targets, cfg,
                         chunk_size=2048, temperature=1.0,
                         positions=None, segment_ids=None):
    """log p(targets) for each position (targets -100 => 0), computed via
    hidden states + chunked selective log-softmax. positions/segment_ids
    enable the packed layout (GRPO sequence packing, reference:
    rl_replacements.py:55-61,1010-1281)."""
    h = forward(params, lora, input_ids, cfg, remat=True,
                positions=positions, segment_ids=segment_ids)
    b, t, d = h.shape
    wd, scale = _lm_head_and_scale(params, cfg, h.dtype, temperature)
    logps = selective_log_softmax(
        h.reshape(-1, d), wd, targets.reshape(-1),
        softcap=cfg.final_softcap, logit_scale=scale,
        chunk_size=chunk_size)
    return logps.reshape(b, t)


def grpo_grouped_logps(params, lora, batch, cfg, chunk_size=2048,
                       temperature=1.0):
    """Per-token logps for the shared-prefix grouped layout.

    Returns (logps [n_g, T], first_logps [n_g, G]) — within a completion,
    slot s predicts slot s+1; each completion's FIRST token is predicted
    from the shared prompt's last hidden state h[:, P-1] (one hidden, G
    targets), so those G logps come from a separate selective softmax."""
    from ..ops.attention import prefix_attention

    P, G, L = batch.layout
    with prefix_attention((P, G, L)):
        h = forward(params, lora, batch.input_ids, cfg, remat=True,
                    positions=batch.positions,
                    segment_ids=batch.segment_ids)
    b, t, d = h.shape
    wd, scale = _lm_head_and_scale(params, cfg, h.dtype, temperature)
    logps = selective_log_softmax(
        h.reshape(-1, d), wd, batch.logp_targets.reshape(-1),
        softcap=cfg.final_softcap, logit_scale=scale,
        chunk_size=chunk_size).reshape(b, t)
    h_first = jnp.repeat(h[:, P - 1, :], G, axis=0)        # [b*G, d]
    first_logps = selective_log_softmax(
        h_first, wd, batch.first_targets.reshape(-1),
        softcap=cfg.final_softcap, logit_scale=scale,
        chunk_size=chunk_size).reshape(b, G)
    return logps, first_logps


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PackedGRPOBatch:
    """Sequence-packed GRPO round: multiple prompt+completion sequences
    per row (segment ids + per-segment positions), with the advantage and
    the loss-normalization weight pre-broadcast per token."""

    input_ids: jnp.ndarray      # [R, T]
    segment_ids: jnp.ndarray    # [R, T] (0 = padding)
    positions: jnp.ndarray      # [R, T]
    logp_targets: jnp.ndarray   # [R, T] (-100 outside completions)
    adv_tok: jnp.ndarray        # [R, T] advantage per completion token
    w_tok: jnp.ndarray          # [R, T] loss weight per completion token

    def tree_flatten(self):
        return ((self.input_ids, self.segment_ids, self.positions,
                 self.logp_targets, self.adv_tok, self.w_tok), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GroupedGRPOBatch:
    """Shared-prefix GRPO round: one row per prompt group, laid out as
    [P prompt slots (right-aligned) | G completion regions of L slots].
    The (P, G, L) layout is STATIC pytree aux — a layout change retraces
    the jitted step, which also rebuilds the static splash prefix mask."""

    input_ids: jnp.ndarray      # [n_g, T]
    segment_ids: jnp.ndarray    # [n_g, T] (1 real, 0 padding)
    positions: jnp.ndarray      # [n_g, T] rope positions
    logp_targets: jnp.ndarray   # [n_g, T] next-token ids (-100 outside)
    first_targets: jnp.ndarray  # [n_g, G] first completion tokens
    adv_tok: jnp.ndarray        # [n_g, T]
    w_tok: jnp.ndarray          # [n_g, T]
    first_adv: jnp.ndarray      # [n_g, G]
    first_w: jnp.ndarray        # [n_g, G]
    layout: tuple = (0, 0, 0)   # (P, G, L) — static

    def tree_flatten(self):
        return ((self.input_ids, self.segment_ids, self.positions,
                 self.logp_targets, self.first_targets, self.adv_tok,
                 self.w_tok, self.first_adv, self.first_w), self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, layout=aux)


def _grpo_token_term(lp, old, ref, adv, w, *, beta, eps_low, eps_high):
    """Weighted clipped-surrogate (+ k3 KL) sum — shared by the packed
    and grouped losses."""
    ratio = jnp.exp(lp - old)
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1.0 - eps_low, 1.0 + eps_high) * adv
    per_token = -jnp.minimum(unclipped, clipped)
    if beta > 0.0 and ref is not None:
        delta = ref - lp
        per_token = per_token + beta * (jnp.exp(delta) - delta - 1.0)
    return jnp.sum(per_token * w)


def grpo_loss_grouped(policy, old, ref, batch,
                      *, beta: float, epsilon: float,
                      epsilon_high: Optional[float] = None):
    """Grouped-layout GRPO loss: the packed weighted-sum form applied to
    both the in-row logps and the first-token logps."""
    eps_high = epsilon_high if epsilon_high is not None else epsilon
    lp, flp = policy
    olp, oflp = old
    rlp, rflp = ref if ref is not None else (None, None)
    return (_grpo_token_term(lp, olp, rlp, batch.adv_tok, batch.w_tok,
                             beta=beta, eps_low=epsilon,
                             eps_high=eps_high)
            + _grpo_token_term(flp, oflp, rflp, batch.first_adv,
                               batch.first_w, beta=beta, eps_low=epsilon,
                               eps_high=eps_high))


def grpo_loss_packed(policy_logps, old_logps, ref_logps, batch,
                     *, beta: float, epsilon: float,
                     epsilon_high: Optional[float] = None):
    """Packed-layout GRPO loss: identical math to grpo_loss, with the
    per-sequence normalization folded into batch.w_tok at build time
    (grpo: 1/(len_i*N); bnpo: 1/total_tokens; dr_grpo: 1/(N*max_len))."""
    eps_low = epsilon
    eps_high = epsilon_high if epsilon_high is not None else epsilon
    ratio = jnp.exp(policy_logps - old_logps)
    unclipped = ratio * batch.adv_tok
    clipped = jnp.clip(ratio, 1.0 - eps_low, 1.0 + eps_high) \
        * batch.adv_tok
    per_token = -jnp.minimum(unclipped, clipped)
    if beta > 0.0 and ref_logps is not None:
        delta = ref_logps - policy_logps
        kl = jnp.exp(delta) - delta - 1.0
        per_token = per_token + beta * kl
    return jnp.sum(per_token * batch.w_tok)


def grpo_loss(policy_logps, old_logps, ref_logps, advantages,
              completion_mask, *, beta: float, epsilon: float,
              epsilon_high: Optional[float] = None,
              loss_type: str = "grpo",
              max_completion_length: int = 0,
              importance_sampling_level: str = "token"):
    """Token-level clipped surrogate + k3 KL (TRL GRPO semantics).

    policy/old/ref logps: [N, T]; advantages: [N]; mask: [N, T].

    importance_sampling_level (TRL GRPOConfig; the GSPO paper's sequence-
    level objective): "token" uses per-token ratios; "sequence" one
    length-normalized sequence ratio exp(mean_t(logp-old)); \
    "sequence_token" multiplies the DETACHED sequence ratio into
    per-token policy terms (logp - sg(logp)) so token-level gradients
    flow through a sequence-level clip.
    """
    eps_low = epsilon
    eps_high = epsilon_high if epsilon_high is not None else epsilon
    log_ratio = policy_logps - old_logps
    if importance_sampling_level == "token":
        ratio = jnp.exp(log_ratio)
    else:
        maskf = completion_mask.astype(jnp.float32)
        seq_log = jnp.sum(log_ratio * maskf, -1) / jnp.maximum(
            jnp.sum(maskf, -1), 1.0)                       # [N]
        if importance_sampling_level == "sequence":
            ratio = jnp.exp(seq_log)[:, None]
        elif importance_sampling_level == "sequence_token":
            ratio = jnp.exp(policy_logps
                            - jax.lax.stop_gradient(policy_logps)
                            + jax.lax.stop_gradient(seq_log)[:, None])
        else:
            raise ValueError("unknown importance_sampling_level "
                             f"{importance_sampling_level!r}")
    adv = advantages[:, None]
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1.0 - eps_low, 1.0 + eps_high) * adv
    per_token = -jnp.minimum(unclipped, clipped)
    if beta > 0.0 and ref_logps is not None:
        # k3 estimator: exp(ref-pi) - (ref-pi) - 1  >= 0
        delta = ref_logps - policy_logps
        kl = jnp.exp(delta) - delta - 1.0
        per_token = per_token + beta * kl

    mask = completion_mask.astype(jnp.float32)
    if loss_type == "grpo":
        # mean over tokens per sequence, then mean over sequences
        seq_loss = jnp.sum(per_token * mask, -1) / jnp.maximum(
            jnp.sum(mask, -1), 1.0)
        return jnp.mean(seq_loss)
    if loss_type == "bnpo":
        return jnp.sum(per_token * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    if loss_type == "dr_grpo":
        n = mask.shape[0] * max(max_completion_length, 1)
        return jnp.sum(per_token * mask) / n
    raise ValueError(f"unknown loss_type {loss_type!r}")


def group_advantages(rewards: np.ndarray, num_generations: int,
                     scale_rewards: bool = True) -> np.ndarray:
    """rewards [N] grouped as N = P * G consecutive -> centered (optionally
    std-normalized) advantages."""
    r = rewards.reshape(-1, num_generations)
    mean = r.mean(axis=1, keepdims=True)
    adv = r - mean
    if scale_rewards:
        adv = adv / (r.std(axis=1, keepdims=True) + 1e-4)
    return adv.reshape(-1).astype(np.float32)


class GRPOTrainer:
    """Reference-parity surface: GRPOTrainer(model=..., reward_funcs=[...],
    args=GRPOConfig(...), train_dataset=..., processing_class=tokenizer)."""

    def __init__(
        self,
        model,
        reward_funcs: Sequence[Callable],
        args: Optional[GRPOConfig] = None,
        train_dataset=None,
        processing_class=None,
        **kwargs,
    ):
        self.model = model
        self.reward_funcs = (list(reward_funcs)
                             if isinstance(reward_funcs, (list, tuple))
                             else [reward_funcs])
        self.args = args or GRPOConfig()
        self.train_dataset = train_dataset
        self.tokenizer = processing_class or getattr(model, "tokenizer", None)
        self.state_log: List[Dict[str, Any]] = []
        self._step_fn = None
        self.mesh = getattr(model, "mesh", None)
        from ..utils.logging import MetricsLogger

        self.metrics_logger = MetricsLogger(
            output_dir=self.args.output_dir, report_to=self.args.report_to,
            callbacks=kwargs.get("callbacks", ()))

    # -- data ----------------------------------------------------------

    def _prompt_text(self, ex) -> str:
        if "prompt" in ex:
            p = ex["prompt"]
            if isinstance(p, str):
                return p
            # conversational prompt
            return self.tokenizer.apply_chat_template(
                p, tokenize=False, add_generation_prompt=True)
        raise ValueError("GRPO dataset examples need a 'prompt' field")

    # -- rollout -------------------------------------------------------

    def _generate_batch(self, prompts: List[str]):
        """Returns (prompt_ids list, completion_ids list) with G completions
        per prompt."""
        args = self.args
        g = args.num_generations
        tok = self.tokenizer
        encoded = [tok(p)["input_ids"][-args.max_prompt_length:]
                   for p in prompts]
        self._round = getattr(self, "_round", 0) + 1
        sp = SamplingParams(
            max_tokens=args.max_completion_length,
            temperature=args.temperature, top_p=args.top_p,
            top_k=args.top_k,
            seed=(args.seed * 1000003 + self._round) % (2**31))
        # shared-prefix rollout: each prompt prefilled once, G decode
        # streams fan out from the tiled KV cache (PrefixGrouper parity)
        completions = generate(self.model, encoded, sp,
                               return_token_ids=True,
                               num_return_sequences=g)
        expanded = [p for p in encoded for _ in range(g)]
        return expanded, completions

    def _build_batch(self, prompt_ids, completion_ids, advantages):
        args = self.args
        t = args.max_prompt_length + args.max_completion_length
        n = len(prompt_ids)
        input_ids = np.zeros((n, t), np.int32)
        completion_mask = np.zeros((n, t), np.int32)
        targets = np.full((n, t), -100, np.int32)
        eos = self.tokenizer.eos_token_id if self.tokenizer else None
        for i, (p, c) in enumerate(zip(prompt_ids, completion_ids)):
            c = list(c)
            truncated = len(c) >= args.max_completion_length and (
                eos is None or (len(c) > 0 and c[-1] != eos))
            if eos is not None and len(c) < args.max_completion_length:
                c = c + [eos]
            seq = list(p) + c
            seq = seq[:t]
            input_ids[i, :len(seq)] = seq
            lo, hi = len(p), len(seq)
            # TRL mask_truncated_completions: completions cut off by the
            # length limit contribute nothing to the loss (reference:
            # rl_replacements.py grpo_trainer__generate_and_score_completions
            # zeroes their completion_mask).
            if not (args.mask_truncated_completions and truncated):
                completion_mask[i, lo:hi] = 1
            # targets[t] = token produced AT position t (predicted from t-1)
            targets[i, lo:hi] = seq[lo:hi]
        # shift: logp of token at position j is computed from hidden j-1;
        # grpo_per_token_logps consumes targets aligned to positions, so
        # shift targets left by one relative to input positions.
        shifted = np.full_like(targets, -100)
        shifted[:, :-1] = targets[:, 1:]
        mask_shifted = np.zeros_like(completion_mask)
        mask_shifted[:, :-1] = completion_mask[:, 1:]
        batch = GRPOBatch(
            input_ids=jnp.asarray(input_ids),
            completion_mask=jnp.asarray(mask_shifted),
            logp_targets=jnp.asarray(shifted),
            advantages=jnp.asarray(advantages),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            nd = int(self.mesh.shape.get("dp", 1)
                     * self.mesh.shape.get("fsdp", 1))
            row = ("dp", "fsdp") if n % max(nd, 1) == 0 else None
            mat = NamedSharding(self.mesh, P(row, None))
            vec = NamedSharding(self.mesh, P(row))
            batch = GRPOBatch(
                input_ids=jax.device_put(batch.input_ids, mat),
                completion_mask=jax.device_put(batch.completion_mask, mat),
                logp_targets=jax.device_put(batch.logp_targets, mat),
                advantages=jax.device_put(batch.advantages, vec),
            )
        return batch

    def _build_packed_batch(self, prompt_ids, completion_ids, advantages):
        """First-fit pack prompt+completion sequences into [R, T] rows with
        segment ids; per-token advantage and loss weight are precomputed so
        grpo_loss_packed is a plain weighted sum."""
        args = self.args
        t = args.max_prompt_length + args.max_completion_length
        eos = self.tokenizer.eos_token_id if self.tokenizer else None
        seqs = []
        for p, c in zip(prompt_ids, completion_ids):
            c = list(c)
            truncated = len(c) >= args.max_completion_length and (
                eos is None or (len(c) > 0 and c[-1] != eos))
            if eos is not None and len(c) < args.max_completion_length:
                c = c + [eos]
            seq = (list(p) + c)[:t]
            seqs.append((seq, len(p), truncated))

        n_seq = len(seqs)
        comp_lens = [max(len(s) - lp, 1) for s, lp, _ in seqs]
        total_comp = max(sum(
            0 if (args.mask_truncated_completions and tr) else cl
            for (_, _, tr), cl in zip(seqs, comp_lens)), 1)

        rows: List[List[int]] = []       # row -> list of seq indices
        space = []
        for i, (seq, _, _) in enumerate(seqs):
            placed = False
            for r, free in enumerate(space):
                if len(seq) <= free:
                    rows[r].append(i)
                    space[r] -= len(seq)
                    placed = True
                    break
            if not placed:
                rows.append([i])
                space.append(t - len(seq))

        # round the row count up so jit shapes stay stable across rounds
        nr = -(-len(rows) // 4) * 4
        input_ids = np.zeros((nr, t), np.int32)
        segment_ids = np.zeros((nr, t), np.int32)
        positions = np.zeros((nr, t), np.int32)
        targets = np.full((nr, t), -100, np.int32)
        adv_tok = np.zeros((nr, t), np.float32)
        w_tok = np.zeros((nr, t), np.float32)
        for r, members in enumerate(rows):
            off = 0
            for si, i in enumerate(members, 1):
                seq, lp, truncated = seqs[i]
                ln = len(seq)
                input_ids[r, off:off + ln] = seq
                segment_ids[r, off:off + ln] = si
                positions[r, off:off + ln] = np.arange(ln)
                # logp at slot j predicts token j+1 (same segment only)
                lo, hi = off + lp - 1, off + ln - 1
                targets[r, lo:hi] = seq[lp:]
                if not (args.mask_truncated_completions and truncated):
                    cl = ln - lp
                    adv_tok[r, lo:hi] = advantages[i]
                    if args.loss_type == "grpo":
                        w_tok[r, lo:hi] = 1.0 / (cl * n_seq)
                    elif args.loss_type == "bnpo":
                        w_tok[r, lo:hi] = 1.0 / total_comp
                    else:  # dr_grpo
                        w_tok[r, lo:hi] = 1.0 / (
                            n_seq * max(args.max_completion_length, 1))
                off += ln
        return PackedGRPOBatch(
            input_ids=jnp.asarray(input_ids),
            segment_ids=jnp.asarray(segment_ids),
            positions=jnp.asarray(positions),
            logp_targets=jnp.asarray(targets),
            adv_tok=jnp.asarray(adv_tok),
            w_tok=jnp.asarray(w_tok),
        )

    def _build_grouped_batch(self, prompt_ids, completion_ids, advantages):
        """Shared-prefix layout: one row per prompt group —
        [P prompt slots, right-aligned | G regions of L slots, one per
        completion]. The prompt's tokens exist ONCE per group, so its
        forward/backward (linear ops and attention) is not repeated per
        generation (reference PrefixGrouper, utils/prefix_grouper.py:218).
        """
        args = self.args
        G = args.num_generations
        P = -(-args.max_prompt_length // 128) * 128
        L = -(-(args.max_completion_length + 1) // 128) * 128
        T = P + G * L
        eos = self.tokenizer.eos_token_id if self.tokenizer else None
        n_groups = len(prompt_ids) // G
        n_seq = len(prompt_ids)

        input_ids = np.zeros((n_groups, T), np.int32)
        segment_ids = np.zeros((n_groups, T), np.int32)
        positions = np.zeros((n_groups, T), np.int32)
        targets = np.full((n_groups, T), -100, np.int32)
        first_targets = np.zeros((n_groups, G), np.int32)
        adv_tok = np.zeros((n_groups, T), np.float32)
        w_tok = np.zeros((n_groups, T), np.float32)
        first_adv = np.zeros((n_groups, G), np.float32)
        first_w = np.zeros((n_groups, G), np.float32)

        # total completion tokens for bnpo normalization
        comp_rows = []
        total_comp = 0
        for i, c in enumerate(completion_ids):
            c = list(c)
            truncated = len(c) >= args.max_completion_length and (
                eos is None or (len(c) > 0 and c[-1] != eos))
            if eos is not None and len(c) < args.max_completion_length:
                c = c + [eos]
            c = c[:L]
            comp_rows.append((c, truncated))
            if c and not (args.mask_truncated_completions and truncated):
                total_comp += len(c)
        total_comp = max(total_comp, 1)

        for g in range(n_groups):
            p = list(prompt_ids[g * G])[-P:]
            lp = len(p)
            input_ids[g, P - lp:P] = p
            segment_ids[g, P - lp:P] = 1
            positions[g, P - lp:P] = np.arange(lp)
            for j in range(G):
                idx = g * G + j
                c, truncated = comp_rows[idx]
                lc = len(c)
                if lc == 0:
                    continue
                lo = P + j * L
                input_ids[g, lo:lo + lc] = c
                segment_ids[g, lo:lo + lc] = 1
                positions[g, lo:lo + lc] = lp + np.arange(lc)
                # slot s (holding c[i]) predicts c[i+1]
                targets[g, lo:lo + lc - 1] = c[1:]
                first_targets[g, j] = c[0]
                if args.mask_truncated_completions and truncated:
                    continue
                if args.loss_type == "grpo":
                    w = 1.0 / (lc * n_seq)
                elif args.loss_type == "bnpo":
                    w = 1.0 / total_comp
                else:  # dr_grpo
                    w = 1.0 / (n_seq * max(args.max_completion_length, 1))
                adv_tok[g, lo:lo + lc - 1] = advantages[idx]
                w_tok[g, lo:lo + lc - 1] = w
                first_adv[g, j] = advantages[idx]
                first_w[g, j] = w
        return GroupedGRPOBatch(
            input_ids=jnp.asarray(input_ids),
            segment_ids=jnp.asarray(segment_ids),
            positions=jnp.asarray(positions),
            logp_targets=jnp.asarray(targets),
            first_targets=jnp.asarray(first_targets),
            adv_tok=jnp.asarray(adv_tok),
            w_tok=jnp.asarray(w_tok),
            first_adv=jnp.asarray(first_adv),
            first_w=jnp.asarray(first_w),
            layout=(P, G, L))

    def _compute_rewards(self, prompts, completions_text, examples):
        args = self.args
        g = args.num_generations
        expanded_prompts = [p for p in prompts for _ in range(g)]
        kwargs: Dict[str, List] = {}
        for key in examples[0].keys():
            if key == "prompt":
                continue
            kwargs[key] = [ex[key] for ex in examples for _ in range(g)]
        total = np.zeros(len(completions_text), np.float64)
        per_func = {}
        for fn in self.reward_funcs:
            out = fn(prompts=expanded_prompts,
                     completions=completions_text, **kwargs)
            arr = np.asarray([0.0 if r is None else float(r) for r in out])
            per_func[getattr(fn, "__name__", "reward")] = float(arr.mean())
            total += arr
        return total, per_func

    # -- training ------------------------------------------------------

    def _advantages(self, rewards: np.ndarray) -> np.ndarray:
        """Group-normalized advantages (RLOOTrainer overrides with the
        leave-one-out baseline)."""
        return group_advantages(rewards, self.args.num_generations,
                                self.args.scale_rewards)

    def _make_step(self, tx):
        model = self.model
        cfg = model.cfg
        args = self.args

        def loss_fn(lora, params, batch, old_logps, ref_logps):
            if isinstance(batch, GroupedGRPOBatch):
                policy = grpo_grouped_logps(
                    params, lora, batch, cfg,
                    temperature=args.temperature)
                old = old_logps if old_logps is not None else \
                    jax.lax.stop_gradient(policy)
                return grpo_loss_grouped(
                    policy, old, ref_logps, batch, beta=args.beta,
                    epsilon=args.epsilon, epsilon_high=args.epsilon_high)
            packed = isinstance(batch, PackedGRPOBatch)
            logps = grpo_per_token_logps(
                params, lora, batch.input_ids, batch.logp_targets, cfg,
                temperature=args.temperature,
                positions=batch.positions if packed else None,
                segment_ids=batch.segment_ids if packed else None)
            old = old_logps if old_logps is not None else \
                jax.lax.stop_gradient(logps)
            if packed:
                return grpo_loss_packed(
                    logps, old, ref_logps, batch, beta=args.beta,
                    epsilon=args.epsilon, epsilon_high=args.epsilon_high)
            return grpo_loss(
                logps, old, ref_logps, batch.advantages,
                batch.completion_mask, beta=args.beta,
                epsilon=args.epsilon, epsilon_high=args.epsilon_high,
                loss_type=args.loss_type,
                max_completion_length=args.max_completion_length,
                importance_sampling_level=args.importance_sampling_level)

        def step(lora, opt_state, params, batch, old_logps, ref_logps):
            loss, grads = jax.value_and_grad(loss_fn)(
                lora, params, batch, old_logps, ref_logps)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1),
                       static_argnums=())

    def train(self):
        args = self.args
        model = self.model
        assert model.lora is not None, \
            "GRPO requires get_peft_model (LoRA) — full-FT RL comes later"
        total_steps = args.max_steps if args.max_steps > 0 else len(
            self.train_dataset)
        tx, schedule = build_optimizer(args, total_steps)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # LoRA trainables replicate (tiny, read by every shard); the
            # frozen base was placed by the loader's mesh placer.
            model.lora = jax.device_put(
                model.lora, NamedSharding(self.mesh, P()))
        opt_state = tx.init(model.lora)
        step_fn = self._make_step(tx)
        logp_fn = jax.jit(
            lambda params, lora, ids, tg, pos, seg: grpo_per_token_logps(
                params, lora, ids, tg, model.cfg,
                temperature=args.temperature, positions=pos,
                segment_ids=seg),
            static_argnames=())
        grouped_logp_fn = jax.jit(
            lambda params, lora, batch: grpo_grouped_logps(
                params, lora, batch, model.cfg,
                temperature=args.temperature))

        bsz = args.per_device_train_batch_size
        ds = list(self.train_dataset)
        t0 = time.time()
        global_step = 0
        idx = 0
        while global_step < total_steps:
            examples = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            prompts = [self._prompt_text(ex) for ex in examples]
            prompt_ids, completion_ids = self._generate_batch(prompts)
            completions_text = [
                self.tokenizer.decode(c, skip_special_tokens=True)
                for c in completion_ids]
            rewards, per_func = self._compute_rewards(
                prompts, completions_text, examples)
            adv = self._advantages(rewards)
            # GSPO sequence-level ratios need per-sequence token means —
            # the packed/grouped weighted-sum layouts fold normalization
            # into per-token weights, so they stay token-level only.
            seq_level = args.importance_sampling_level != "token"
            grouped = bool(args.prefix_grouping) and not seq_level
            if grouped:
                batch = self._build_grouped_batch(prompt_ids,
                                                  completion_ids, adv)
            elif args.packing and args.packing != "auto" and not seq_level:
                batch = self._build_packed_batch(prompt_ids,
                                                 completion_ids, adv)
            else:
                batch = self._build_batch(prompt_ids, completion_ids, adv)

            def _logps(lora_or_none):
                if grouped:
                    return grouped_logp_fn(model.params, lora_or_none,
                                           batch)
                packed = isinstance(batch, PackedGRPOBatch)
                pos = batch.positions if packed else None
                seg = batch.segment_ids if packed else None
                return logp_fn(model.params, lora_or_none,
                               batch.input_ids, batch.logp_targets,
                               pos, seg)

            ref_logps = None
            if args.beta > 0.0:
                # reference policy = frozen base (LoRA disabled)
                ref_logps = jax.lax.stop_gradient(_logps(None))
            old_logps = None
            if args.num_iterations > 1:
                old_logps = jax.lax.stop_gradient(_logps(model.lora))

            import contextlib

            mesh_ctx = (self.mesh if self.mesh is not None
                        else contextlib.nullcontext())
            for _ in range(args.num_iterations):
                with mesh_ctx:
                    model.lora, opt_state, loss = step_fn(
                        model.lora, opt_state, model.params, batch,
                        old_logps, ref_logps)
                global_step += 1
                if global_step % args.logging_steps == 0:
                    entry = {
                        "loss": float(loss),
                        "reward": float(rewards.mean()),
                        "reward_std": float(rewards.std()),
                        "completion_length": float(np.mean(
                            [len(c) for c in completion_ids])),
                        "step": global_step,
                        **{f"rewards/{k}": v for k, v in per_func.items()},
                    }
                    self.state_log.append(entry)
                    self.metrics_logger.log(entry)
                if global_step >= total_steps:
                    break

        from .sft import TrainOutput

        elapsed = time.time() - t0
        losses = [e["loss"] for e in self.state_log]
        return TrainOutput(global_step,
                           float(np.mean(losses)) if losses else float("nan"),
                           {"train_runtime": elapsed})


def PatchFastRL(algorithm: str = "GRPO", FastLanguageModel=None):
    """Reference API shim (reference: models/rl.py:2393). Patching is
    unnecessary here — the trainers are native — so this is a no-op that
    returns the native trainer class for the asked algorithm."""
    return {"GRPO": GRPOTrainer}.get(algorithm, GRPOTrainer)


# ---------------------------------------------------------------------------
# RLOO — REINFORCE with a leave-one-out baseline (TRL RLOOTrainer)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RLOOConfig(GRPOConfig):
    """TRL-RLOOConfig-compatible surface: same generation/optimization
    knobs as GRPO; advantages use the leave-one-out group baseline and
    are NOT std-normalized by default (TRL normalize_advantages=False)."""

    scale_rewards: bool = False


def loo_advantages(rewards: np.ndarray, num_generations: int,
                   scale_rewards: bool = False) -> np.ndarray:
    """adv_i = r_i - mean(r_j, j != i) = G/(G-1) * (r_i - mean)."""
    g = num_generations
    r = rewards.reshape(-1, g)
    adv = (r - r.mean(axis=1, keepdims=True)) * (g / max(g - 1, 1))
    if scale_rewards:
        adv = adv / (r.std(axis=1, keepdims=True) + 1e-4)
    return adv.reshape(-1).astype(np.float32)


class RLOOTrainer(GRPOTrainer):
    """TRL RLOOTrainer analog: GRPO machinery (rollouts, clipped
    surrogate, packing/prefix-grouping, metrics) with the leave-one-out
    advantage estimator (the reference patches trl's rloo_trainer with
    the same generic machinery, models/rl.py:2286-2299)."""

    def __init__(self, model, reward_funcs, args=None, **kwargs):
        super().__init__(model, reward_funcs, args=args or RLOOConfig(),
                         **kwargs)

    def _advantages(self, rewards: np.ndarray) -> np.ndarray:
        return loo_advantages(rewards, self.args.num_generations,
                              self.args.scale_rewards)
