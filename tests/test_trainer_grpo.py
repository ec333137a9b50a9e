"""GRPO trainer tests: loss math vs hand computation, advantage
normalization, selective log-softmax parity, and an end-to-end smoke run
where reward-guided training shifts the policy (the analog of the
reference's GRPO fake-run canary, tests/version_compat/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.ops.fused_ce_linear import selective_log_softmax
from unsloth_tpu.trainer.grpo import (GRPOConfig, GRPOTrainer,
                                      group_advantages, grpo_loss,
                                      grpo_per_token_logps)


class CharTokenizer:
    """Minimal tokenizer: one char = one token (ascii)."""

    eos_token_id = 0
    pad_token_id = 0

    def __call__(self, text, **kw):
        return {"input_ids": [ord(c) % 128 for c in text]}

    def decode(self, ids, **kw):
        return "".join(chr(i) for i in ids if i > 0)


@pytest.fixture()
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    params = init_params(cfg, jax.random.PRNGKey(0))
    m = LanguageModel(cfg=cfg, params=params, tokenizer=CharTokenizer())
    m.lora = init_lora_tree(cfg, jax.random.PRNGKey(1), r=4, alpha=8)
    return m


def test_group_advantages():
    r = np.array([1.0, 0.0, 3.0, 2.0])
    adv = group_advantages(r, num_generations=2, scale_rewards=False)
    np.testing.assert_allclose(adv, [0.5, -0.5, 0.5, -0.5])
    adv_s = group_advantages(r, num_generations=2, scale_rewards=True)
    assert abs(adv_s[0]) < 1.01  # std-normalized


def test_grpo_loss_zero_when_advantage_zero():
    logps = jnp.full((2, 4), -1.0)
    mask = jnp.ones((2, 4))
    loss = grpo_loss(logps, logps, None, jnp.zeros(2), mask,
                     beta=0.0, epsilon=0.2)
    assert float(loss) == 0.0


def test_grpo_loss_sign():
    """Positive advantage => loss decreases as policy logp increases."""
    old = jnp.full((1, 4), -2.0)
    mask = jnp.ones((1, 4))
    adv = jnp.ones(1)
    lo = grpo_loss(jnp.full((1, 4), -2.1), old, None, adv, mask,
                   beta=0.0, epsilon=0.2)
    hi = grpo_loss(jnp.full((1, 4), -1.9), old, None, adv, mask,
                   beta=0.0, epsilon=0.2)
    assert float(hi) < float(lo)


def test_grpo_loss_clipping():
    """Ratio clipped at 1+eps: pushing logp far up stops helping."""
    old = jnp.full((1, 1), -2.0)
    mask = jnp.ones((1, 1))
    adv = jnp.ones(1)
    at_clip = grpo_loss(old + jnp.log(1.2), old, None, adv, mask,
                        beta=0.0, epsilon=0.2)
    beyond = grpo_loss(old + jnp.log(3.0), old, None, adv, mask,
                       beta=0.0, epsilon=0.2)
    np.testing.assert_allclose(float(at_clip), float(beyond), rtol=1e-6)


def test_kl_term_nonnegative_and_zero_at_ref():
    logps = jnp.full((1, 4), -1.5)
    mask = jnp.ones((1, 4))
    same = grpo_loss(logps, logps, logps, jnp.zeros(1), mask,
                     beta=0.1, epsilon=0.2)
    np.testing.assert_allclose(float(same), 0.0, atol=1e-7)
    other = grpo_loss(logps, logps, logps - 0.5, jnp.zeros(1), mask,
                      beta=0.1, epsilon=0.2)
    assert float(other) > 0.0


@pytest.mark.slow
def test_selective_log_softmax_matches_dense(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    n, d, v = 24, 16, 64
    h = jax.random.normal(k1, (n, d))
    w = jax.random.normal(k2, (d, v)) * 0.3
    ids = jax.random.randint(k3, (n,), 0, v).at[:3].set(-100)
    out = selective_log_softmax(h, w, ids, chunk_size=8)
    logits = h @ w
    dense = jax.nn.log_softmax(logits, -1)
    expect = jnp.take_along_axis(
        dense, jnp.maximum(ids, 0)[:, None], 1)[:, 0]
    expect = jnp.where(ids == -100, 0.0, expect)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5, rtol=1e-5)
    # gradient parity
    g1 = jax.grad(lambda h: jnp.sum(
        selective_log_softmax(h, w, ids, chunk_size=8)))(h)
    g2 = jax.grad(lambda h: jnp.sum(jnp.where(
        (ids == -100)[:, None], 0.0,
        jnp.take_along_axis(jax.nn.log_softmax(h @ w, -1),
                            jnp.maximum(ids, 0)[:, None], 1))))(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_per_token_logps_shift_alignment(model):
    """grpo_per_token_logps(targets shifted) equals log-softmax of the
    model's own next-token distribution."""
    from unsloth_tpu.models.decoder import logits_fn

    ids = jnp.arange(1, 11, dtype=jnp.int32)[None]
    targets = jnp.full((1, 10), -100, jnp.int32)
    targets = targets.at[0, :-1].set(ids[0, 1:])
    logps = grpo_per_token_logps(model.params, None, ids, targets,
                                 model.cfg)
    logits = logits_fn(model.params, None, ids, model.cfg, remat=False)
    dense = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    expect = jnp.take_along_axis(dense[0, :-1], ids[0, 1:, None], 1)[:, 0]
    np.testing.assert_allclose(np.asarray(logps[0, :-1]),
                               np.asarray(expect), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_grpo_end_to_end_reward_shifts_policy(model):
    """Dense reward favoring high-ordinal tokens; the policy's expected
    next-token ordinal after the prompt must rise."""
    ds = [{"prompt": "Q:"}] * 8

    def reward_high_chars(prompts=None, completions=None, **kw):
        return [float(np.mean([ord(c) for c in comp])) / 128.0
                if comp else 0.0 for comp in completions]

    # rollouts are seeded from args.seed (deterministic); seed and step
    # count chosen so the weak training signal on this tiny random model
    # is reliably detectable
    args = GRPOConfig(
        per_device_train_batch_size=2, num_generations=4,
        max_prompt_length=8, max_completion_length=8,
        learning_rate=5e-2, max_steps=12, beta=0.0, temperature=1.5,
        logging_steps=1, warmup_steps=0, lr_scheduler_type="constant",
        seed=7)
    trainer = GRPOTrainer(model=model, reward_funcs=[reward_high_chars],
                          args=args, train_dataset=ds,
                          processing_class=model.tokenizer)

    from unsloth_tpu.models.decoder import logits_fn

    prompt = jnp.asarray([[ord("Q"), ord(":")]], jnp.int32)
    token_vals = jnp.arange(model.cfg.vocab_size, dtype=jnp.float32)

    def expected_ordinal(lora):
        logits = logits_fn(model.params, lora, prompt, model.cfg,
                           remat=False)
        p = jax.nn.softmax(logits[0, -1].astype(jnp.float32))
        return float(jnp.sum(p * token_vals))

    before = expected_ordinal(model.lora)
    out = trainer.train()
    after = expected_ordinal(model.lora)
    assert out.global_step == 12
    assert len(trainer.state_log) == 12
    assert "reward" in trainer.state_log[0]
    assert after > before, (before, after)


@pytest.mark.slow
def test_grpo_packed_loss_matches_unpacked(model):
    """Sequence packing (reference: rl_replacements.py:55-61,1010-1281):
    the packed-layout loss must equal the unpacked one for the same
    rollouts, for every loss_type."""
    from unsloth_tpu.trainer.grpo import grpo_loss_packed

    rng = np.random.RandomState(0)
    prompt_ids = [rng.randint(3, 120, n).tolist() for n in (5, 9, 4, 7)]
    completion_ids = [rng.randint(3, 120, n).tolist()
                      for n in (6, 3, 8, 12)]
    adv = np.array([0.5, -0.5, 1.2, -1.2], np.float32)

    for loss_type in ("grpo", "bnpo", "dr_grpo"):
        args = GRPOConfig(max_prompt_length=16, max_completion_length=12,
                          beta=0.04, loss_type=loss_type)
        tr = GRPOTrainer(model, reward_funcs=[lambda **kw: [0.0]],
                         args=args, train_dataset=[])
        ub = tr._build_batch(prompt_ids, completion_ids, adv)
        pb = tr._build_packed_batch(prompt_ids, completion_ids, adv)

        from unsloth_tpu.trainer.grpo import (grpo_loss,
                                              grpo_per_token_logps)

        lp_u = grpo_per_token_logps(model.params, model.lora, ub.input_ids,
                                    ub.logp_targets, model.cfg)
        ref_u = grpo_per_token_logps(model.params, None, ub.input_ids,
                                     ub.logp_targets, model.cfg)
        loss_u = grpo_loss(lp_u, jax.lax.stop_gradient(lp_u), ref_u,
                           ub.advantages, ub.completion_mask,
                           beta=args.beta, epsilon=args.epsilon,
                           loss_type=loss_type,
                           max_completion_length=12)

        lp_p = grpo_per_token_logps(model.params, model.lora, pb.input_ids,
                                    pb.logp_targets, model.cfg,
                                    positions=pb.positions,
                                    segment_ids=pb.segment_ids)
        ref_p = grpo_per_token_logps(model.params, None, pb.input_ids,
                                     pb.logp_targets, model.cfg,
                                     positions=pb.positions,
                                     segment_ids=pb.segment_ids)
        loss_p = grpo_loss_packed(lp_p, jax.lax.stop_gradient(lp_p), ref_p,
                                  pb, beta=args.beta, epsilon=args.epsilon)
        np.testing.assert_allclose(float(loss_p), float(loss_u),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=loss_type)
        # packing actually packs: fewer rows than sequences
        assert pb.input_ids.shape[0] <= ub.input_ids.shape[0]


@pytest.mark.slow
def test_grpo_train_with_packing(model):
    """End-to-end smoke: GRPOTrainer with packing=True runs and logs."""
    args = GRPOConfig(per_device_train_batch_size=2, num_generations=2,
                      max_prompt_length=16, max_completion_length=8,
                      max_steps=2, beta=0.0, packing=True,
                      report_to="none")
    tr = GRPOTrainer(model, reward_funcs=[
        lambda prompts, completions, **kw: [float(len(c))
                                            for c in completions]],
        args=args, train_dataset=[{"prompt": "ab"}, {"prompt": "cd"}])
    out = tr.train()
    assert out.global_step == 2
    assert np.isfinite(out.training_loss)


@pytest.mark.slow
def test_grpo_grouped_loss_matches_unpacked(model):
    """Training-side PrefixGrouper (reference: utils/prefix_grouper.py:218
    + prefix_grouper_kernel.py:384): the shared-prefix grouped layout must
    reproduce the unpacked loss exactly — the prompt is attended once but
    every completion token's logp and weight is identical."""
    from unsloth_tpu.trainer.grpo import (grpo_grouped_logps,
                                          grpo_loss_grouped)

    rng = np.random.RandomState(1)
    G = 2
    p1 = rng.randint(3, 120, 7).tolist()
    p2 = rng.randint(3, 120, 5).tolist()
    prompt_ids = [p1, p1, p2, p2]          # expanded per generation
    completion_ids = [rng.randint(3, 120, n).tolist()
                      for n in (6, 3, 8, 12)]
    adv = np.array([0.5, -0.5, 1.2, -1.2], np.float32)

    for loss_type in ("grpo", "bnpo", "dr_grpo"):
        args = GRPOConfig(max_prompt_length=16, max_completion_length=12,
                          num_generations=G, beta=0.04,
                          loss_type=loss_type, prefix_grouping=True)
        tr = GRPOTrainer(model, reward_funcs=[lambda **kw: [0.0]],
                         args=args, train_dataset=[])
        ub = tr._build_batch(prompt_ids, completion_ids, adv)
        gb = tr._build_grouped_batch(prompt_ids, completion_ids, adv)
        assert gb.input_ids.shape[0] == 2          # one row per group

        lp_u = grpo_per_token_logps(model.params, model.lora, ub.input_ids,
                                    ub.logp_targets, model.cfg)
        ref_u = grpo_per_token_logps(model.params, None, ub.input_ids,
                                     ub.logp_targets, model.cfg)
        loss_u = grpo_loss(lp_u, jax.lax.stop_gradient(lp_u), ref_u,
                           ub.advantages, ub.completion_mask,
                           beta=args.beta, epsilon=args.epsilon,
                           loss_type=loss_type,
                           max_completion_length=12)

        pol = grpo_grouped_logps(model.params, model.lora, gb, model.cfg)
        ref_g = grpo_grouped_logps(model.params, None, gb, model.cfg)
        loss_g = grpo_loss_grouped(pol, jax.lax.stop_gradient(pol), ref_g,
                                   gb, beta=args.beta,
                                   epsilon=args.epsilon)
        np.testing.assert_allclose(float(loss_g), float(loss_u),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=loss_type)


@pytest.mark.slow
def test_grpo_train_with_prefix_grouping(model):
    """End-to-end smoke: GRPOTrainer with prefix_grouping=True runs and
    reward-guided training still logs sane losses."""
    args = GRPOConfig(per_device_train_batch_size=2, num_generations=2,
                      max_prompt_length=16, max_completion_length=8,
                      max_steps=2, beta=0.0, prefix_grouping=True,
                      report_to="none")
    tr = GRPOTrainer(model, reward_funcs=[
        lambda prompts=None, completions=None, **kw:
        [float(len(c)) for c in completions]],
        args=args, train_dataset=[{"prompt": "ab"}, {"prompt": "cd"}])
    out = tr.train()
    assert out.global_step == 2
    assert np.isfinite(out.training_loss)


# ---------------------------------------------------------------------------
# GSPO — sequence-level importance sampling (TRL importance_sampling_level)
# ---------------------------------------------------------------------------

def _gspo_numpy_oracle(lp, old, adv, mask, eps, level):
    """TRL GRPOTrainer semantics for importance_sampling_level."""
    log_ratio = lp - old
    if level == "sequence":
        seq = (log_ratio * mask).sum(-1) / np.maximum(mask.sum(-1), 1.0)
        ratio = np.exp(seq)[:, None] * np.ones_like(lp)
    elif level == "sequence_token":
        seq = (log_ratio * mask).sum(-1) / np.maximum(mask.sum(-1), 1.0)
        ratio = np.exp(0.0 + seq)[:, None] * np.ones_like(lp)  # sg(lp-lp)=0
    else:
        ratio = np.exp(log_ratio)
    a = adv[:, None]
    per_tok = -np.minimum(ratio * a, np.clip(ratio, 1 - eps, 1 + eps) * a)
    seq_loss = (per_tok * mask).sum(-1) / np.maximum(mask.sum(-1), 1.0)
    return seq_loss.mean()


@pytest.mark.parametrize("level", ["sequence", "sequence_token"])
def test_gspo_loss_matches_oracle(level):
    rng = np.random.RandomState(0)
    lp = rng.randn(4, 6).astype(np.float32) * 0.1 - 1.0
    old = lp + rng.randn(4, 6).astype(np.float32) * 0.05
    adv = rng.randn(4).astype(np.float32)
    mask = (rng.rand(4, 6) > 0.3).astype(np.float32)
    got = float(grpo_loss(jnp.asarray(lp), jnp.asarray(old), None,
                          jnp.asarray(adv), jnp.asarray(mask),
                          beta=0.0, epsilon=0.2,
                          importance_sampling_level=level))
    want = _gspo_numpy_oracle(lp, old, adv, mask, 0.2, level)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gspo_sequence_token_gradient_is_tokenwise():
    """sequence_token keeps PER-TOKEN gradients (the detached sequence
    ratio scales them uniformly), unlike "sequence" whose gradient routes
    only through the mean — GSPO-token's defining property."""
    rng = np.random.RandomState(1)
    old = jnp.asarray(rng.randn(2, 5).astype(np.float32) * 0.1 - 1.0)
    adv = jnp.asarray(np.array([1.0, -1.0], np.float32))
    mask = jnp.ones((2, 5), jnp.float32)

    def loss(lp, level):
        return grpo_loss(lp, old, None, adv, mask, beta=0.0,
                         epsilon=10.0,  # no clipping => smooth
                         importance_sampling_level=level)

    lp0 = old + 0.03
    g_tok = jax.grad(lambda x: loss(x, "sequence_token"))(lp0)
    g_seq = jax.grad(lambda x: loss(x, "sequence"))(lp0)
    # both sum to the same total per sequence (chain rule through the mean)
    np.testing.assert_allclose(np.asarray(g_tok).sum(), 
                               np.asarray(g_seq).sum(), rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(g_tok)))


@pytest.mark.slow
def test_gspo_end_to_end_train(model):
    """GRPOTrainer(importance_sampling_level="sequence") runs; packing is
    forced off for sequence-level ratios."""
    args = GRPOConfig(per_device_train_batch_size=2, num_generations=2,
                      max_prompt_length=8, max_completion_length=8,
                      max_steps=2, beta=0.0, packing=True,
                      importance_sampling_level="sequence",
                      report_to="none")
    tr = GRPOTrainer(model, reward_funcs=[
        lambda prompts=None, completions=None, **kw:
        [float(len(c)) for c in completions]],
        args=args, train_dataset=[{"prompt": "ab"}, {"prompt": "cd"}])
    out = tr.train()
    assert out.global_step == 2
    assert np.isfinite(out.training_loss)


# ---------------------------------------------------------------------------
# RLOO — leave-one-out baseline
# ---------------------------------------------------------------------------

def test_loo_advantages_math():
    from unsloth_tpu.trainer.grpo import loo_advantages

    r = np.array([1.0, 0.0, 3.0, 2.0])
    adv = loo_advantages(r, num_generations=2)
    # group 1: baselines are the OTHER sample: 1-0=1, 0-1=-1
    np.testing.assert_allclose(adv, [1.0, -1.0, 1.0, -1.0])
    r3 = np.array([3.0, 0.0, 0.0])
    adv3 = loo_advantages(r3, num_generations=3)
    np.testing.assert_allclose(adv3, [3.0, -1.5, -1.5])


@pytest.mark.slow
def test_rloo_end_to_end(model):
    from unsloth_tpu.trainer.grpo import RLOOConfig, RLOOTrainer

    args = RLOOConfig(per_device_train_batch_size=2, num_generations=2,
                      max_prompt_length=8, max_completion_length=8,
                      max_steps=2, beta=0.0, report_to="none")
    tr = RLOOTrainer(model, reward_funcs=[
        lambda prompts=None, completions=None, **kw:
        [float(len(c)) for c in completions]],
        args=args, train_dataset=[{"prompt": "ab"}, {"prompt": "cd"}])
    out = tr.train()
    assert out.global_step == 2
    assert np.isfinite(out.training_loss)


# ---------------------------------------------------------------------------
# BCO — unpaired preference with a running-mean baseline
# ---------------------------------------------------------------------------

def test_bco_loss_math():
    from unsloth_tpu.trainer.dpo import bco_loss

    logps = jnp.asarray([-1.0, -3.0])
    ref = jnp.asarray([-2.0, -2.0])
    labels = jnp.asarray([1, 0])
    loss, rewards = bco_loss(logps, ref, labels, jnp.float32(0.0),
                             beta=0.5)
    # rewards: 0.5*(1), 0.5*(-1) = [0.5, -0.5]
    np.testing.assert_allclose(np.asarray(rewards), [0.5, -0.5],
                               rtol=1e-6)
    import math
    want = (-math.log(1 / (1 + math.exp(-0.5)))     # desirable, r=0.5
            - math.log(1 / (1 + math.exp(-0.5)))    # undesirable, -r=0.5
            ) / 2
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    # a positive delta makes desirable rows harder, undesirable easier
    loss_hi, _ = bco_loss(logps, ref, labels, jnp.float32(0.5), beta=0.5)
    assert not np.isclose(float(loss_hi), float(loss))


@pytest.mark.slow
def test_bco_end_to_end(model):
    from unsloth_tpu.trainer.dpo import BCOConfig, BCOTrainer

    ds = [{"prompt": "ab", "completion": "zzzz", "label": True},
          {"prompt": "cd", "completion": "aaaa", "label": False},
          {"prompt": "ef", "completion": "zzz", "label": True},
          {"prompt": "gh", "completion": "aaa", "label": False}]
    args = BCOConfig(per_device_train_batch_size=4, max_steps=8,
                     max_prompt_length=8, max_completion_length=8,
                     learning_rate=5e-3, logging_steps=1, warmup_steps=0,
                     lr_scheduler_type="constant", report_to="none")
    tr = BCOTrainer(model, args=args, train_dataset=ds)
    out = tr.train()
    assert out.global_step == 8
    assert np.isfinite(out.training_loss)
    last = tr.state_log[-1]
    # desirable completions end up above the baseline, undesirable below
    assert last["rewards/chosen"] > last["rewards/rejected"]
    assert "delta" in last
