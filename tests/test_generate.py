"""Generation tests: cache-decode parity with the training forward
(the same oracle style as the reference's inference tests), sampling,
stopping, left-padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.inference.decode import (forward_with_cache, init_cache,
                                          logits_from_hidden)
from unsloth_tpu.inference.generate import SamplingParams, generate
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.decoder import logits_fn
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params


@pytest.fixture(scope="module")
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return LanguageModel(cfg=cfg, params=params)


def test_prefill_matches_forward(model):
    ids = jnp.arange(1, 17, dtype=jnp.int32)[None]
    cache = init_cache(model.cfg, 1, 32, dtype=jnp.float32)
    pos = jnp.arange(16, dtype=jnp.int32)[None]
    h, cache = forward_with_cache(model.params, None, ids, model.cfg, cache,
                                  positions=pos)
    logits_cache = logits_from_hidden(model.params, h, model.cfg)
    logits_train = logits_fn(model.params, None, ids, model.cfg, remat=False)
    np.testing.assert_allclose(np.asarray(logits_cache),
                               np.asarray(logits_train), atol=2e-5)


@pytest.mark.slow
def test_decode_matches_forward(model):
    """prefill 8 + decode 8 one-by-one == full forward on 16."""
    full = jnp.arange(1, 17, dtype=jnp.int32)[None]
    cache = init_cache(model.cfg, 1, 32, dtype=jnp.float32)
    pos8 = jnp.arange(8, dtype=jnp.int32)[None]
    h, cache = forward_with_cache(model.params, None, full[:, :8], model.cfg,
                                  cache, positions=pos8)
    outs = [logits_from_hidden(model.params, h, model.cfg)[:, -1]]
    for t in range(8, 16):
        h, cache = forward_with_cache(
            model.params, None, full[:, t:t + 1], model.cfg, cache,
            positions=jnp.array([[t]], jnp.int32))
        outs.append(logits_from_hidden(model.params, h, model.cfg)[:, 0])
    stepwise = jnp.stack(outs, axis=1)  # [1, 9, V] — logits at pos 7..15
    ref = logits_fn(model.params, None, full, model.cfg, remat=False)[:, 7:]
    np.testing.assert_allclose(np.asarray(stepwise), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_generate_greedy_matches_manual(model):
    prompt = list(range(1, 9))
    out = generate(model, [prompt], SamplingParams(max_tokens=5),
                   return_token_ids=True)
    # manual greedy rollout with full forwards
    ids = list(prompt)
    manual = []
    for _ in range(5):
        logits = logits_fn(model.params, None,
                           jnp.asarray([ids], jnp.int32), model.cfg,
                           remat=False)
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == 2:
            break
        manual.append(nxt)
        ids.append(nxt)
    assert out[0] == manual


def test_generate_batch_left_padding(model):
    """Different-length prompts in one batch match their solo runs."""
    p1 = list(range(1, 9))
    p2 = list(range(3, 25))
    batch_out = generate(model, [p1, p2], SamplingParams(max_tokens=4),
                         return_token_ids=True)
    solo1 = generate(model, [p1], SamplingParams(max_tokens=4),
                     return_token_ids=True)[0]
    solo2 = generate(model, [p2], SamplingParams(max_tokens=4),
                     return_token_ids=True)[0]
    assert batch_out[0] == solo1
    assert batch_out[1] == solo2


def test_generate_with_lora(model):
    lora = init_lora_tree(model.cfg, jax.random.PRNGKey(3), r=4, alpha=8)
    # zero-init B => same outputs as base
    model.lora = lora
    out_lora = generate(model, [[1, 2, 3, 4]], SamplingParams(max_tokens=3),
                        return_token_ids=True)
    model.lora = None
    out_base = generate(model, [[1, 2, 3, 4]], SamplingParams(max_tokens=3),
                        return_token_ids=True)
    assert out_lora == out_base


def test_sampling_reproducible(model):
    p = SamplingParams(max_tokens=6, temperature=1.0, top_p=0.9, seed=42)
    a = generate(model, [[1, 2, 3]], p, return_token_ids=True)
    b = generate(model, [[1, 2, 3]], p, return_token_ids=True)
    assert a == b


def test_sampling_temperature_varies(model):
    outs = set()
    for seed in range(4):
        p = SamplingParams(max_tokens=6, temperature=2.0, seed=seed)
        outs.add(tuple(generate(model, [[1, 2, 3]], p,
                                return_token_ids=True)[0]))
    assert len(outs) > 1


def test_num_return_sequences_grouping(model):
    """Shared-prefix fanout: G completions per prompt, grouped
    consecutively; greedy fanout equals repeated greedy."""
    p1, p2 = [1, 2, 3, 4], [9, 8, 7]
    outs = generate(model, [p1, p2], SamplingParams(max_tokens=4),
                    return_token_ids=True, num_return_sequences=3)
    assert len(outs) == 6
    solo1 = generate(model, [p1], SamplingParams(max_tokens=4),
                     return_token_ids=True)[0]
    solo2 = generate(model, [p2], SamplingParams(max_tokens=4),
                     return_token_ids=True)[0]
    assert outs[0] == outs[1] == outs[2] == solo1  # greedy => identical
    assert outs[3] == outs[4] == outs[5] == solo2


def test_num_return_sequences_sampling_diverse(model):
    outs = generate(model, [[1, 2, 3]],
                    SamplingParams(max_tokens=8, temperature=2.0, seed=1),
                    return_token_ids=True, num_return_sequences=4)
    assert len(outs) == 4
    assert len({tuple(o) for o in outs}) > 1  # streams sample independently


@pytest.mark.slow
def test_gpt_oss_decode_matches_training_forward(rng):
    """Prefill+decode logits must equal the training forward for a
    gpt-oss-style config — sinks, alternating sliding windows, and MoE all
    flow through the cached path (round-2 fix: sinks were ignored in
    decode)."""
    import numpy as np

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.decoder import logits_fn
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(
        model_type="gpt_oss", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_layers=2, num_heads=2, num_kv_heads=2,
        max_position_embeddings=64, attn_sinks=True, sliding_window=4,
        layer_pattern=("sliding", "global"), num_experts=4,
        num_experts_per_tok=2, moe_intermediate_size=64, router_bias=True,
        moe_mlp_bias=True, moe_act="gpt_oss_glu", norm_topk_prob=True)
    params = init_params(cfg, rng, dtype=jnp.float32)
    assert "sinks" in params["layers"][0]

    b, t = 2, 12
    ids = jax.random.randint(rng, (b, t), 0, cfg.vocab_size)
    want = np.asarray(logits_fn(params, None, ids, cfg, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[None],
                                 (b, 8))
    h, cache = forward_with_cache(params, None, ids[:, :8], cfg, cache,
                                  positions=positions)
    got = [np.asarray(logits_from_hidden(params, h, cfg))]
    for step in range(8, t):
        pos = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(params, None, ids[:, step:step + 1],
                                      cfg, cache, positions=pos)
        got.append(np.asarray(logits_from_hidden(params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_deepseek_mla_decode_matches_training_forward(tmp_path_factory):
    """MLA compressed-KV decode: prefill+decode logits == training forward
    for a tiny DeepSeek-V3 checkpoint (cache holds kv_lora+rope per token)."""
    import numpy as np
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = DeepseekV3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, first_k_dense_replace=1,
        n_group=2, topk_group=1, max_position_embeddings=64,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("dsv3d"))
    DeepseekV3ForCausalLM(cfg_hf).save_pretrained(
        path, safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 0, 96)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[None], (b, 8))
    h, cache = forward_with_cache(model.params, None, ids[:, :8], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(8, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_falcon_h1_decode_matches_training_forward(tmp_path_factory):
    """falcon-h1 hybrid decode: the cache carries per-layer SSM recurrent
    state (conv window + state matrix) next to the attention KV; prefill
    runs the chunked SSD scan and captures the final state, decode runs
    the O(1) recurrent step (reference: models/falcon_h1.py cached path).
    Oracle: our training forward, itself HF-parity-tested."""
    import torch
    from transformers import FalconH1Config, FalconH1ForCausalLM

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = FalconH1Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, vocab_size_multiple_of=1, max_position_embeddings=256,
        mamba_d_ssm=64, mamba_n_heads=4, mamba_d_head=16, mamba_n_groups=2,
        mamba_d_state=16, mamba_d_conv=4, mamba_chunk_size=8,
        tie_word_embeddings=False, pad_token_id=0,
        embedding_multiplier=2.0, lm_head_multiplier=0.5,
        attention_in_multiplier=1.5, attention_out_multiplier=0.8,
        ssm_in_multiplier=1.25, ssm_out_multiplier=0.9,
        key_multiplier=0.7, mlp_multipliers=[1.2, 0.6],
        ssm_multipliers=[1.1, 0.9, 1.3, 0.8, 1.05])
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("falconh1d"))
    FalconH1ForCausalLM(cfg_hf).save_pretrained(path,
                                                safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 1, 96)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(7, dtype=jnp.int32)[None], (b, 7))
    h, cache = forward_with_cache(model.params, None, ids[:, :7], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(7, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


@pytest.mark.slow
def test_falcon_h1_generate_left_padded(tmp_path_factory):
    """Batched falcon-h1 generation with left-padded prompts matches the
    solo (unpadded) run — padded tokens must not pollute the SSM state."""
    import torch
    from transformers import FalconH1Config, FalconH1ForCausalLM

    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = FalconH1Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, vocab_size_multiple_of=1, max_position_embeddings=256,
        mamba_d_ssm=32, mamba_n_heads=2, mamba_d_head=16, mamba_n_groups=1,
        mamba_d_state=8, mamba_d_conv=4, mamba_chunk_size=8,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(1)
    path = str(tmp_path_factory.mktemp("falconh1g"))
    FalconH1ForCausalLM(cfg_hf).save_pretrained(path,
                                                safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    p_short = list(range(1, 6))
    p_long = list(range(1, 40))
    both = generate(model, [p_short, p_long],
                    SamplingParams(max_tokens=4), return_token_ids=True)
    solo = generate(model, [p_short], SamplingParams(max_tokens=4),
                    return_token_ids=True)
    assert both[0] == solo[0]


@pytest.mark.slow
def test_mla_absorbed_matches_expanded(tmp_path_factory):
    """The matrix-absorbed MLA decode (W_UK folded into q, W_UV into the
    output; attention computed directly over the latent cache) is
    algebraically identical to re-expanding kv_b per step (DeepSeek-V2
    paper §2.1.2). Both paths must produce the same logits."""
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    from unsloth_tpu.inference.decode import (_mla_forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = DeepseekV3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        q_lora_rank=32, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, first_k_dense_replace=1,
        n_group=2, topk_group=1, max_position_embeddings=64,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(3)
    path = str(tmp_path_factory.mktemp("dsv3abs"))
    DeepseekV3ForCausalLM(cfg_hf).save_pretrained(
        path, safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(7), (b, t), 0, 96)
    pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    outs = {}
    for absorb in (True, False):
        cache = init_cache(cfg, b, 16, dtype=jnp.float32)
        h, _ = _mla_forward_with_cache(model.params, None, ids, cfg,
                                       cache, positions=pos,
                                       absorb=absorb)
        outs[absorb] = np.asarray(logits_from_hidden(model.params, h, cfg))
    np.testing.assert_allclose(outs[True], outs[False], atol=5e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_gemma3n_decode_matches_training_forward(tmp_path_factory):
    """gemma-3n decode: AltUp streams are per-token, so the cache is a
    plain KV cache; prefill + stepwise decode must equal the training
    forward (itself HF-parity-tested in test_arch_parity)."""
    import torch
    from transformers import Gemma3nForCausalLM, Gemma3nTextConfig

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = Gemma3nTextConfig(
        vocab_size=96, vocab_size_per_layer_input=64, hidden_size=32,
        hidden_size_per_layer_input=8, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=128, sliding_window=8,
        laurel_rank=4, num_kv_shared_layers=0,
        activation_sparsity_pattern=[0.5, 0.5, 0.0, 0.0, 0.0, 0.0],
        tie_word_embeddings=True, pad_token_id=0)
    torch.manual_seed(2)
    path = str(tmp_path_factory.mktemp("gemma3nd"))
    Gemma3nForCausalLM(cfg_hf).save_pretrained(path,
                                               safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 1, 64)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(7, dtype=jnp.int32)[None], (b, 7))
    h, cache = forward_with_cache(model.params, None, ids[:, :7], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(7, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


@pytest.mark.slow
def test_lfm2_decode_matches_training_forward(tmp_path_factory):
    """LFM2 decode: conv layers keep a rolling pre-conv window in the
    cache; prefill + stepwise decode must equal the training forward."""
    import torch
    from transformers import Lfm2Config, Lfm2ForCausalLM

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = Lfm2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, conv_L_cache=3, conv_bias=False,
        layer_types=["conv", "conv", "full_attention", "conv"],
        block_multiple_of=16, tie_word_embeddings=True, pad_token_id=0)
    torch.manual_seed(4)
    path = str(tmp_path_factory.mktemp("lfm2d"))
    Lfm2ForCausalLM(cfg_hf).save_pretrained(path, safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 12
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 1, 96)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(7, dtype=jnp.int32)[None], (b, 7))
    h, cache = forward_with_cache(model.params, None, ids[:, :7], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(7, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-2)


@pytest.mark.slow
def test_minimax_decode_matches_training_forward(tmp_path_factory):
    """MiniMax decode: lightning layers carry a [B, H, Dh, Dh] decayed
    linear-attention state in cache.ssm (HF get_linear_cache); full
    layers use the KV cache. Prefill (chunked, partial last block) +
    per-token decode logits == training forward, itself HF-parity-tested
    (test_arch_parity.py::test_minimax_parity)."""
    import numpy as np
    import torch
    from transformers import MiniMaxConfig, MiniMaxForCausalLM

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = MiniMaxConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        block_size=8, full_attn_alpha_factor=0.9, full_attn_beta_factor=1.1,
        linear_attn_alpha_factor=1.2, linear_attn_beta_factor=0.8,
        mlp_alpha_factor=1.05, mlp_beta_factor=0.95,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("minimaxd"))
    MiniMaxForCausalLM(cfg_hf).save_pretrained(path,
                                               safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 13  # 13: prefill of 9 is a partial lightning block (8+1)
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 0, 96)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32)[None], (b, 9))
    h, cache = forward_with_cache(model.params, None, ids[:, :9], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(9, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_bamba_decode_matches_training_forward(tmp_path_factory):
    """bamba serial hybrid decode: mamba layers carry conv+SSM state in
    the cache (prefill: chunked SSD scan; decode: O(1) step); attention
    layers use the KV cache. Oracle: our training forward, itself
    HF-parity-tested (test_arch_parity-adjacent bamba test)."""
    import numpy as np
    import torch
    from transformers import BambaConfig, BambaForCausalLM

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = BambaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2, num_key_value_heads=1,
        attn_layer_indices=[1], mamba_n_heads=4, mamba_d_state=8,
        mamba_d_conv=4, mamba_expand=2, mamba_n_groups=1,
        mamba_chunk_size=8, max_position_embeddings=64,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("bambad"))
    BambaForCausalLM(cfg_hf).save_pretrained(path, safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 13
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 0, 96)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32)[None], (b, 9))
    h, cache = forward_with_cache(model.params, None, ids[:, :9], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(9, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_granitemoehybrid_decode_matches_training_forward(
        tmp_path_factory):
    """granite-4.0-h decode: serial mamba/attention + granite residual
    multiplier + MoE w/ shared MLP, all through the cached path (also
    regression-tests residual_multiplier in forward_with_cache, which
    was silently dropped before round 2)."""
    import numpy as np
    import torch
    from transformers import (GraniteMoeHybridConfig,
                              GraniteMoeHybridForCausalLM)

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = GraniteMoeHybridConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        shared_intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, num_key_value_heads=1,
        num_local_experts=4, num_experts_per_tok=2,
        layers_block_type=["mamba", "attention", "mamba"],
        mamba_n_heads=4, mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        mamba_n_groups=1, mamba_chunk_size=8,
        embedding_multiplier=6.0, attention_multiplier=0.08,
        residual_multiplier=0.22, logits_scaling=4.0,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("gmhd"))
    GraniteMoeHybridForCausalLM(cfg_hf).save_pretrained(
        path, safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 13
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 0, 96)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32)[None], (b, 9))
    h, cache = forward_with_cache(model.params, None, ids[:, :9], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(9, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_minimax_high_level_generate_greedy(tmp_path_factory):
    """model.generate (on-device while_loop) carries the lightning state
    through KVCache.ssm; greedy output == step-by-step argmax oracle."""
    import numpy as np
    import torch
    from transformers import MiniMaxConfig, MiniMaxForCausalLM

    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = MiniMaxConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        layer_types=["linear_attention", "full_attention"], block_size=8,
        max_position_embeddings=64, tie_word_embeddings=False,
        pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("minimaxg"))
    MiniMaxForCausalLM(cfg_hf).save_pretrained(path,
                                               safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    ids = [list(range(1, 9))]
    out = np.asarray(model.generate(ids, max_new_tokens=6,
                                    temperature=0.0,
                                    return_token_ids=True))
    cur = np.asarray(ids)
    for _ in range(6):
        lg = np.asarray(model.logits(jnp.asarray(cur, jnp.int32),
                                     remat=False))
        cur = np.concatenate([cur, [[int(lg[0, -1].argmax())]]], 1)
    np.testing.assert_array_equal(out[0][:6], cur[0, 8:14])


@pytest.mark.slow
def test_qwen3_next_decode_matches_training_forward(tmp_path_factory):
    """qwen3-next decode: GDN layers carry the pre-conv window + delta
    state in the cache (prefill: chunked delta rule; decode: O(1)
    recurrence); full layers run output-GATED attention over the KV
    cache. Oracle: our training forward, itself HF-parity-tested."""
    import numpy as np
    import torch
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)
    from unsloth_tpu.models.loader import FastLanguageModel

    cfg_hf = Qwen3NextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
        decoder_sparse_step=1, moe_intermediate_size=32,
        shared_expert_intermediate_size=32, max_position_embeddings=64,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(0)
    path = str(tmp_path_factory.mktemp("q3nextd"))
    Qwen3NextForCausalLM(cfg_hf).save_pretrained(path,
                                                 safe_serialization=True)
    model, _ = FastLanguageModel.from_pretrained(path, load_in_4bit=False,
                                                 dtype="float32")
    cfg = model.cfg
    b, t = 2, 13
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, t), 0, 96)
    want = np.asarray(model.logits(ids, remat=False))

    cache = init_cache(cfg, b, 32, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32)[None], (b, 9))
    h, cache = forward_with_cache(model.params, None, ids[:, :9], cfg,
                                  cache, positions=pos)
    got = [np.asarray(logits_from_hidden(model.params, h, cfg))]
    for step in range(9, t):
        p1 = jnp.full((b, 1), step, jnp.int32)
        h, cache = forward_with_cache(model.params, None,
                                      ids[:, step:step + 1], cfg, cache,
                                      positions=p1)
        got.append(np.asarray(logits_from_hidden(model.params, h, cfg)))
    got = np.concatenate(got, axis=1)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
