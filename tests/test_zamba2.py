"""Zamba2 training-path tests (parity lives in test_arch_parity.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from unsloth_tpu.models.loader import FastLanguageModel


@pytest.fixture(scope="module")
def zamba2_path(tmp_path_factory):
    from safetensors.numpy import save_file
    from transformers import Zamba2Config, Zamba2ForCausalLM

    cfg = Zamba2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        attention_head_dim=16, num_mem_blocks=1, mamba_ngroups=1,
        mamba_headdim=8, n_mamba_heads=8, mamba_d_state=16, mamba_d_conv=4,
        mamba_expand=2, chunk_size=8, use_mem_rope=False,
        use_shared_attention_adapter=False, adapter_rank=4,
        max_position_embeddings=64,
        layers_block_type=["mamba", "hybrid", "mamba", "hybrid"],
        hybrid_layer_ids=[1, 3], pad_token_id=0)
    torch.manual_seed(0)
    hf = Zamba2ForCausalLM(cfg)
    path = str(tmp_path_factory.mktemp("zamba2t"))
    seen, tensors = set(), {}
    for k, v in hf.state_dict().items():
        if v.data_ptr() in seen:
            continue
        seen.add(v.data_ptr())
        tensors[k] = np.ascontiguousarray(v.detach().numpy())
    save_file(tensors, f"{path}/model.safetensors")
    cfg.save_pretrained(path)
    return path


@pytest.mark.slow
def test_zamba2_lora_trains(zamba2_path):
    """LoRA lands on the SHARED blocks; a few adamw steps reduce the
    loss and only block LoRA updates."""
    import optax

    from unsloth_tpu.models import decoder as dec

    model, _ = FastLanguageModel.from_pretrained(
        zamba2_path, load_in_4bit=False, dtype="float32")
    model = FastLanguageModel.get_peft_model(model, r=4)
    assert model.lora["blocks"] and "q" in model.lora["blocks"][0]
    assert "gate_up" in model.lora["blocks"][0]

    ids = np.random.RandomState(0).randint(1, 96, (2, 32)).astype(np.int32)
    batch = {"input_ids": jnp.asarray(ids),
             "labels": jnp.asarray(np.roll(ids, -1, 1))}
    tx = optax.adamw(5e-3)
    opt = tx.init(model.lora)

    @jax.jit
    def step(lora, opt, params, batch):
        l, g = jax.value_and_grad(
            lambda lp: dec.loss_fn(params, lp, batch, model.cfg))(lora)
        up, opt = tx.update(g, opt, lora)
        return optax.apply_updates(lora, up), opt, l

    lora = model.lora
    losses = []
    for _ in range(40):
        lora, opt, l = step(lora, opt, model.params, batch)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    # rank-4 LoRA on one shared block: small but steadily falling loss
    assert losses[-1] < losses[0] - 0.08, losses


def test_zamba2_packing_auto_off(zamba2_path):
    """The recurrent mamba state crosses packed documents — SFTTrainer's
    packing="auto" must disable packing for zamba2."""
    model, _ = FastLanguageModel.from_pretrained(
        zamba2_path, load_in_4bit=False, dtype="float32")
    cfg = model.cfg
    assert cfg.mamba is not None  # the auto-off gate keys on this


@pytest.mark.slow
def test_zamba2_decode_matches_training_forward(zamba2_path):
    """Zamba2 decode: mamba conv+SSM state in cache.conv/ssm, hybrid
    layers' shared-attention K/V (concat width) in cache.k/v; prefill +
    per-token decode logits == training forward."""
    from unsloth_tpu.inference.decode import (forward_with_cache,
                                              init_cache,
                                              logits_from_hidden)

    model, _ = FastLanguageModel.from_pretrained(
        zamba2_path, load_in_4bit=False, dtype="float32")
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
