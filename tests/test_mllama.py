"""Llama-3.2-Vision (Mllama) parity vs transformers: text-only and full
multimodal (tiled image, gated two-stage ViT, cross-attention)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def mllama_ckpt(tmp_path_factory):
    from transformers import MllamaConfig
    from transformers.models.mllama import MllamaForConditionalGeneration

    cfg = MllamaConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=2, num_key_value_heads=1,
            vocab_size=256, max_position_embeddings=128,
            cross_attention_layers=[1, 3], rope_theta=10000.0,
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            rope_scaling={"rope_type": "default"}),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_global_layers=1, attention_heads=2, image_size=28,
            patch_size=14, max_num_tiles=4,
            vision_output_dim=64,  # hidden * (1 + n_intermediate)
            intermediate_layers_indices=[0],
            supported_aspect_ratios=[[1, 1], [1, 2], [2, 1], [2, 2]]),
        image_token_index=250)
    torch.manual_seed(0)
    model = MllamaForConditionalGeneration(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("mllama"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_text_only_parity(mllama_ckpt):
    from unsloth_tpu.models.mllama import load_mllama, mllama_forward

    path, hf_model = mllama_ckpt
    bundle = load_mllama(path)
    ids = np.arange(1, 13).reshape(1, 12) % 240
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(mllama_forward(bundle, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


@pytest.mark.slow
def test_multimodal_parity(mllama_ckpt):
    from unsloth_tpu.models.mllama import load_mllama, mllama_forward

    path, hf_model = mllama_ckpt
    bundle = load_mllama(path)

    rng = np.random.RandomState(0)
    # one image, 2x2 tiles of 28x28 => aspect_ratio_id for [2,2] = 4
    pixels = rng.randn(1, 1, 4, 3, 28, 28).astype(np.float32)
    ar_ids = np.array([[4]], np.int64)
    ar_mask = np.ones((1, 1, 4), np.int64)
    ids = np.array([[250, 5, 6, 7, 8, 9]], np.int64)
    n_img_tokens = 1  # <|image|> is a single token in mllama
    cross_mask = np.ones((1, ids.shape[1], 1, 4), np.int64)

    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            aspect_ratio_ids=torch.tensor(ar_ids),
            aspect_ratio_mask=torch.tensor(ar_mask),
        ).logits.numpy()

    ours = np.asarray(mllama_forward(
        bundle, jnp.asarray(ids, jnp.int32),
        pixel_values=jnp.asarray(pixels[:, 0]),
        aspect_ratio_ids=jnp.asarray(ar_ids[:, 0], jnp.int32),
        aspect_ratio_mask=jnp.asarray(ar_mask[:, 0], jnp.int32)))
    np.testing.assert_allclose(ours, hf_logits, atol=1e-3, rtol=1e-2)


@pytest.mark.slow
def test_mllama_loss_and_grads(mllama_ckpt):
    from unsloth_tpu.models.mllama import load_mllama, mllama_loss

    path, _ = mllama_ckpt
    bundle = load_mllama(path)
    rng = np.random.RandomState(1)
    batch = {
        "input_ids": jnp.asarray([[250, 5, 6, 7, 8, 9]], jnp.int32),
        "labels": jnp.asarray([[-100, 5, 6, 7, 8, 9]], jnp.int32),
        "pixel_values": jnp.asarray(
            rng.randn(1, 4, 3, 28, 28).astype(np.float32)),
        "aspect_ratio_ids": jnp.asarray([4], jnp.int32),
        "aspect_ratio_mask": jnp.ones((1, 4), jnp.int32),
    }
    def f(text):
        return mllama_loss(dict(bundle, text=text), batch)

    loss, grads = jax.value_and_grad(f)(bundle["text"])
    assert np.isfinite(float(loss))
    # cross-attn projections are tanh(0)-gated at init => their grads are
    # legitimately zero; the GATE itself must receive gradient
    assert float(jnp.max(jnp.abs(grads["layers"][1]["attn_gate"]))) > 0
    assert float(jnp.max(jnp.abs(grads["layers"][0]["q"]))) > 0
