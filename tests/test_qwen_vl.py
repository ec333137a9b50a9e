"""Qwen2.5-VL tests: full multimodal logit parity vs transformers
(windowed ViT + merger + M-RoPE), plus a LoRA training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG_TOKEN = 150


@pytest.fixture(scope="module")
def qwen_vl_ckpt(tmp_path_factory):
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration)

    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1,
            vocab_size=256, max_position_embeddings=256,
            rope_theta=1000000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            window_size=56, fullatt_block_indexes=[1], in_channels=3,
            out_hidden_size=32),
        image_token_id=IMG_TOKEN, video_token_id=151,
        vision_start_token_id=148, vision_end_token_id=149)
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("qwenvl"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def _inputs(n_text_pre=3, n_text_post=2):
    rng = np.random.RandomState(0)
    # one 112x112 image: grid (1, 8, 8) -> 64 patches -> 16 LLM tokens,
    # wrapped in vision_start(148)/vision_end(149) markers — HF's
    # get_rope_index only treats image tokens as a vision block when a
    # vision_start marker precedes them
    grid = [(1, 8, 8)]
    n_patches = 64
    pixel = rng.randn(n_patches, 3 * 2 * 14 * 14).astype(np.float32)
    n_img_tokens = 16
    ids = ([5] * n_text_pre + [148] + [IMG_TOKEN] * n_img_tokens + [149]
           + [7] * n_text_post)
    return np.asarray([ids], np.int64), pixel, grid


@pytest.mark.slow
def test_multimodal_logit_parity(qwen_vl_ckpt):
    from unsloth_tpu.models.vision import FastVisionModel

    path, hf_model = qwen_vl_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert type(model).__name__ == "QwenVLModel"
    assert model.image_token_id == IMG_TOKEN

    ids, pixel, grid = _inputs()
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixel),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    embeds, mpos = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixel), grid)
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds,
                     mrope_positions=mpos, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    logits = base_matmul(h, w)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=2e-3, rtol=2e-2)


def test_mrope_positions(qwen_vl_ckpt):
    from unsloth_tpu.models.qwen_vl import mrope_positions_for

    ids, _, grid = _inputs(n_text_pre=2, n_text_post=1)
    pos = mrope_positions_for(ids[0], IMG_TOKEN, grid, merge=2)
    # text + vision_start marker: 0,1,2 on all streams
    assert (pos[:, 0] == 0).all() and (pos[:, 2] == 2).all()
    # image block starts at 3: t stream constant, h rows, w cols
    assert (pos[0, 3:19] == 3).all()
    assert pos[1, 3] == 3 and pos[1, 18] == 6   # 4 rows: 3..6
    assert pos[2, 3] == 3 and pos[2, 18] == 6
    # vision_end after image resumes at max+1 = 7
    assert (pos[:, 19] == 7).all()


@pytest.mark.slow
def test_qwen_vl_lora_training_step(qwen_vl_ckpt):
    import optax

    from unsloth_tpu.models.vision import FastVisionModel

    path, _ = qwen_vl_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    model = FastVisionModel.get_peft_model(model, r=4, lora_alpha=8)

    ids, pixel, grid = _inputs()
    labels = ids.copy()
    labels[:, :19] = -100
    batch = {"input_ids": jnp.asarray(ids, jnp.int32),
             "labels": jnp.asarray(labels, jnp.int32),
             "pixel_values": jnp.asarray(pixel),
             "grid_thw": grid}

    tx = optax.adamw(5e-3)
    st = tx.init(model.lora)
    losses = []
    for _ in range(6):
        loss, grads = jax.value_and_grad(
            lambda l: model.vision_loss_fn(l, batch, remat=False))(
                model.lora)
        up, st = tx.update(grads, st, model.lora)
        model.lora = optax.apply_updates(model.lora, up)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.fixture(scope="module")
def qwen2_vl_ckpt(tmp_path_factory):
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    cfg = Qwen2VLConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1,
            vocab_size=256, max_position_embeddings=256,
            rope_theta=1000000.0,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(
            depth=2, embed_dim=32, mlp_ratio=2, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            in_channels=3, hidden_size=32),
        image_token_id=IMG_TOKEN, video_token_id=151,
        vision_start_token_id=148, vision_end_token_id=149)
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("qwen2vl"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_qwen2_vl_multimodal_logit_parity(qwen2_vl_ckpt):
    """Qwen2-VL (2.0): LayerNorm ViT blocks, plain quick-gelu MLP, NO
    windowed attention (per-image full attention), LayerNorm merger;
    same M-RoPE text side (HF Qwen2VLForConditionalGeneration; the
    reference catalogs 20 Qwen2-VL repos in mapper.py)."""
    from unsloth_tpu.models.vision import FastVisionModel

    path, hf_model = qwen2_vl_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.vision_cfg.norm == "ln" and not model.vision_cfg.windowed

    ids, pixel, grid = _inputs()
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixel),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    embeds, mpos = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixel), grid)
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds,
                     mrope_positions=mpos, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    logits = base_matmul(h, w)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=2e-3, rtol=2e-2)


@pytest.mark.slow
def test_qwen3_vl_multimodal_logit_parity(tmp_path_factory):
    """Qwen3-VL: interpolated-position-embedding ViT (biased LayerNorms,
    fused qkv, per-frame attention), patch mergers incl. DeepStack
    (intermediate-layer features added after early text layers), and
    channel-interleaved M-RoPE qwen3 text (HF
    Qwen3VLForConditionalGeneration; reference catalogs qwen3-vl)."""
    from transformers import Qwen3VLConfig
    from transformers.models.qwen3_vl import (
        Qwen3VLForConditionalGeneration)
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    cfg = Qwen3VLConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            vocab_size=256, max_position_embeddings=256,
            rope_theta=1000000.0,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [2, 3, 3],
                          "mrope_interleaved": True}),
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            out_hidden_size=32, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1], in_channels=3),
        image_token_id=IMG_TOKEN, video_token_id=151,
        vision_start_token_id=148, vision_end_token_id=149)
    torch.manual_seed(0)
    model_hf = Qwen3VLForConditionalGeneration(cfg)
    model_hf.eval()
    path = str(tmp_path_factory.mktemp("qwen3vl"))
    model_hf.save_pretrained(path, safe_serialization=True)

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert type(model).__name__ == "Qwen3VLModel"
    assert model.cfg.mrope_interleaved

    ids, pixel, grid = _inputs()
    with torch.no_grad():
        hf_logits = model_hf(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixel),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    embeds, mpos, ds = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixel), grid)
    assert ds is not None and ds.shape[0] == 2
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds,
                     mrope_positions=mpos, deepstack_embeds=ds,
                     remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    logits = base_matmul(h, w)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=2e-3, rtol=2e-2)


def test_qwen3_vl_moe_multimodal_logit_parity(tmp_path_factory):
    """Qwen3-VL-MoE: same DeepStack ViT + interleaved M-RoPE, MoE text
    with FUSED chunked expert tensors ([E, D, 2F] gate_up, biasless) and
    softmax-then-topk renormalized routing."""
    from transformers import Qwen3VLMoeConfig
    from transformers.models.qwen3_vl_moe import (
        Qwen3VLMoeForConditionalGeneration)
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    cfg = Qwen3VLMoeConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            vocab_size=256, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=32, max_position_embeddings=256,
            rope_theta=1000000.0,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [2, 3, 3],
                          "mrope_interleaved": True}),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
            patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
            out_hidden_size=32, num_position_embeddings=16,
            deepstack_visual_indexes=[0], in_channels=3),
        image_token_id=IMG_TOKEN, video_token_id=151,
        vision_start_token_id=148, vision_end_token_id=149)
    torch.manual_seed(0)
    model_hf = Qwen3VLMoeForConditionalGeneration(cfg)
    model_hf.eval()
    path = str(tmp_path_factory.mktemp("qwen3vlmoe"))
    model_hf.save_pretrained(path, safe_serialization=True)

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.cfg.is_moe and model.cfg.mrope_interleaved

    ids, pixel, grid = _inputs()
    with torch.no_grad():
        hf_logits = model_hf(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixel),
            image_grid_thw=torch.tensor(grid),
        ).logits.numpy()

    embeds, mpos, ds = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixel), grid)
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds,
                     mrope_positions=mpos, deepstack_embeds=ds,
                     remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    logits = base_matmul(h, w)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=2e-3, rtol=2e-2)
