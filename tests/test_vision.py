"""FastVisionModel tests: logit parity vs transformers
Gemma3ForConditionalGeneration (text-only and with images), multimodal
loss/grads, LoRA training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def gemma3_ckpt(tmp_path_factory):
    from transformers import Gemma3Config
    from transformers.models.gemma3 import Gemma3ForConditionalGeneration

    cfg = Gemma3Config(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            vocab_size=256, max_position_embeddings=128,
            sliding_window=16, rope_theta=1000000.0,
            rope_local_base_freq=10000.0),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            num_channels=3),
        image_token_index=250, mm_tokens_per_image=4,
        boi_token_index=248, eoi_token_index=249)
    torch.manual_seed(0)
    model = Gemma3ForConditionalGeneration(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("gemma3"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_text_only_parity(gemma3_ckpt):
    from unsloth_tpu.models.vision import FastVisionModel

    path, hf_model = gemma3_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    ids = np.arange(1, 17).reshape(1, 16) % 240
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(ids)).logits.numpy()
    ours = np.asarray(model.logits(jnp.asarray(ids, jnp.int32),
                                   remat=False))
    np.testing.assert_allclose(ours, hf_logits, atol=3e-4, rtol=3e-3)


@pytest.mark.slow
def test_multimodal_parity(gemma3_ckpt):
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    path, hf_model = gemma3_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.image_token_id == 250
    assert model.mm_tokens_per_image == 4

    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
    # prompt: text, <img> x4 (mm_tokens_per_image), text
    ids = np.array([[5, 6, 250, 250, 250, 250, 7, 8]], np.int64)
    token_type_ids = (ids == 250).astype(np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            token_type_ids=torch.tensor(token_type_ids),
        ).logits.numpy()

    embeds, spans = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixels))
    assert int(spans[0, 2]) == 1 and int(spans[0, 0]) == 0
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds, image_spans=spans,
                     remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    logits = base_matmul(h, w)
    if model.cfg.final_softcap:
        logits = model.cfg.final_softcap * jnp.tanh(
            logits / model.cfg.final_softcap)
    np.testing.assert_allclose(np.asarray(logits), hf_out,
                               atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_vision_lora_training_step(gemma3_ckpt):
    import optax

    from unsloth_tpu.models.vision import FastVisionModel

    path, _ = gemma3_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    model = FastVisionModel.get_peft_model(model, r=4, lora_alpha=8)

    rng = np.random.RandomState(1)
    pixels = jnp.asarray(rng.randn(2, 3, 28, 28).astype(np.float32))
    ids = np.full((2, 12), 9, np.int32)
    ids[:, 2:6] = 250
    labels = ids.copy()
    labels[:, :6] = -100
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "pixel_values": pixels}

    tx = optax.adamw(5e-3)
    opt_state = tx.init(model.lora)

    @jax.jit
    def step(lora, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda l: model.vision_loss_fn(l, batch, remat=False))(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    losses = []
    for _ in range(8):
        model.lora, opt_state, loss = step(model.lora, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.fixture(scope="module")
def llava_ckpt(tmp_path_factory):
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig
    from transformers import LlavaForConditionalGeneration

    cfg = LlavaConfig(
        text_config=LlamaConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1,
            vocab_size=256, max_position_embeddings=128),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=28, patch_size=14,
            num_channels=3),
        image_token_index=250, vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("llava"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_llava_multimodal_parity(llava_ckpt):
    """llava-1.5: CLIP tower hidden_states[-2] (CLS dropped, quick-gelu),
    2-layer MLP projector, features spliced at <image> tokens, fully
    causal attention (HF LlavaForConditionalGeneration; the reference
    catalogs llava-1.5/1.6 in mapper.py)."""
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    path, hf_model = llava_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.family == "llava"
    assert model.mm_tokens_per_image == 4  # (28/14)^2

    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
    ids = np.array([[5, 6, 250, 250, 250, 250, 7, 8]], np.int64)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
        ).logits.numpy()

    embeds, spans = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixels))
    assert spans is None  # llava attention stays fully causal
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    logits = base_matmul(h, w)
    np.testing.assert_allclose(np.asarray(logits), hf_out,
                               atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_llava_lora_training_step(llava_ckpt):
    import optax

    from unsloth_tpu.models.vision import FastVisionModel

    path, _ = llava_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    model = FastVisionModel.get_peft_model(model, r=4, lora_alpha=8)

    rng = np.random.RandomState(1)
    pixels = jnp.asarray(rng.randn(2, 3, 28, 28).astype(np.float32))
    ids = np.full((2, 12), 9, np.int32)
    ids[:, 2:6] = 250
    labels = ids.copy()
    labels[:, :6] = -100
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
             "pixel_values": pixels}

    tx = optax.adamw(5e-3)
    opt_state = tx.init(model.lora)

    @jax.jit
    def step(lora, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda l: model.vision_loss_fn(l, batch, remat=False))(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    losses = []
    for _ in range(8):
        model.lora, opt_state, loss = step(model.lora, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_pixtral_llava_multimodal_parity(tmp_path_factory):
    """Pixtral-in-llava (mistral-community/pixtral-12b layout): pixtral
    ViT (biasless patch conv, RMSNorms, 2-D rope, gated-gelu MLP) +
    llava MLP projector, vision_feature_select_strategy="full"."""
    from transformers import (LlavaConfig, LlavaForConditionalGeneration,
                              MistralConfig, PixtralVisionConfig)
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    cfg = LlavaConfig(
        text_config=MistralConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, vocab_size=256,
            max_position_embeddings=128),
        vision_config=PixtralVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16),
        image_token_index=250, vision_feature_layer=-1,
        vision_feature_select_strategy="full")
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("pixtral"))
    hf.save_pretrained(path, safe_serialization=True)

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.vision_cfg_extra["tower"] == "pixtral"
    assert model.mm_tokens_per_image == 4

    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 3, 32, 32).astype(np.float32)
    ids = np.array([[5, 6, 250, 250, 250, 250, 7]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels),
                    image_sizes=torch.tensor([[32, 32]])).logits.numpy()

    embeds, spans = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixels))
    assert spans is None
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    np.testing.assert_allclose(np.asarray(base_matmul(h, w)), hf_out,
                               atol=5e-4, rtol=5e-3)


def test_mistral3_multimodal_parity(tmp_path_factory):
    """Mistral-Small-3.1-style mistral3: pixtral tower + RMSNorm /
    2x2-unfold patch merger / MLP projector (HF
    Mistral3MultiModalProjector); reference catalogs mistral-small-3.1
    repos."""
    from transformers import (Mistral3Config,
                              Mistral3ForConditionalGeneration,
                              MistralConfig, PixtralVisionConfig)
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    cfg = Mistral3Config(
        text_config=MistralConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, vocab_size=256,
            max_position_embeddings=128, rms_norm_eps=1e-5),
        vision_config=PixtralVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=64, patch_size=16),
        image_token_index=250, spatial_merge_size=2,
        multimodal_projector_bias=False, vision_feature_layer=-1)
    torch.manual_seed(0)
    hf = Mistral3ForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("mistral3"))
    hf.save_pretrained(path, safe_serialization=True)

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.family == "mistral3"
    assert model.mm_tokens_per_image == 4  # (64/16/2)^2

    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 3, 64, 64).astype(np.float32)
    ids = np.array([[5, 6, 250, 250, 250, 250, 7]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels),
                    image_sizes=torch.tensor([[64, 64]])).logits.numpy()

    embeds, spans = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixels))
    assert spans is None
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    np.testing.assert_allclose(np.asarray(base_matmul(h, w)), hf_out,
                               atol=5e-4, rtol=5e-3)


def test_aya_vision_multimodal_parity(tmp_path_factory):
    """aya-vision (CohereLabs): SigLIP tower at hidden_states[-1] (no
    post-layernorm), pixel-shuffle downsample + LayerNorm + SwiGLU
    projector, cohere2 text (HF AyaVisionForConditionalGeneration)."""
    from transformers import (AyaVisionConfig,
                              AyaVisionForConditionalGeneration)
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    cfg = AyaVisionConfig(
        text_config=dict(
            model_type="cohere2", hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, vocab_size=256,
            max_position_embeddings=128, sliding_window=8,
            sliding_window_pattern=2, tie_word_embeddings=False),
        vision_config=dict(
            model_type="siglip_vision_model", hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14,
            num_channels=3),
        image_token_index=250, downsample_factor=2,
        vision_feature_layer=-1, vision_feature_select_strategy="full")
    torch.manual_seed(0)
    hf = AyaVisionForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("aya"))
    hf.save_pretrained(path, safe_serialization=True)

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.family == "aya_vision"
    assert model.mm_tokens_per_image == 4  # 16 patches / ds^2

    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 3, 56, 56).astype(np.float32)
    ids = np.array([[5, 6, 250, 250, 250, 250, 7]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels)).logits.numpy()

    embeds, spans = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixels))
    assert spans is None
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    logits = base_matmul(h, w)
    assert model.cfg.logit_scale is None  # aya's lm_head skips it
    np.testing.assert_allclose(np.asarray(logits), hf_out,
                               atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_llava_next_multimodal_parity(tmp_path_factory):
    """llava-1.6 (llava-next) anyres: base crop + grid tiles reassembled
    spatially, unpadded to the original aspect ratio, image_newline per
    row, base features prepended (HF LlavaNextModel.pack_image_features;
    reference catalogs llava-v1.6-mistral)."""
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    cfg = LlavaNextConfig(
        text_config=LlamaConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, vocab_size=256,
            max_position_embeddings=128),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=28, patch_size=14,
            num_channels=3),
        image_token_index=250, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[56, 56]])
    torch.manual_seed(0)
    hf = LlavaNextForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("llavanext"))
    hf.save_pretrained(path, safe_serialization=True)

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert type(model).__name__ == "LlavaNextModel"
    assert model.image_newline is not None

    rng = np.random.RandomState(0)
    # one image: base crop + 2x2 tiles = 5 crops of 28x28
    pixels = rng.randn(1, 5, 3, 28, 28).astype(np.float32)
    image_sizes = [[56, 56]]
    # packed features: base 4 + 4x(4+newline) = 24 image tokens
    n_img = 24
    ids = np.asarray([[5, 6] + [250] * n_img + [7]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels),
                    image_sizes=torch.tensor(image_sizes)).logits.numpy()

    embeds, spans = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixels), image_sizes)
    assert spans is None
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    np.testing.assert_allclose(np.asarray(base_matmul(h, w)), hf_out,
                               atol=5e-4, rtol=5e-3)


def test_granite_vision_multimodal_parity(tmp_path_factory):
    """granite-vision-3.2 layout: llava-next anyres + GRANITE text.
    Regression-checks two wrapper quirks: granite's embedding_multiplier
    applies to the MERGED embeds, and the wrapper's plain lm_head skips
    granite's logits_scaling."""
    from transformers import (CLIPVisionConfig, GraniteConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.models.decoder import forward as text_forward
    from unsloth_tpu.ops.lora import base_matmul

    cfg = LlavaNextConfig(
        text_config=GraniteConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, vocab_size=256,
            max_position_embeddings=128, embedding_multiplier=6.0,
            attention_multiplier=0.08, residual_multiplier=0.22,
            logits_scaling=4.0),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2, image_size=28, patch_size=14,
            num_channels=3),
        image_token_index=250, vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[56, 56]])
    torch.manual_seed(0)
    hf = LlavaNextForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("gvision"))
    hf.save_pretrained(path, safe_serialization=True)

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    assert model.cfg.logit_scale is None  # wrapper lm_head skips it

    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 5, 3, 28, 28).astype(np.float32)
    ids = np.asarray([[5, 6] + [250] * 24 + [7]], np.int64)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pixels),
                    image_sizes=torch.tensor([[56, 56]])).logits.numpy()

    embeds, _ = model.embed_multimodal(
        jnp.asarray(ids, jnp.int32), jnp.asarray(pixels), [[56, 56]])
    h = text_forward(model.params, None, jnp.asarray(ids, jnp.int32),
                     model.cfg, inputs_embeds=embeds, remat=False)
    w = model.params.get("lm_head")
    if w is None:
        w = model.params["embed"]
    np.testing.assert_allclose(np.asarray(base_matmul(h, w)), hf_out,
                               atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_vision_dpo(gemma3_ckpt):
    """Vision DPO (reference: rl_replacements.py:204-437 vision rows in
    DPO): image rows train end-to-end, rewards margin grows."""
    from unsloth_tpu.models.vision import FastVisionModel
    from unsloth_tpu.trainer.dpo import DPOConfig, DPOTrainer

    path, _ = gemma3_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    model = FastVisionModel.get_peft_model(model, r=4, lora_alpha=8)

    class Tok:
        eos_token_id = 1
        pad_token_id = 0

        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 200 for c in text]}

    rng = np.random.RandomState(0)
    img = rng.randn(3, 28, 28).astype(np.float32)
    ds = [{"prompt": "what is it", "chosen": "a cat",
           "rejected": "a dog", "images": [img]},
          {"prompt": "color?", "chosen": "red", "rejected": "blue",
           "images": [img]}]
    args = DPOConfig(per_device_train_batch_size=2, max_steps=3,
                     max_prompt_length=24, max_completion_length=8,
                     learning_rate=5e-3, beta=0.1, report_to="none")
    tr = DPOTrainer(model, args=args, train_dataset=ds,
                    processing_class=Tok())
    out = tr.train()
    assert out.global_step == 3
    assert np.isfinite(out.training_loss)
    # accuracies/rewards logged
    assert "rewards/accuracies" in tr.state_log[-1]
