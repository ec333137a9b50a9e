"""Qwen2.5-VL cached generation (inference/generate.generate_qwen_vl):
M-RoPE prefill + uniform-stream decode vs transformers' generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 150


@pytest.fixture(scope="module")
def qwen_vl(tmp_path_factory):
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
        image_token_id=IMG, video_token_id=151,
        vision_start_token_id=148, vision_end_token_id=149)
    torch.manual_seed(0)
    hf = Qwen2_5_VLForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("qwenvlgen"))
    hf.save_pretrained(path, safe_serialization=True)

    from unsloth_tpu.models.vision import FastVisionModel

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    return model, hf


def test_qwen_vl_generate_matches_hf(qwen_vl):
    model, hf = qwen_vl
    rng = np.random.RandomState(0)
    grid = [(1, 8, 8)]                       # 64 patches -> 16 LLM tokens
    pixel = rng.randn(64, 3 * 2 * 14 * 14).astype(np.float32)
    ids = [5, 6, 7, 148] + [IMG] * 16 + [149, 8, 9]
    n = 8

    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixel),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=n, do_sample=False)
    want = hf_out[0, len(ids):].tolist()

    got = model.generate([ids], images=pixel, grids=grid,
                         max_new_tokens=n, temperature=0.0,
                         return_token_ids=True)
    assert got[0] == want, (got[0], want)


def test_qwen_vl_generate_text_only_route(qwen_vl):
    model, _ = qwen_vl
    out = model.generate([[5, 6, 7, 8]], max_new_tokens=4,
                         temperature=0.0, return_token_ids=True)
    assert len(out) == 1 and len(out[0]) <= 4


@pytest.mark.slow
def test_server_qwen_vl_chat_with_image(qwen_vl):
    """Live HTTP: an image content block routes through the Qwen image
    processor into the M-RoPE cached decode."""
    import base64
    import io
    import json
    import urllib.request

    from PIL import Image

    from unsloth_tpu.inference.server import InferenceServer

    model, _ = qwen_vl

    class Tok:
        eos_token_id = None
        chat_template = None

        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 140 for c in text]}

        def decode(self, ids, **kw):
            return "".join(chr(max(int(i), 1)) for i in ids)

    model.tokenizer = Tok()
    srv = InferenceServer(model, Tok(), model_name="tiny-qvl")
    httpd = srv.serve(port=18383, background=True)
    try:
        img = Image.fromarray((np.arange(56 * 56 * 3).reshape(56, 56, 3)
                               % 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        body = {
            "model": "tiny-qvl",
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "describe"},
                {"type": "image_url", "image_url": {
                    "url": f"data:image/png;base64,{b64}"}},
            ]}],
            "max_tokens": 5, "temperature": 0,
        }
        req = urllib.request.Request(
            "http://127.0.0.1:18383/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        content = out["choices"][0]["message"]["content"]
        assert isinstance(content, str) and len(content) > 0

        # parity with the direct path using the same processed patches
        kind, patches, grid = srv._decode_image(
            f"data:image/png;base64,{b64}")
        assert kind == "qwen"
        merge = model.spatial_merge_size
        n = grid[0] * (grid[1] // merge) * (grid[2] // merge)
        header = [model.vision_start_token_id] \
            + [model.image_token_id] * n + [model.vision_end_token_id]
        ids = Tok()("user: describe\nassistant:")["input_ids"]
        direct = model.generate([header + ids], images=patches,
                                grids=[grid], max_new_tokens=5,
                                temperature=0.0)
        assert content == direct[0], (content, direct[0])
    finally:
        httpd.shutdown()


@pytest.fixture(scope="module")
def qwen3_vl(tmp_path_factory):
    from transformers import Qwen3VLConfig
    from transformers.models.qwen3_vl import (
        Qwen3VLForConditionalGeneration)

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
        image_token_id=IMG, video_token_id=151,
        vision_start_token_id=148, vision_end_token_id=149)
    torch.manual_seed(0)
    hf = Qwen3VLForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("qwen3vlgen"))
    hf.save_pretrained(path, safe_serialization=True)

    from unsloth_tpu.models.vision import FastVisionModel

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    return model, hf


def test_qwen3_vl_generate_matches_hf(qwen3_vl):
    """DeepStack injection + interleaved M-RoPE in the cached decode."""
    model, hf = qwen3_vl
    rng = np.random.RandomState(0)
    grid = [(1, 8, 8)]
    pixel = rng.randn(64, 3 * 2 * 14 * 14).astype(np.float32)
    ids = [5, 6, 7, 148] + [IMG] * 16 + [149, 8, 9]
    n = 8

    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixel),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=n, do_sample=False)
    want = hf_out[0, len(ids):].tolist()

    got = model.generate([ids], images=pixel, grids=grid,
                         max_new_tokens=n, temperature=0.0,
                         return_token_ids=True)
    assert got[0] == want, (got[0], want)
