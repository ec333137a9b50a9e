"""VLM generation (inference/generate.generate_vision): cached decode
with spliced image embeddings vs transformers' generate as the oracle
(reference: models/vision.py unsloth_base_fast_generate :502)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def gemma3(tmp_path_factory):
    from transformers import Gemma3Config
    from transformers.models.gemma3 import Gemma3ForConditionalGeneration

    cfg = Gemma3Config(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            vocab_size=256, max_position_embeddings=512,
            sliding_window=16, rope_theta=1000000.0,
            rope_local_base_freq=10000.0),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
            num_channels=3),
        image_token_index=250, mm_tokens_per_image=4,
        boi_token_index=248, eoi_token_index=249)
    torch.manual_seed(0)
    hf = Gemma3ForConditionalGeneration(cfg)
    hf.eval()
    path = str(tmp_path_factory.mktemp("gemma3gen"))
    hf.save_pretrained(path, safe_serialization=True)

    from unsloth_tpu.models.vision import FastVisionModel

    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    return model, hf


@pytest.mark.slow
def test_vlm_generate_matches_hf(gemma3):
    model, hf = gemma3
    rng = np.random.RandomState(0)
    pixels = rng.randn(1, 3, 28, 28).astype(np.float32)
    ids = [5, 6, 250, 250, 250, 250, 7, 8]
    n = 8

    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixels),
            token_type_ids=torch.tensor(
                [[1 if t == 250 else 0 for t in ids]]),
            max_new_tokens=n, do_sample=False)
    want = hf_out[0, len(ids):].tolist()

    got = model.generate([ids], images=[[pixels[0]]], max_new_tokens=n,
                         temperature=0.0, return_token_ids=True)
    assert got[0] == want, (got[0], want)


@pytest.mark.slow
def test_vlm_generate_batch_and_textonly(gemma3):
    model, _ = gemma3
    rng = np.random.RandomState(1)
    p1 = rng.randn(3, 28, 28).astype(np.float32)
    p2 = rng.randn(3, 28, 28).astype(np.float32)
    ids1 = [5, 6, 250, 250, 250, 250, 7]
    ids2 = [9, 250, 250, 250, 250, 10, 11, 12]

    # batch of two image prompts: each row must equal its solo run
    batch = model.generate([ids1, ids2], images=[[p1], [p2]],
                           max_new_tokens=6, temperature=0.0,
                           return_token_ids=True)
    solo1 = model.generate([ids1], images=[[p1]], max_new_tokens=6,
                           temperature=0.0, return_token_ids=True)
    solo2 = model.generate([ids2], images=[[p2]], max_new_tokens=6,
                           temperature=0.0, return_token_ids=True)
    assert batch[0] == solo1[0]
    assert batch[1] == solo2[0]

    # images=None routes to the plain text loop
    text = model.generate([[5, 6, 7, 8]], max_new_tokens=4,
                          temperature=0.0, return_token_ids=True)
    assert len(text) == 1 and len(text[0]) <= 4


@pytest.mark.slow
def test_vlm_generate_prepends_placeholders(gemma3):
    """Prompts without the image token get llava-style prepended spans
    (mirrors trainer/dpo.py vision rows)."""
    model, _ = gemma3
    rng = np.random.RandomState(2)
    p = rng.randn(3, 28, 28).astype(np.float32)
    no_placeholder = [5, 6, 7]
    with_placeholder = [250, 250, 250, 250, 5, 6, 7]
    a = model.generate([no_placeholder], images=[[p]], max_new_tokens=5,
                       temperature=0.0, return_token_ids=True)
    b = model.generate([with_placeholder], images=[[p]], max_new_tokens=5,
                       temperature=0.0, return_token_ids=True)
    assert a[0] == b[0]


def test_server_vlm_chat_with_image(gemma3):
    """Live HTTP: an OpenAI image_url content block reaches the VLM
    decode (base64 PNG -> pixel_values -> generate_vision)."""
    import base64
    import io
    import json
    import urllib.request

    from PIL import Image

    from unsloth_tpu.inference.server import InferenceServer

    model, _ = gemma3

    class Tok:
        eos_token_id = None
        chat_template = None

        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 240 for c in text]}

        def decode(self, ids, **kw):
            return "".join(chr(max(int(i), 1)) for i in ids)

    model.tokenizer = Tok()
    srv = InferenceServer(model, Tok(), model_name="tiny-vlm")
    httpd = srv.serve(port=18379, background=True)
    try:
        img = Image.fromarray(
            (np.arange(28 * 28 * 3).reshape(28, 28, 3) % 255
             ).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()

        body = {
            "model": "tiny-vlm",
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "what is this?"},
                {"type": "image_url", "image_url": {
                    "url": f"data:image/png;base64,{b64}"}},
            ]}],
            "max_tokens": 6, "temperature": 0,
        }
        req = urllib.request.Request(
            "http://127.0.0.1:18379/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["object"] == "chat.completion"
        content = out["choices"][0]["message"]["content"]
        assert isinstance(content, str)
        # the image reached the model: the server's answer must equal a
        # DIRECT generate_vision call with the same rendered prompt and
        # the same decoded+preprocessed image
        pixels = srv._decode_image(f"data:image/png;base64,{b64}")
        assert pixels.shape == (3, 28, 28)
        prompt = "user: what is this?\nassistant:"
        direct = model.generate([prompt], images=[[pixels]],
                                max_new_tokens=6, temperature=0.0)
        assert content == direct[0], (content, direct[0])
    finally:
        httpd.shutdown()
