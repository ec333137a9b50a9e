"""Sesame CSM (TTS) parity tests: backbone embeds + hidden, depth
decoder logits, and the composed loss, all vs HF
CsmForConditionalGeneration internals."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def csm_ckpt(tmp_path_factory):
    from transformers import CsmConfig, CsmForConditionalGeneration

    cfg = CsmConfig(
        num_codebooks=4, vocab_size=64, text_vocab_size=96,
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, audio_token_id=90,
        audio_eos_token_id=91, codebook_eos_token_id=63,
        depth_decoder_config=dict(
            num_codebooks=4, vocab_size=64, backbone_hidden_size=32,
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1,
            max_position_embeddings=8),
        tie_codebooks_embeddings=True)
    torch.manual_seed(0)
    model = CsmForConditionalGeneration(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("csm"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


@pytest.mark.slow
def test_csm_backbone_and_depth_parity(csm_ckpt):
    """Frame embedding (summed codebooks), backbone hidden states, and
    depth-decoder per-position codebook logits vs HF internals."""
    from unsloth_tpu.models.csm import load_csm

    path, hf = csm_ckpt
    model = load_csm(path, dtype=jnp.float32)
    assert model.num_codebooks == 4 and model.codebook_vocab == 64

    rng = np.random.RandomState(0)
    b, t, nf = 1, 10, 4
    ids = rng.randint(1, 80, (b, t)).astype(np.int64)
    ids[0, 3:3 + nf] = 90                   # audio frames
    codes = rng.randint(0, 63, (nf, 4)).astype(np.int64)

    # HF embeds: text embed then frame sums at the audio positions
    with torch.no_grad():
        emb_hf = hf.embed_text_tokens(torch.tensor(ids))
        frame_emb = hf.backbone_model.embed_tokens(torch.tensor(codes)[None])[0]
        emb_hf[0, 3:3 + nf] = frame_emb
        h_hf = hf.backbone_model(
            inputs_embeds=emb_hf).last_hidden_state.numpy()

    emb = model.embed_mixed(jnp.asarray(ids, jnp.int32),
                            jnp.asarray(codes, jnp.int32))
    np.testing.assert_allclose(np.asarray(emb), emb_hf.numpy(),
                               atol=1e-5, rtol=1e-5)
    h = model.backbone_hidden(emb, remat=False)
    np.testing.assert_allclose(np.asarray(h), h_hf, atol=5e-4, rtol=5e-3)

    # depth decoder: first codebook token + backbone state -> logits for
    # codebooks 1..3
    first_hidden = h_hf[:, 2]               # state preceding frame 0
    depth_ids = np.pad(codes[:1, :3], ((0, 0), (1, 0)))  # HF pads col 0
    with torch.no_grad():
        d_hf = hf.depth_decoder(
            input_ids=torch.tensor(depth_ids),
            backbone_last_hidden_state=torch.tensor(first_hidden),
        ).logits.numpy()
    d = model.depth_logits(jnp.asarray(first_hidden),
                           jnp.asarray(codes[:1, :3], jnp.int32))
    np.testing.assert_allclose(np.asarray(d), d_hf, atol=5e-4, rtol=5e-3)


@pytest.mark.slow
def test_csm_loss_parity(csm_ckpt):
    """Composed loss == HF backbone CE + depth CE on the same batch."""
    from unsloth_tpu.models.csm import load_csm

    path, hf = csm_ckpt
    model = load_csm(path, dtype=jnp.float32)

    rng = np.random.RandomState(1)
    b, t, nf, k = 1, 12, 5, 4
    ids = rng.randint(1, 80, (b, t)).astype(np.int64)
    ids[0, 4:4 + nf] = 90
    codes = rng.randint(0, 63, (nf, k)).astype(np.int64)
    labels = np.full((b, t, k), -100, np.int64)
    labels[0, 4:4 + nf] = codes             # train on every frame

    # HF: build merged embeds manually, then run the full forward with
    # labels via inputs_embeds
    with torch.no_grad():
        emb_hf = hf.embed_text_tokens(torch.tensor(ids))
        emb_hf[0, 4:4 + nf] = hf.backbone_model.embed_tokens(
            torch.tensor(codes)[None])[0]
        out = hf(inputs_embeds=emb_hf, labels=torch.tensor(labels))
    want = float(out.loss)

    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "audio_codes": jnp.asarray(codes, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "frame_positions": jnp.asarray(
            [[0, 4 + i] for i in range(nf)], jnp.int32),
    }
    got = float(model.loss_fn(None, batch, remat=False))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_csm_lora_free_finetune_step(csm_ckpt):
    """A few full-finetune adamw steps on the composed loss reduce it
    (the reference fine-tunes csm full-rank through its TTS notebook)."""
    import optax

    from unsloth_tpu.models.csm import load_csm

    path, _ = csm_ckpt
    model = load_csm(path, dtype=jnp.float32)

    rng = np.random.RandomState(2)
    ids = rng.randint(1, 80, (1, 12)).astype(np.int64)
    ids[0, 4:9] = 90
    codes = rng.randint(0, 63, (5, 4)).astype(np.int64)
    labels = np.full((1, 12, 4), -100, np.int64)
    labels[0, 4:9] = codes
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "audio_codes": jnp.asarray(codes, jnp.int32),
        "labels": jnp.asarray(labels, jnp.int32),
        "frame_positions": jnp.asarray(
            [[0, 4 + i] for i in range(5)], jnp.int32),
    }
    tx = optax.adamw(1e-3)
    opt = tx.init(model.params)

    @jax.jit
    def step(params, opt):
        l, g = jax.value_and_grad(
            lambda p: model.loss_fn(p, batch, remat=False))(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, l

    params = model.params
    losses = []
    for _ in range(10):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] - 0.3, losses


def test_csm_greedy_generate_matches_hf(csm_ckpt):
    """Greedy frame generation (backbone codebook-0 + depth rollout of
    the rest, frame embeds fed back) == HF CsmForConditionalGeneration
    .generate codes."""
    from unsloth_tpu.models.csm import csm_generate, load_csm

    path, hf = csm_ckpt
    model = load_csm(path, dtype=jnp.float32)
    ids = np.asarray([[5, 6, 7, 8]], np.int64)
    with torch.no_grad():
        want = hf.generate(input_ids=torch.tensor(ids), do_sample=False,
                           max_new_tokens=5, output_audio=False).numpy()
    got = csm_generate(model, jnp.asarray(ids, jnp.int32), max_frames=5)
    np.testing.assert_array_equal(got, want[0])
