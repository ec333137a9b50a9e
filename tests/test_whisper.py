"""Whisper tests: log-mel parity vs transformers' feature extractor and
model logit parity vs WhisperForConditionalGeneration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def whisper_ckpt(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=256, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=[],
        begin_suppress_tokens=[])
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg)
    model.eval()
    path = str(tmp_path_factory.mktemp("whisper"))
    model.save_pretrained(path, safe_serialization=True)
    return path, model


@pytest.mark.slow
def test_log_mel_matches_transformers():
    from transformers import WhisperFeatureExtractor

    from unsloth_tpu.models.whisper import log_mel_spectrogram

    fe = WhisperFeatureExtractor()
    rng = np.random.RandomState(0)
    audio = (rng.randn(16000 * 2) * 0.1).astype(np.float32)  # 2 s
    ref = fe(audio, sampling_rate=16000,
             return_tensors="np")["input_features"][0]       # [80, 3000]
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(audio))[0])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_whisper_logit_parity(whisper_ckpt):
    from unsloth_tpu.models.whisper import (load_whisper, whisper_decode,
                                            whisper_encode)

    path, hf_model = whisper_ckpt
    params, cfg = load_whisper(path)

    rng = np.random.RandomState(1)
    feats = rng.randn(1, 80, 3000).astype(np.float32)
    dec_ids = np.arange(1, 9).reshape(1, 8)

    with torch.no_grad():
        hf_logits = hf_model(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()

    enc = whisper_encode(params, jnp.asarray(feats), cfg)
    logits = whisper_decode(params, jnp.asarray(dec_ids, jnp.int32),
                            enc, cfg)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_whisper_loss_and_grads(whisper_ckpt):
    from unsloth_tpu.models.whisper import load_whisper, whisper_loss

    path, _ = whisper_ckpt
    params, cfg = load_whisper(path)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(1, 80, 3000).astype(np.float32))
    ids = jnp.asarray(np.arange(1, 9).reshape(1, 8), jnp.int32)
    labels = jnp.asarray(np.arange(2, 10).reshape(1, 8), jnp.int32)

    loss, grads = jax.value_and_grad(
        lambda p: whisper_loss(p, feats, ids, labels, cfg))(params)
    assert np.isfinite(float(loss))
    g = grads["decoder"]["layers"][0]["cross_attn"]["q"]["kernel"]
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.slow
def test_whisper_lora(whisper_ckpt):
    """LoRA path: zero-init B makes lora a no-op at init (logit parity
    with the base model), grads flow only to adapters, and the trainer's
    lora mode overfits with the base frozen (the reference's Whisper
    notebook trains q/v adapters via get_peft_model)."""
    from unsloth_tpu.models.whisper import (init_whisper_lora,
                                            load_whisper, whisper_decode,
                                            whisper_encode, whisper_loss)
    from unsloth_tpu.trainer.sft import SFTConfig
    from unsloth_tpu.trainer.whisper import WhisperTrainer

    path, _ = whisper_ckpt
    params, cfg = load_whisper(path)
    lora = init_whisper_lora(cfg, jax.random.PRNGKey(0), r=4, alpha=8)

    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(1, 80, 3000).astype(np.float32))
    ids = jnp.asarray(np.arange(1, 9).reshape(1, 8), jnp.int32)

    base = whisper_decode(params, ids, whisper_encode(params, feats, cfg),
                          cfg)
    with_lora = whisper_decode(
        params, ids, whisper_encode(params, feats, cfg, lora=lora), cfg,
        lora=lora)
    np.testing.assert_allclose(np.asarray(with_lora), np.asarray(base),
                               atol=1e-6)

    labels = jnp.asarray(np.arange(2, 10).reshape(1, 8), jnp.int32)
    grads = jax.grad(lambda l: whisper_loss(params, feats, ids, labels,
                                            cfg, lora=l))(lora)
    gb = grads["decoder"]["layers"][0]["cross_attn"]["q"].b
    assert float(jnp.max(jnp.abs(gb))) > 0

    mel = rng.randn(cfg.num_mel_bins, 20).astype(np.float32)
    ds = [{"features": mel, "labels": [5, 9, 17, 3, 2]} for _ in range(4)]
    args = SFTConfig(per_device_train_batch_size=4, max_steps=60,
                     learning_rate=1e-2, lr_scheduler_type="constant",
                     warmup_steps=0, max_seq_length=16)
    tr = WhisperTrainer((params, cfg), train_dataset=ds, args=args,
                        lora=init_whisper_lora(cfg, jax.random.PRNGKey(1),
                                               r=4, alpha=8))
    tr.train()
    losses = [e["loss"] for e in tr.state_log]
    # attention-only adapters over a frozen random base plateau ~10%
    # below init (the tied lm head never trains, capping attainable CE);
    # assert the decrease, not full overfit
    assert losses[-1] < losses[0] * 0.93, losses
    new_params, _ = tr.model
    k0 = params["decoder"]["layers"][0]["self_attn"]["q"]["kernel"]
    k1 = new_params["decoder"]["layers"][0]["self_attn"]["q"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))


@pytest.mark.slow
def test_whisper_greedy_matches_hf_generate(whisper_ckpt):
    """Jitted lax.while_loop greedy decode == transformers generate
    (greedy, no sampling) on the tiny fixture."""
    from unsloth_tpu.models.whisper import (load_whisper,
                                            whisper_greedy_decode)

    path, hf_model = whisper_ckpt
    params, cfg = load_whisper(path)
    rng = np.random.RandomState(7)
    feats = rng.randn(2, 80, 3000).astype(np.float32)

    with torch.no_grad():
        hf_ids = hf_model.generate(
            input_features=torch.tensor(feats), max_new_tokens=12,
            do_sample=False, num_beams=1).numpy()

    ids = np.asarray(whisper_greedy_decode(
        params, jnp.asarray(feats), cfg, max_tokens=13))
    # exact prefix agreement before fp near-ties can accumulate
    np.testing.assert_array_equal(ids[:, :4], hf_ids[:, :4])
    # every generated token is greedy under the HF oracle's own logits
    # (tolerates argmax ties the random tiny model produces)
    with torch.no_grad():
        oracle = hf_model(
            input_features=torch.tensor(feats),
            decoder_input_ids=torch.tensor(ids[:, :-1])).logits.numpy()
    for b in range(ids.shape[0]):
        for t in range(ids.shape[1] - 1):
            tok = ids[b, t + 1]
            if tok == cfg.pad_token_id and cfg.eos_token_id in ids[b, 1:t + 1]:
                break
            assert oracle[b, t, tok] >= oracle[b, t].max() - 1e-2, \
                (b, t, tok, oracle[b, t].max() - oracle[b, t, tok])


def test_audio_wav_roundtrip_and_resample():
    from unsloth_tpu.data.audio import decode_wav, encode_wav, resample

    rng = np.random.RandomState(0)
    audio = (rng.randn(8000) * 0.3).clip(-1, 1).astype(np.float32)
    wav = encode_wav(audio, 16000)
    back, rate = decode_wav(wav)
    assert rate == 16000
    np.testing.assert_allclose(back, audio, atol=1.0 / 32767)
    up = resample(audio, 16000, 32000)
    assert abs(len(up) - 16000) <= 1
    down = resample(up, 32000, 16000)
    np.testing.assert_allclose(down[100:-100], audio[100:-100], atol=0.05)


@pytest.mark.slow
def test_whisper_transcribe_http(whisper_ckpt, tmp_path):
    """Studio /api/whisper/transcribe + OpenAI /v1/audio/transcriptions
    (JSON and multipart WAV) serve the native whisper model."""
    import base64
    import json as jsonlib
    import urllib.request

    from unsloth_tpu.data.audio import encode_wav
    from unsloth_tpu.studio.server import StudioServer

    path, _ = whisper_ckpt
    token = "whisper-test-token"
    srv = StudioServer(workdir=str(tmp_path / "jobs"), token=token)
    httpd = srv.serve(port=18377, background=True)
    url = "http://127.0.0.1:18377"
    rng = np.random.RandomState(1)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)

    def post(path_, data, headers):
        req = urllib.request.Request(url + path_, data=data,
                                     headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, jsonlib.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, jsonlib.loads(e.read())

    jhdr = {"Content-Type": "application/json",
            "Authorization": f"Bearer {token}"}
    try:
        code, out = post("/api/whisper/transcribe", jsonlib.dumps(
            {"model": path, "audio": audio.tolist(),
             "max_tokens": 8}).encode(), jhdr)
        assert code == 200, out
        assert "tokens" in out  # tiny fixture ships no tokenizer files
        assert isinstance(out["tokens"], list)

        # missing audio -> 400; unknown model dir -> 404
        code, _ = post("/api/whisper/transcribe",
                       jsonlib.dumps({"model": path}).encode(), jhdr)
        assert code == 400
        code, _ = post("/api/whisper/transcribe", jsonlib.dumps(
            {"model": "/nonexistent", "audio": [0.0]}).encode(), jhdr)
        assert code == 404

        # OpenAI multipart shape (model already cached on the server)
        wav = encode_wav(audio, 16000)
        boundary = "xBOUNDARYx"
        body = (
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="file"; filename="a.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n").encode() + wav + \
            f"\r\n--{boundary}--\r\n".encode()
        code, out = post("/v1/audio/transcriptions", body, {
            "Content-Type":
                f"multipart/form-data; boundary={boundary}",
            "Authorization": f"Bearer {token}"})
        assert code == 200, out
        assert "tokens" in out

        # JSON base64 WAV on the same endpoint, with resampling
        code, out2 = post("/v1/audio/transcriptions", jsonlib.dumps(
            {"audio_b64": base64.b64encode(
                encode_wav(audio, 16000)).decode()}).encode(), jhdr)
        assert code == 200 and out2["tokens"] == out["tokens"]
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_whisper_trainer_overfits(whisper_ckpt):
    """ASR fine-tuning loop: a tiny whisper overfits one (features,
    transcript) pair (the driver's Whisper bench family, BASELINE.md:35)."""
    import numpy as np

    from unsloth_tpu.models.whisper import load_whisper
    from unsloth_tpu.trainer.sft import SFTConfig
    from unsloth_tpu.trainer.whisper import WhisperTrainer

    path, _ = whisper_ckpt
    params, cfg = load_whisper(path)
    rng = np.random.RandomState(0)
    feats = rng.randn(cfg.num_mel_bins, 20).astype(np.float32)
    labels = [5, 9, 17, 3, 2]
    ds = [{"features": feats, "labels": labels} for _ in range(4)]
    args = SFTConfig(per_device_train_batch_size=4, max_steps=25,
                     learning_rate=3e-3, lr_scheduler_type="constant",
                     warmup_steps=0, max_seq_length=16)
    tr = WhisperTrainer((params, cfg), train_dataset=ds, args=args)
    tr.train()
    losses = [e["loss"] for e in tr.state_log]
    assert losses[-1] < losses[0] * 0.5, losses
