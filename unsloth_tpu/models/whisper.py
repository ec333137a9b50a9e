"""Whisper ASR: log-mel frontend + encoder-decoder (functional).

Parity target: the reference fine-tunes Whisper through FastModel with HF
processors (reference: models/vision.py:963-972 selects WhisperProcessor;
studio trainer audio preprocessing trainer.py:1359-2204). The log-mel
frontend — whisper.cpp territory in the reference (SURVEY §2k item 4) —
is a jnp transform here (XLA FFT), so feature extraction runs on-device.

Whisper layers are pre-LN transformer blocks with learned positions,
GELU MLPs, and cross-attention in the decoder. Parity is tested against
transformers' WhisperForConditionalGeneration.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rms_norm import layer_norm


# ---------------------------------------------------------------------------
# Audio frontend (whisper log-mel, 16 kHz)
# ---------------------------------------------------------------------------

def hann_window(n: int) -> jnp.ndarray:
    # periodic Hann (torch.hann_window default), fp32
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def mel_filterbank(n_mels: int = 80, n_fft: int = 400,
                   sample_rate: int = 16000) -> np.ndarray:
    """Slaney-style mel filterbank matching librosa/whisper (htk=False)."""
    fmax = sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / np.log(6.4) * 27.0, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0
                                                 * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    fft_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    weights = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lower = (fft_freqs - freqs[i]) / (freqs[i + 1] - freqs[i])
        upper = (freqs[i + 2] - fft_freqs) / (freqs[i + 2] - freqs[i + 1])
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs[2:n_mels + 2] - freqs[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80,
                        n_fft: int = 400, hop: int = 160,
                        pad_to_frames: Optional[int] = 3000) -> jnp.ndarray:
    """waveform [T] or [B, T] (16 kHz) -> log-mel [B, n_mels, frames].
    Matches openai/whisper + transformers WhisperFeatureExtractor."""
    if audio.ndim == 1:
        audio = audio[None]
    b, t = audio.shape
    if pad_to_frames is not None:
        target = pad_to_frames * hop
        audio = audio[:, :target]
        audio = jnp.pad(audio, ((0, 0), (0, target - audio.shape[1])))
    # reflect-pad n_fft//2 each side (torch.stft center=True)
    pad = n_fft // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (audio.shape[1] - n_fft) // hop + 1
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])                    # [F, n_fft]
    frames = audio[:, idx]                                  # [B, F, n_fft]
    frames = frames * hann_window(n_fft)[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.abs(spec) ** 2                              # [B, F, bins]
    power = power[:, :-1, :]  # whisper drops the last frame
    mel = jnp.einsum("bfk,mk->bmf", power, jnp.asarray(mel_filterbank(
        n_mels, n_fft)))
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(1, 2),
                                   keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51866
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_heads: int = 20
    decoder_layers: int = 32
    decoder_heads: int = 20
    ffn_dim: int = 5120
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    eps: float = 1e-5
    decoder_start_token_id: int = 50258
    pad_token_id: int = 50257
    eos_token_id: int = 50257

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "WhisperConfig":
        return cls(
            vocab_size=int(hf["vocab_size"]),
            d_model=int(hf["d_model"]),
            encoder_layers=int(hf["encoder_layers"]),
            encoder_heads=int(hf["encoder_attention_heads"]),
            decoder_layers=int(hf["decoder_layers"]),
            decoder_heads=int(hf["decoder_attention_heads"]),
            ffn_dim=int(hf.get("encoder_ffn_dim", 4 * hf["d_model"])),
            num_mel_bins=int(hf.get("num_mel_bins", 80)),
            max_source_positions=int(hf.get("max_source_positions", 1500)),
            max_target_positions=int(hf.get("max_target_positions", 448)),
            decoder_start_token_id=int(
                hf.get("decoder_start_token_id", 50258)),
            pad_token_id=int(hf.get("pad_token_id", 50257)),
            eos_token_id=int(hf.get("eos_token_id", 50257)),
        )


def _lin(p, x, lora=None):
    y = jnp.dot(x, p["kernel"])
    if p.get("bias") is not None:
        y = y + p["bias"]
    if lora is not None:
        y = y + jnp.dot(jnp.dot(x, lora.a.T.astype(x.dtype)),
                        lora.b.T.astype(x.dtype)) * lora.scale
    return y


def _mha(x, kv, layer, heads, causal, lora=None):
    lora = lora or {}
    b, t, d = x.shape
    s = kv.shape[1]
    dh = d // heads
    q = _lin(layer["q"], x, lora.get("q")).reshape(b, t, heads, dh)
    k = _lin(layer["k"], kv, lora.get("k")).reshape(b, s, heads, dh)
    v = _lin(layer["v"], kv, lora.get("v")).reshape(b, s, heads, dh)
    scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) \
        * (dh ** -0.5)
    if causal:
        mask = jnp.tril(jnp.ones((t, s), bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, -1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, d)
    return _lin(layer["out"], out, lora.get("out"))


def _conv1d(x, kernel, bias, stride):
    """x [B, C_in, T]; kernel [C_out, C_in, K] (HF layout), pad=1."""
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out + bias[None, :, None]


def whisper_encode(params, features: jnp.ndarray, cfg: WhisperConfig,
                   lora=None) -> jnp.ndarray:
    """log-mel features [B, n_mels, frames] -> [B, frames//2, d]."""
    enc = params["encoder"]
    enc_lora = (lora or {}).get("encoder", {})
    x = jax.nn.gelu(_conv1d(features, enc["conv1"]["kernel"],
                            enc["conv1"]["bias"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"]["kernel"],
                            enc["conv2"]["bias"], 2), approximate=False)
    x = x.transpose(0, 2, 1)                     # [B, T, d]
    x = x + enc["pos_embed"][None, :x.shape[1]]
    layer_loras = enc_lora.get("layers", [{}] * len(enc["layers"]))
    for layer, ll in zip(enc["layers"], layer_loras):
        h = layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"], cfg.eps)
        x = x + _mha(h, h, layer["self_attn"], cfg.encoder_heads, False,
                     lora=ll.get("self_attn"))
        h = layer_norm(x, layer["ln2"]["w"], layer["ln2"]["b"], cfg.eps)
        h = jax.nn.gelu(_lin(layer["fc1"], h), approximate=False)
        x = x + _lin(layer["fc2"], h)
    return layer_norm(x, enc["ln_post"]["w"], enc["ln_post"]["b"],
                          cfg.eps)


def whisper_decode(params, token_ids: jnp.ndarray, encoder_out: jnp.ndarray,
                   cfg: WhisperConfig, lora=None) -> jnp.ndarray:
    """token_ids [B, T] + encoder states -> logits [B, T, V]."""
    dec = params["decoder"]
    dec_lora = (lora or {}).get("decoder", {})
    b, t = token_ids.shape
    x = jnp.take(dec["embed"], token_ids, axis=0)
    x = x + dec["pos_embed"][None, :t]
    layer_loras = dec_lora.get("layers", [{}] * len(dec["layers"]))
    for layer, ll in zip(dec["layers"], layer_loras):
        h = layer_norm(x, layer["ln1"]["w"], layer["ln1"]["b"], cfg.eps)
        x = x + _mha(h, h, layer["self_attn"], cfg.decoder_heads, True,
                     lora=ll.get("self_attn"))
        h = layer_norm(x, layer["ln_x"]["w"], layer["ln_x"]["b"],
                           cfg.eps)
        x = x + _mha(h, encoder_out, layer["cross_attn"],
                     cfg.decoder_heads, False, lora=ll.get("cross_attn"))
        h = layer_norm(x, layer["ln2"]["w"], layer["ln2"]["b"], cfg.eps)
        h = jax.nn.gelu(_lin(layer["fc1"], h), approximate=False)
        x = x + _lin(layer["fc2"], h)
    x = layer_norm(x, dec["ln_post"]["w"], dec["ln_post"]["b"], cfg.eps)
    return jnp.dot(x, dec["embed"].T)


def whisper_loss(params, features, token_ids, labels, cfg: WhisperConfig,
                 lora=None):
    """Seq2seq CE (labels -100 = ignore; caller shifts as HF does)."""
    from ..ops.cross_entropy import fast_cross_entropy_loss

    enc = whisper_encode(params, features, cfg, lora=lora)
    logits = whisper_decode(params, token_ids, enc, cfg, lora=lora)
    return fast_cross_entropy_loss(logits, labels)


def init_whisper_lora(cfg: WhisperConfig, key, r: int = 32,
                      alpha: int = 64, targets=("q", "v"),
                      dtype=jnp.float32):
    """LoRA adapter pytree mirroring the whisper param tree (peft
    convention: A ~ N(0, 1/r), B = 0; scale = alpha / r). Targets name
    the attention projections to adapt (q/k/v/out), applied to encoder
    self-attention and decoder self+cross attention — the reference's
    Whisper notebook targets q_proj/v_proj via get_peft_model."""
    from ..ops.lora import LoRAWeights

    d = cfg.d_model
    scale = alpha / r

    def adapter(key):
        a = jax.random.normal(key, (r, d), dtype) * (1.0 / r)
        return LoRAWeights(a=a, b=jnp.zeros((d, r), dtype), scale=scale)

    def attn_block(key):
        keys = jax.random.split(key, len(targets))
        return {t: adapter(k) for t, k in zip(targets, keys)}

    n_enc, n_dec = cfg.encoder_layers, cfg.decoder_layers
    keys = jax.random.split(key, n_enc + 2 * n_dec)
    enc_layers = [{"self_attn": attn_block(keys[i])} for i in range(n_enc)]
    dec_layers = [{"self_attn": attn_block(keys[n_enc + 2 * i]),
                   "cross_attn": attn_block(keys[n_enc + 2 * i + 1])}
                  for i in range(n_dec)]
    return {"encoder": {"layers": enc_layers},
            "decoder": {"layers": dec_layers}}


def whisper_greedy_decode(params, features: jnp.ndarray,
                          cfg: WhisperConfig, *,
                          max_tokens: Optional[int] = None,
                          prompt_ids: Optional[Sequence[int]] = None,
                          lora=None) -> jnp.ndarray:
    """Greedy transcription ids [B, max_tokens] from log-mel features.

    TPU-native decode: the whole loop is one jittable `lax.while_loop`
    over a fixed-size id buffer (static shapes; position `pos-1`'s
    logits only attend causally to written slots, so the pad tail is
    inert). The reference serves STT through whisper.cpp sidecars
    (reference: studio/backend/core/inference/stt_sidecar.py); here the
    same chip that trains also transcribes. Finished rows are padded
    with pad_token_id after their first eos.
    """
    if prompt_ids is None or len(prompt_ids) == 0:
        prompt_ids = [cfg.decoder_start_token_id]
    max_tokens = int(max_tokens or cfg.max_target_positions)
    max_tokens = max(max_tokens, len(prompt_ids) + 1)
    enc = whisper_encode(params, features, cfg, lora=lora)
    b = features.shape[0]
    prompt = jnp.asarray(prompt_ids, jnp.int32)
    ids0 = jnp.full((b, max_tokens), cfg.pad_token_id, jnp.int32)
    ids0 = ids0.at[:, : prompt.shape[0]].set(prompt[None])

    def cond(carry):
        _, pos, done = carry
        return (pos < max_tokens) & ~jnp.all(done)

    def body(carry):
        ids, pos, done = carry
        logits = whisper_decode(params, ids, enc, cfg, lora=lora)
        nxt = jnp.argmax(logits[jnp.arange(b), pos - 1], -1)
        nxt = jnp.where(done, cfg.pad_token_id, nxt.astype(jnp.int32))
        ids = ids.at[:, pos].set(nxt)
        done = done | (nxt == cfg.eos_token_id)
        return ids, pos + 1, done

    ids, _, _ = jax.lax.while_loop(
        cond, body,
        (ids0, jnp.int32(prompt.shape[0]), jnp.zeros((b,), bool)))
    return ids


def whisper_transcribe(params, cfg: WhisperConfig, audio, *,
                       tokenizer=None, max_tokens: Optional[int] = None,
                       prompt_ids: Optional[Sequence[int]] = None,
                       lora=None):
    """Waveform (16 kHz float [T] or [B, T]) -> transcript text (with a
    tokenizer) or token-id lists (without). Trailing pad/eos/prompt
    tokens are stripped from the returned ids."""
    audio = jnp.asarray(audio, jnp.float32)
    if audio.ndim == 1:
        audio = audio[None]
    feats = log_mel_spectrogram(audio, n_mels=cfg.num_mel_bins)
    ids = whisper_greedy_decode(params, feats, cfg,
                                max_tokens=max_tokens,
                                prompt_ids=prompt_ids, lora=lora)
    n_prompt = len(prompt_ids) if prompt_ids else 1
    out = []
    for row in np.asarray(ids):
        toks = [int(t) for t in row[n_prompt:]]
        if cfg.eos_token_id in toks:
            toks = toks[: toks.index(cfg.eos_token_id)]
        toks = [t for t in toks if t != cfg.pad_token_id]
        out.append(toks)
    if tokenizer is None:
        return out
    return [tokenizer.decode(t, skip_special_tokens=True) for t in out]


# ---------------------------------------------------------------------------
# HF checkpoint loading
# ---------------------------------------------------------------------------

def load_whisper(path: str, dtype=jnp.float32):
    from .config import load_hf_config
    from .hf_loader import CheckpointReader, _to_jnp

    hf = load_hf_config(path)
    cfg = WhisperConfig.from_hf(hf)
    reader = CheckpointReader(path)
    names = set(reader.names())
    prefix = "model." if "model.encoder.conv1.weight" in names else ""

    def get(name):
        return _to_jnp(reader.get(prefix + name), dtype)

    def lin(stem, bias=True):
        return {"kernel": get(stem + ".weight").T,
                "bias": get(stem + ".bias") if bias else None}

    def attn(stem, cross=False):
        return {
            "q": lin(stem + ".q_proj"),
            "k": lin(stem + ".k_proj", bias=(prefix + stem + ".k_proj.bias")
                     in names),
            "v": lin(stem + ".v_proj"),
            "out": lin(stem + ".out_proj"),
        }

    def ln(stem):
        return {"w": get(stem + ".weight"), "b": get(stem + ".bias")}

    encoder = {
        "conv1": {"kernel": get("encoder.conv1.weight"),
                  "bias": get("encoder.conv1.bias")},
        "conv2": {"kernel": get("encoder.conv2.weight"),
                  "bias": get("encoder.conv2.bias")},
        "pos_embed": get("encoder.embed_positions.weight"),
        "ln_post": ln("encoder.layer_norm"),
        "layers": [],
    }
    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        encoder["layers"].append({
            "ln1": ln(p + ".self_attn_layer_norm"),
            "ln2": ln(p + ".final_layer_norm"),
            "self_attn": attn(p + ".self_attn"),
            "fc1": lin(p + ".fc1"),
            "fc2": lin(p + ".fc2"),
        })

    decoder = {
        "embed": get("decoder.embed_tokens.weight"),
        "pos_embed": get("decoder.embed_positions.weight"),
        "ln_post": ln("decoder.layer_norm"),
        "layers": [],
    }
    for i in range(cfg.decoder_layers):
        p = f"decoder.layers.{i}"
        decoder["layers"].append({
            "ln1": ln(p + ".self_attn_layer_norm"),
            "ln_x": ln(p + ".encoder_attn_layer_norm"),
            "ln2": ln(p + ".final_layer_norm"),
            "self_attn": attn(p + ".self_attn"),
            "cross_attn": attn(p + ".encoder_attn"),
            "fc1": lin(p + ".fc1"),
            "fc2": lin(p + ".fc2"),
        })
    reader.close()
    return {"encoder": encoder, "decoder": decoder}, cfg
