"""Sesame CSM (conversational speech model) — TTS fine-tuning.

Parity target: HF CsmForConditionalGeneration (sesame/csm-1b — the
reference catalogs it in mapper.py's audio group and fine-tunes it as a
TTS notebook config). Architecture:

  * BACKBONE: llama-style decoder whose inputs mix text-token embeddings
    and audio FRAMES (a frame embeds as the SUM of its `num_codebooks`
    RVQ codebook embeddings, each codebook reading an offset slice of one
    big [num_codebooks * vocab, D] table); lm_head predicts the NEXT
    frame's codebook 0.
  * DEPTH DECODER: a small llama over the 32 codebook positions of ONE
    frame: position 0 carries the backbone's previous hidden state, then
    each position j >= 1 embeds codebook j-1's token (same shared audio
    table), everything projected into the depth width; per-position
    [hidden, vocab] heads predict codebooks 1..31.

TPU design: both stacks reuse `models.decoder.forward` (inputs_embeds
path); the codec (Mimi) stays external — training consumes precomputed
audio codes, the same contract as the Orpheus SNAC pipeline in
`data/tts.py`. Loss = backbone CE + depth CE (HF
CsmForConditionalGeneration.forward composition).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .decoder import forward as decoder_forward


def _llama_cfg(hf: Dict[str, Any], name: str) -> ModelConfig:
    sub = dict(hf)
    sub.setdefault("model_type", "llama")
    sub["model_type"] = "llama"
    sub["tie_word_embeddings"] = False
    return ModelConfig.from_hf_config(sub, name=name)


@dataclasses.dataclass
class CsmModel:
    cfg: ModelConfig          # backbone (llama-shaped)
    depth_cfg: ModelConfig
    params: Dict[str, Any]
    num_codebooks: int
    codebook_vocab: int       # per-codebook vocab (2051)
    audio_token_id: int
    tokenizer: Any = None
    hf_config: Optional[Dict[str, Any]] = None

    def embed_frames(self, audio_codes: jnp.ndarray) -> jnp.ndarray:
        """[N, num_codebooks] codes -> [N, D] summed codebook embeds (HF
        CsmBackboneModelEmbeddings)."""
        offs = (jnp.arange(self.num_codebooks, dtype=audio_codes.dtype)
                * self.codebook_vocab)
        e = jnp.take(self.params["audio_embed"], audio_codes + offs[None],
                     axis=0)
        return jnp.sum(e, axis=-2)

    def embed_mixed(self, input_ids: jnp.ndarray,
                    audio_codes: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Text embeddings with audio frames spliced at audio_token_id
        positions (order of appearance)."""
        x = jnp.take(self.params["text_embed"], input_ids, axis=0)
        if audio_codes is None:
            return x
        frames = self.embed_frames(audio_codes).astype(x.dtype)
        is_audio = input_ids == self.audio_token_id
        order = jnp.cumsum(is_audio.reshape(-1).astype(jnp.int32)) - 1
        order = jnp.clip(order, 0, frames.shape[0] - 1)
        g = jnp.take(frames, order, axis=0).reshape(*input_ids.shape, -1)
        return jnp.where(is_audio[..., None], g, x)

    def backbone_hidden(self, inputs_embeds, **kw) -> jnp.ndarray:
        b, t, _ = inputs_embeds.shape
        ids = jnp.zeros((b, t), jnp.int32)  # unused (embeds path)
        return decoder_forward(self.params["backbone"], None, ids,
                               self.cfg, inputs_embeds=inputs_embeds,
                               **kw)

    def depth_logits(self, first_hidden: jnp.ndarray,
                     codebook_ids: jnp.ndarray) -> jnp.ndarray:
        """first_hidden [N, D_backbone] (backbone state preceding the
        frame); codebook_ids [N, num_codebooks-1] (codebooks 0..30).
        Returns [N, num_codebooks-1, vocab]: position j predicts
        codebook j+1 (HF CsmDepthDecoder + CsmCodebooksHead)."""
        n, k = codebook_ids.shape
        offs = (jnp.arange(k, dtype=codebook_ids.dtype)
                * self.codebook_vocab)
        tok = jnp.take(self.params["audio_embed"],
                       codebook_ids + offs[None], axis=0)  # [N, k, D_bb]
        seq = jnp.concatenate([first_hidden[:, None], tok], axis=1)
        seq = seq @ self.params["depth_proj"].T.astype(seq.dtype)
        h = decoder_forward(self.params["depth"], None,
                            jnp.zeros((n, k + 1), jnp.int32),
                            self.depth_cfg, inputs_embeds=seq,
                            remat=False)
        h = h[:, 1:]                                      # [N, k, D_d]
        return jnp.einsum("nkd,kdv->nkv",
                          h.astype(jnp.float32),
                          self.params["codebooks_head"]
                          .astype(jnp.float32))

    def loss_fn(self, params_override, batch, **kw):
        """batch: input_ids [B, T] (audio_token_id at frame positions),
        audio_codes [N_frames, num_codebooks], labels [B, T,
        num_codebooks] (-100 = ignore; codebook 0 trains the backbone,
        the rest the depth decoder), frame_positions [N, 2] (b, t) of
        each trainable frame (static host-side layout)."""
        if params_override is not None:
            self = dataclasses.replace(self, params=params_override)
        labels = batch["labels"]
        embeds = self.embed_mixed(batch["input_ids"],
                                  batch.get("audio_codes"))
        h = self.backbone_hidden(embeds, **kw)

        logits0 = h @ self.params["lm_head"].T.astype(h.dtype)
        shift_logits = logits0[:, :-1].astype(jnp.float32)
        shift_labels = labels[:, 1:, 0]
        mask = shift_labels != -100
        lse = jax.nn.logsumexp(shift_logits, axis=-1)
        tgt = jnp.take_along_axis(
            shift_logits, jnp.clip(shift_labels, 0)[..., None],
            axis=-1)[..., 0]
        bb_loss = jnp.sum(jnp.where(mask, lse - tgt, 0.0)) \
            / jnp.maximum(jnp.sum(mask), 1)

        fp = batch["frame_positions"]                     # [N, 2]
        first_hidden = h[fp[:, 0], fp[:, 1] - 1]
        frame_labels = labels[fp[:, 0], fp[:, 1]]         # [N, K]
        depth_in = jnp.clip(frame_labels[:, :-1], 0)
        dl = self.depth_logits(first_hidden, depth_in)    # [N, K-1, V]
        dlabels = frame_labels[:, 1:]
        dmask = dlabels != -100
        lse_d = jax.nn.logsumexp(dl, axis=-1)
        tgt_d = jnp.take_along_axis(
            dl, jnp.clip(dlabels, 0)[..., None], axis=-1)[..., 0]
        depth_loss = jnp.sum(jnp.where(dmask, lse_d - tgt_d, 0.0)) \
            / jnp.maximum(jnp.sum(dmask), 1)
        return bb_loss + depth_loss


def csm_generate(model: CsmModel, input_ids, max_frames: int = 64,
                 temperature: float = 0.0, key=None,
                 codebook_eos: Optional[int] = None) -> np.ndarray:
    """Greedy/temperature TTS decode: per frame, the backbone samples
    codebook 0, the depth decoder rolls out codebooks 1..K-1, and the
    frame's summed embedding feeds back (HF CsmForConditionalGeneration
    .generate semantics). Static shapes: the backbone runs over the full
    padded window each frame (one compile); correctness-first — the
    KV-cache decode integration is the optimization path.
    Returns [n_frames, num_codebooks] codes (stops at codebook-0 EOS)."""
    k_total = model.num_codebooks
    b, t0 = input_ids.shape
    assert b == 1, "csm_generate is single-sequence"
    tmax = t0 + max_frames
    d = model.params["text_embed"].shape[1]
    embeds = jnp.zeros((1, tmax, d), model.params["text_embed"].dtype)
    embeds = embeds.at[:, :t0].set(
        jnp.take(model.params["text_embed"], input_ids, axis=0))

    @jax.jit
    def bb_hidden(embeds):
        return model.backbone_hidden(embeds, remat=False)

    @jax.jit
    def bb_logits(h, pos):
        return h[0, pos] @ model.params["lm_head"].T.astype(h.dtype)

    @jax.jit
    def depth_step(first_hidden, codes_so_far):
        # codes_so_far [1, K-1] (zero-padded); logits for every position
        return model.depth_logits(first_hidden, codes_so_far)

    def sample(logits, key):
        if temperature and key is not None:
            return int(jax.random.categorical(key, logits / temperature))
        return int(jnp.argmax(logits))

    frames = []
    for f in range(max_frames):
        h = bb_hidden(embeds)
        logits0 = bb_logits(h, t0 + f - 1)
        if key is not None:
            key, k0 = jax.random.split(key)
        else:
            k0 = None
        c0 = sample(logits0, k0)
        if codebook_eos is not None and c0 == codebook_eos:
            break
        codes = [c0]
        first_hidden = h[:, t0 + f - 1]
        buf = np.zeros((1, k_total - 1), np.int32)
        for j in range(1, k_total):
            buf[0, j - 1] = codes[-1]
            dl = depth_step(first_hidden, jnp.asarray(buf))
            if key is not None:
                key, kj = jax.random.split(key)
            else:
                kj = None
            codes.append(sample(dl[0, j - 1], kj))
        frame = np.asarray(codes, np.int32)
        frames.append(frame)
        fe = model.embed_frames(jnp.asarray(frame)[None])[0]
        embeds = embeds.at[0, t0 + f].set(fe.astype(embeds.dtype))
    return np.stack(frames) if frames else np.zeros((0, k_total),
                                                    np.int32)


def load_csm(path: str, dtype=jnp.float32) -> CsmModel:
    """Load an HF CsmForConditionalGeneration checkpoint."""
    from .config import load_hf_config
    from .hf_loader import CheckpointReader, _to_jnp
    from . import hf_names

    hf = load_hf_config(path)
    assert hf.get("model_type") == "csm", "not a csm checkpoint"
    cfg = _llama_cfg(hf, "csm-backbone")
    depth_hf = dict(hf.get("depth_decoder_config") or {})
    depth_cfg = _llama_cfg(depth_hf, "csm-depth")
    reader = CheckpointReader(path)

    def get(name):
        return _to_jnp(reader.get(name), dtype)

    def load_stack(prefix, stack_cfg):
        p = {"layers": [], "final_norm": get(prefix + "norm.weight"),
             # dummy embed: the embeds path never reads it
             "embed": jnp.zeros((1, stack_cfg.hidden_size), dtype)}
        for i in range(stack_cfg.num_layers):
            layer = {}
            for ours, name in hf_names.layer_name_map(stack_cfg,
                                                      i).items():
                full = name.replace("model.", prefix, 1)
                if full in reader:
                    layer[ours] = get(full)
            p["layers"].append(layer)
        return p

    params = {
        "backbone": load_stack("backbone_model.", cfg),
        "depth": load_stack("depth_decoder.model.", depth_cfg),
        "text_embed": get("embed_text_tokens.weight"),
        # tied with the depth decoder's embed_tokens; checkpoints store
        # one physical copy under either name
        "audio_embed": get(
            "backbone_model.embed_tokens.embed_audio_tokens.weight"
            if "backbone_model.embed_tokens.embed_audio_tokens.weight"
            in reader else "depth_decoder.model.embed_tokens.weight"),
        "lm_head": get("lm_head.weight"),
        "depth_proj": get(
            "depth_decoder.model.inputs_embeds_projector.weight"),
        "codebooks_head": get("depth_decoder.codebooks_head.weight"),
    }
    reader.close()
    return CsmModel(
        cfg=cfg, depth_cfg=depth_cfg, params=params,
        num_codebooks=int(hf.get("num_codebooks", 32)),
        codebook_vocab=int(hf.get("vocab_size", 2051)),
        audio_token_id=int(hf.get("audio_token_id", 128002)),
        hf_config=hf)
