"""BERT-family encoder (functional) — for sentence-transformer models.

Parity target: the reference's sentence-transformer per-arch patches for
BERT-family encoders (reference: models/sentence_transformer.py:621-915
patches mpnet/distilbert/MiniLM module graphs). Here it is one functional
post-LN encoder, parity-tested against transformers BertModel; MiniLM and
most sentence-transformers checkpoints are this architecture.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.rms_norm import layer_norm


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "BertConfig":
        return cls(
            vocab_size=int(hf["vocab_size"]),
            hidden_size=int(hf["hidden_size"]),
            num_layers=int(hf["num_hidden_layers"]),
            num_heads=int(hf["num_attention_heads"]),
            intermediate_size=int(hf["intermediate_size"]),
            max_position_embeddings=int(hf.get("max_position_embeddings",
                                               512)),
            type_vocab_size=int(hf.get("type_vocab_size", 2)),
            layer_norm_eps=float(hf.get("layer_norm_eps", 1e-12)),
            hidden_act=hf.get("hidden_act", "gelu"),
        )


def _lin(p, x):
    return jnp.dot(x, p["kernel"]) + p["bias"]


def bert_forward(params: Dict[str, Any], input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray, cfg: BertConfig,
                 token_type_ids: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """[B, T] -> [B, T, D] (bidirectional, mask-aware)."""
    b, t = input_ids.shape
    eps = cfg.layer_norm_eps
    x = jnp.take(params["word_embed"], input_ids, axis=0)
    x = x + params["pos_embed"][None, :t]
    tt = token_type_ids if token_type_ids is not None else \
        jnp.zeros((b, t), jnp.int32)
    x = x + jnp.take(params["type_embed"], tt, axis=0)
    x = layer_norm(x, params["embed_ln"]["w"], params["embed_ln"]["b"],
                       eps)

    heads = cfg.num_heads
    dh = cfg.hidden_size // heads
    neg = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)

    for layer in params["layers"]:
        q = _lin(layer["q"], x).reshape(b, t, heads, dh)
        k = _lin(layer["k"], x).reshape(b, t, heads, dh)
        v = _lin(layer["v"], x).reshape(b, t, heads, dh)
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) \
            * (dh ** -0.5) + neg
        probs = jax.nn.softmax(scores, -1).astype(x.dtype)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, -1)
        attn = _lin(layer["attn_out"], attn)
        x = layer_norm(x + attn, layer["attn_ln"]["w"],
                           layer["attn_ln"]["b"], eps)
        h = _lin(layer["fc1"], x)
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        h = _lin(layer["fc2"], h)
        x = layer_norm(x + h, layer["out_ln"]["w"],
                           layer["out_ln"]["b"], eps)
    return x


def load_bert(path: str, dtype=jnp.float32):
    from .config import load_hf_config
    from .hf_loader import CheckpointReader, _to_jnp

    hf = load_hf_config(path)
    cfg = BertConfig.from_hf(hf)
    reader = CheckpointReader(path)
    names = set(reader.names())
    prefix = "bert." if "bert.embeddings.word_embeddings.weight" in names \
        else ""

    def get(name):
        return _to_jnp(reader.get(prefix + name), dtype)

    def lin(stem):
        return {"kernel": get(stem + ".weight").T,
                "bias": get(stem + ".bias")}

    def ln(stem):
        return {"w": get(stem + ".weight"), "b": get(stem + ".bias")}

    params = {
        "word_embed": get("embeddings.word_embeddings.weight"),
        "pos_embed": get("embeddings.position_embeddings.weight"),
        "type_embed": get("embeddings.token_type_embeddings.weight"),
        "embed_ln": ln("embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        params["layers"].append({
            "q": lin(p + "attention.self.query"),
            "k": lin(p + "attention.self.key"),
            "v": lin(p + "attention.self.value"),
            "attn_out": lin(p + "attention.output.dense"),
            "attn_ln": ln(p + "attention.output.LayerNorm"),
            "fc1": lin(p + "intermediate.dense"),
            "fc2": lin(p + "output.dense"),
            "out_ln": ln(p + "output.LayerNorm"),
        })
    reader.close()
    return params, cfg


@dataclasses.dataclass
class BertEncoderModel:
    """Minimal handle for sentence-transformer use."""

    params: Dict[str, Any]
    cfg: BertConfig
    tokenizer: Any = None

    def encode_hidden(self, input_ids, attention_mask):
        return bert_forward(self.params, input_ids, attention_mask,
                            self.cfg)
