"""FastSentenceTransformer — embedding-model fine-tuning.

Parity target: reference models/sentence_transformer.py (wraps the
sentence-transformers module graph: from_pretrained :1452, get_peft_model
:2005, trainer patch :2226; "1.8-3.3x faster embedding fine-tuning",
README.md:219).

TPU-native: an embedding model is our decoder archetype run (optionally)
with bidirectional attention + a pooling head. Covers decoder-based
embedders (embeddinggemma = gemma3 text + mean pooling) directly from
their HF checkpoints; the contrastive losses (MultipleNegativesRanking,
cosine-similarity MSE) are jnp functions over pooled embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .decoder import forward as decoder_forward
from .loader import FastLanguageModel, LanguageModel


def mean_pool(hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, T, D], [B, T] -> [B, D] mean over real tokens."""
    m = mask.astype(hidden.dtype)[..., None]
    return jnp.sum(hidden * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0)


def cls_pool(hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return hidden[:, 0]


def last_token_pool(hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    idx = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
    return jnp.take_along_axis(
        hidden, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]


POOLERS = {"mean": mean_pool, "cls": cls_pool, "last": last_token_pool}


def multiple_negatives_ranking_loss(anchors: jnp.ndarray,
                                    positives: jnp.ndarray,
                                    scale: float = 20.0,
                                    negatives: Optional[jnp.ndarray] = None
                                    ) -> jnp.ndarray:
    """In-batch negatives contrastive loss (sentence-transformers MNRL).

    negatives [B, D] (optional): explicit hard negatives appended to the
    candidate set, matching sentence-transformers' (anchor, positive,
    negative) triple column format (reference ST trainer integration:
    models/sentence_transformer.py:2226)."""
    a = anchors / jnp.linalg.norm(anchors, axis=-1, keepdims=True)
    p = positives / jnp.linalg.norm(positives, axis=-1, keepdims=True)
    cands = p
    if negatives is not None:
        n = negatives / jnp.linalg.norm(negatives, axis=-1, keepdims=True)
        cands = jnp.concatenate([p, n], axis=0)   # [2B, D]
    logits = a @ cands.T * scale                  # [B, B(+B)]
    labels = jnp.arange(a.shape[0])
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))


def triplet_loss(anchors, positives, negatives,
                 margin: float = 5.0) -> jnp.ndarray:
    """sentence-transformers TripletLoss (euclidean margin)."""
    d_pos = jnp.linalg.norm(anchors - positives, axis=-1)
    d_neg = jnp.linalg.norm(anchors - negatives, axis=-1)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def cosine_similarity_loss(emb1, emb2, target_scores) -> jnp.ndarray:
    a = emb1 / jnp.linalg.norm(emb1, axis=-1, keepdims=True)
    b = emb2 / jnp.linalg.norm(emb2, axis=-1, keepdims=True)
    cos = jnp.sum(a * b, axis=-1)
    return jnp.mean((cos - target_scores) ** 2)


@dataclasses.dataclass
class SentenceTransformerModel:
    lm: LanguageModel
    pooling: str = "mean"
    normalize: bool = True
    bidirectional: bool = True    # embeddinggemma-style
    max_seq_length: int = 512

    @property
    def tokenizer(self):
        return self.lm.tokenizer

    def _encode_ids(self, lora, input_ids, mask):
        h = decoder_forward(
            self.lm.params, lora, input_ids, self.lm.cfg,
            segment_ids=mask.astype(jnp.int32),
            remat=False,
            # bidirectional: mark everything one big "image span" so the
            # causal mask opens up within real tokens
            image_spans=mask.astype(jnp.int32) if self.bidirectional
            else None)
        emb = POOLERS[self.pooling](h, mask)
        if self.normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        return emb

    def encode(self, texts: Sequence[str], batch_size: int = 32
               ) -> np.ndarray:
        """sentence-transformers-compatible encode()."""
        tok = self.tokenizer
        out = []
        for i in range(0, len(texts), batch_size):
            ids, mask = self._tokenize(texts[i:i + batch_size])
            out.append(np.asarray(self._encode_ids(
                self.lm.lora, jnp.asarray(ids), jnp.asarray(mask))))
        return np.concatenate(out)

    def _tokenize(self, texts):
        tok = self.tokenizer
        encs = [tok(t)["input_ids"][: self.max_seq_length] for t in texts]
        t_max = max(8, max(len(e) for e in encs))
        t_max = ((t_max + 7) // 8) * 8
        ids = np.zeros((len(encs), t_max), np.int32)
        mask = np.zeros((len(encs), t_max), np.int32)
        for i, e in enumerate(encs):
            ids[i, :len(e)] = e
            mask[i, :len(e)] = 1
        return ids, mask

    def similarity(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return a @ b.T

    def save_pretrained(self, path: str):
        """Merged weights + the sentence-transformers module graph
        (modules.json / 1_Pooling / sentence_bert_config.json), so the
        artifact loads back with the same pooling/normalize settings
        (reference embedder save: sentence_transformer.py:62-285)."""
        from ..export.save import save_pretrained_merged

        save_pretrained_merged(self.lm, path, tokenizer=self.tokenizer)
        write_st_module_graph(self, path)
        return path

    def save_pretrained_gguf(self, path: str,
                             quantization_method: str = "q8_0"):
        """Embedder GGUF export (reference: embedder GGUF save,
        sentence_transformer.py:62-285). The decoder tower exports like
        any causal LM; the module graph rides alongside for loaders that
        understand pooling."""
        from ..export.gguf import save_pretrained_gguf as _gguf

        out = _gguf(self.lm, path,
                    quantization_method=quantization_method)
        write_st_module_graph(self, path)
        return out


def read_st_module_graph(path: str) -> Dict[str, Any]:
    """Parse a sentence-transformers checkpoint's module graph
    (modules.json -> Transformer / Pooling / Normalize modules + their
    configs). This is the structure the reference WRAPS at
    models/sentence_transformer.py:62-285; here it resolves to plain
    settings: {pooling, normalize, max_seq_length}."""
    import json
    import os

    out: Dict[str, Any] = {}
    mpath = os.path.join(path, "modules.json")
    if not os.path.exists(mpath):
        return out
    with open(mpath, encoding="utf-8") as f:
        modules = json.load(f)
    out["normalize"] = False
    for mod in modules:
        t = mod.get("type", "")
        sub = os.path.join(path, mod.get("path", ""))
        if t.endswith("Transformer"):
            sb = os.path.join(sub, "sentence_bert_config.json")
            if os.path.exists(sb):
                with open(sb, encoding="utf-8") as f:
                    out["max_seq_length"] = json.load(f).get(
                        "max_seq_length")
        elif t.endswith("Pooling"):
            pc = os.path.join(sub, "config.json")
            if os.path.exists(pc):
                with open(pc, encoding="utf-8") as f:
                    p = json.load(f)
                if p.get("pooling_mode_cls_token"):
                    out["pooling"] = "cls"
                elif p.get("pooling_mode_lasttoken"):
                    out["pooling"] = "last"
                else:
                    out["pooling"] = "mean"
        elif t.endswith("Normalize"):
            out["normalize"] = True
    return out


def write_st_module_graph(model: "SentenceTransformerModel", path: str):
    """Write the sentence-transformers module-graph files so the saved
    checkpoint round-trips through read_st_module_graph (and loads in the
    sentence-transformers library)."""
    import json
    import os

    modules = [{"idx": 0, "name": "0", "path": "",
                "type": "sentence_transformers.models.Transformer"},
               {"idx": 1, "name": "1", "path": "1_Pooling",
                "type": "sentence_transformers.models.Pooling"}]
    if model.normalize:
        modules.append({"idx": 2, "name": "2", "path": "2_Normalize",
                        "type": "sentence_transformers.models.Normalize"})
    with open(os.path.join(path, "modules.json"), "w") as f:
        json.dump(modules, f, indent=2)
    with open(os.path.join(path, "sentence_bert_config.json"), "w") as f:
        json.dump({"max_seq_length": model.max_seq_length,
                   "do_lower_case": False}, f)
    pdir = os.path.join(path, "1_Pooling")
    os.makedirs(pdir, exist_ok=True)
    dim = getattr(model.lm.cfg, "hidden_size", None)
    with open(os.path.join(pdir, "config.json"), "w") as f:
        json.dump({
            "word_embedding_dimension": dim,
            "pooling_mode_cls_token": model.pooling == "cls",
            "pooling_mode_mean_tokens": model.pooling == "mean",
            "pooling_mode_max_tokens": False,
            "pooling_mode_mean_sqrt_len_tokens": False,
            "pooling_mode_lasttoken": model.pooling == "last",
        }, f, indent=2)
    if model.normalize:
        os.makedirs(os.path.join(path, "2_Normalize"), exist_ok=True)


class FastSentenceTransformer:
    """Reference-compatible entry (reference:
    sentence_transformer.py:1452). Resolves the checkpoint's ST module
    graph (pooling mode, normalize, max_seq_length) when present; routes
    BERT-family encoder checkpoints through the functional BERT encoder
    (models/bert.py) and decoder checkpoints through the decoder
    archetype."""

    @staticmethod
    def from_pretrained(model_name: str, max_seq_length: int = 512,
                        pooling: Optional[str] = None,
                        load_in_4bit: bool = False,
                        dtype=None, **kw
                        ) -> Tuple[Any, Any]:
        import json
        import os

        from .loader import _resolve_model_path

        try:
            path = _resolve_model_path(model_name)
        except Exception:
            path = None
        graph = read_st_module_graph(path) if path else {}
        if graph.get("max_seq_length"):
            max_seq_length = min(max_seq_length, graph["max_seq_length"])
        pooling = pooling or graph.get("pooling", "mean")
        normalize = graph.get("normalize", True)

        model_type = None
        if path and os.path.exists(os.path.join(path, "config.json")):
            with open(os.path.join(path, "config.json"),
                      encoding="utf-8") as f:
                model_type = json.load(f).get("model_type")
        if model_type in ("bert", "mpnet", "distilbert"):
            from .bert import BertEncoderModel, load_bert
            from .loader import load_tokenizer

            bparams, bcfg = load_bert(path)
            tokenizer = load_tokenizer(path)
            enc = BertEncoderModel(params=bparams, cfg=bcfg,
                                   tokenizer=tokenizer)
            model = BertSentenceTransformerModel(
                encoder=enc, pooling=pooling, normalize=normalize,
                max_seq_length=max_seq_length)
            return model, tokenizer
        lm, tokenizer = FastLanguageModel.from_pretrained(
            model_name, max_seq_length=max_seq_length,
            load_in_4bit=load_in_4bit, dtype=dtype, **kw)
        model = SentenceTransformerModel(lm=lm, pooling=pooling,
                                         normalize=normalize,
                                         max_seq_length=max_seq_length)
        return model, tokenizer

    @staticmethod
    def get_peft_model(model: SentenceTransformerModel, **kw):
        FastLanguageModel.get_peft_model(model.lm, **kw)
        return model


@dataclasses.dataclass
class BertSentenceTransformerModel:
    """BERT-encoder-backed sentence transformer (MiniLM/mpnet class —
    the dominant public ST checkpoints)."""

    encoder: Any
    pooling: str = "mean"
    normalize: bool = True
    max_seq_length: int = 512

    @property
    def tokenizer(self):
        return self.encoder.tokenizer

    def encode(self, texts: Sequence[str], batch_size: int = 32
               ) -> np.ndarray:
        tok = self.tokenizer
        out = []
        for i in range(0, len(texts), batch_size):
            chunk = texts[i:i + batch_size]
            encs = [tok(t)["input_ids"][: self.max_seq_length]
                    for t in chunk]
            t_max = ((max(8, max(len(e) for e in encs)) + 7) // 8) * 8
            ids = np.zeros((len(encs), t_max), np.int32)
            mask = np.zeros((len(encs), t_max), np.int32)
            for j, e in enumerate(encs):
                ids[j, :len(e)] = e
                mask[j, :len(e)] = 1
            h = self.encoder.encode_hidden(jnp.asarray(ids),
                                           jnp.asarray(mask))
            emb = POOLERS[self.pooling](h, jnp.asarray(mask))
            if self.normalize:
                emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            out.append(np.asarray(emb))
        return np.concatenate(out)

    def similarity(self, a, b):
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b = b / np.linalg.norm(b, axis=-1, keepdims=True)
        return a @ b.T


@dataclasses.dataclass
class EmbeddingTrainerConfig:
    learning_rate: float = 2e-5
    max_steps: int = 100
    per_device_train_batch_size: int = 16
    scale: float = 20.0
    loss: str = "mnrl"            # mnrl | triplet | cosine
    triplet_margin: float = 5.0
    logging_steps: int = 10
    warmup_steps: int = 0
    seed: int = 3407


class SentenceTransformerTrainer:
    """Contrastive fine-tuning on (anchor, positive) pairs with in-batch
    negatives (the dominant sentence-transformers recipe)."""

    def __init__(self, model: SentenceTransformerModel, train_dataset,
                 args: Optional[EmbeddingTrainerConfig] = None, **kw):
        self.model = model
        self.args = args or EmbeddingTrainerConfig()
        self.train_dataset = list(train_dataset)
        self.state_log: List[Dict[str, Any]] = []

    def train(self):
        model = self.model
        args = self.args
        assert model.lm.lora is not None, "call get_peft_model first"
        tx = optax.adamw(args.learning_rate)
        opt_state = tx.init(model.lm.lora)

        has_neg = bool(self.train_dataset) and \
            "negative" in self.train_dataset[0]

        def loss_fn(lora, a_ids, a_mask, p_ids, p_mask, n_ids, n_mask):
            a = model._encode_ids(lora, a_ids, a_mask)
            p = model._encode_ids(lora, p_ids, p_mask)
            n = (model._encode_ids(lora, n_ids, n_mask)
                 if n_ids is not None else None)
            if args.loss == "triplet":
                assert n is not None, "triplet loss needs negatives"
                return triplet_loss(a, p, n, args.triplet_margin)
            return multiple_negatives_ranking_loss(a, p, args.scale,
                                                   negatives=n)

        @jax.jit
        def step(lora, opt_state, a_ids, a_mask, p_ids, p_mask,
                 n_ids, n_mask):
            loss, grads = jax.value_and_grad(loss_fn)(
                lora, a_ids, a_mask, p_ids, p_mask, n_ids, n_mask)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        bsz = args.per_device_train_batch_size
        ds = self.train_dataset
        idx = 0
        for s in range(args.max_steps):
            batch = [ds[(idx + j) % len(ds)] for j in range(bsz)]
            idx += bsz
            a_ids, a_mask = model._tokenize(
                [ex["anchor"] for ex in batch])
            p_ids, p_mask = model._tokenize(
                [ex["positive"] for ex in batch])
            if has_neg:
                n_ids, n_mask = model._tokenize(
                    [ex["negative"] for ex in batch])
                n_ids = jnp.asarray(n_ids)
                n_mask = jnp.asarray(n_mask)
            else:
                n_ids = n_mask = None
            model.lm.lora, opt_state, loss = step(
                model.lm.lora, opt_state, jnp.asarray(a_ids),
                jnp.asarray(a_mask), jnp.asarray(p_ids),
                jnp.asarray(p_mask), n_ids, n_mask)
            if (s + 1) % args.logging_steps == 0 or s == 0:
                self.state_log.append({"loss": float(loss), "step": s + 1})
        return self.state_log
