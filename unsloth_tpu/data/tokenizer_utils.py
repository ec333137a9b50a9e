"""Tokenizer repair and validation.

Parity target: reference unsloth/tokenizer_utils.py — pad-token fixing
(:647), check_tokenizer (:1343), chat-template render validation (:950-1326),
and fix_untrained_tokens (zoo; called from loader). The sentencepiece proto
surgery (:347,432) requires the sentencepiece package, which this
environment lacks; those paths are gated.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

PAD_CANDIDATES = (
    "<pad>", "<|pad|>", "[PAD]", "<|padding|>",
    "<|finetune_right_pad_id|>",   # llama-3.1 dedicated pad
    "<|endoftext|>",
)


def fix_pad_token(tokenizer, model_config=None):
    """Ensure a usable pad token distinct from EOS when possible
    (reference: tokenizer_utils.py:647 fix_pad_token).

    Padding with EOS is dangerous: masking pad positions then masks real
    EOS supervision, so models never learn to stop."""
    if tokenizer is None:
        return tokenizer
    if getattr(tokenizer, "pad_token", None) is not None and \
            tokenizer.pad_token != getattr(tokenizer, "eos_token", None):
        return tokenizer
    vocab = {}
    try:
        vocab = tokenizer.get_vocab()
    except Exception:
        pass
    for cand in PAD_CANDIDATES:
        if cand in vocab and cand != getattr(tokenizer, "eos_token", None):
            tokenizer.pad_token = cand
            return tokenizer
    # fall back: reuse eos (better than crashing; labels must mask pads)
    if getattr(tokenizer, "eos_token", None) is not None:
        tokenizer.pad_token = tokenizer.eos_token
    return tokenizer


def check_tokenizer(model, tokenizer) -> List[str]:
    """Sanity checks (reference: tokenizer_utils.py:1343 check_tokenizer).
    Returns a list of problem descriptions (empty = healthy)."""
    problems = []
    if tokenizer is None:
        return ["tokenizer is None"]
    vocab_size = getattr(model.cfg, "vocab_size", None)
    try:
        max_id = max(tokenizer.get_vocab().values())
        if vocab_size is not None and max_id >= vocab_size:
            problems.append(
                f"tokenizer max id {max_id} >= model vocab {vocab_size}")
    except Exception:
        problems.append("tokenizer.get_vocab() failed")
    for name in ("eos_token_id", "bos_token_id"):
        tid = getattr(tokenizer, name, None)
        if tid is not None and vocab_size is not None and tid >= vocab_size:
            problems.append(f"{name}={tid} out of range")
    # round-trip sanity
    try:
        ids = tokenizer("hello world")["input_ids"]
        text = tokenizer.decode(ids, skip_special_tokens=True)
        if "hello" not in text:
            problems.append(f"round-trip failed: {text!r}")
    except Exception as e:
        problems.append(f"round-trip raised {type(e).__name__}: {e}")
    return problems


def validate_chat_template(tokenizer) -> Optional[str]:
    """Render-validate the installed chat template (reference:
    tokenizer_utils.py:950-1326 auto-repair/render-validation). Returns an
    error string or None."""
    template = getattr(tokenizer, "chat_template", None)
    if not template:
        return "no chat_template set"
    msgs = [{"role": "user", "content": "__U__"},
            {"role": "assistant", "content": "__A__"}]
    try:
        out = tokenizer.apply_chat_template(msgs, tokenize=False)
    except Exception as e:
        return f"template failed to render: {e}"
    if "__U__" not in out or "__A__" not in out:
        return f"template dropped message content: {out!r}"
    return None


def fix_untrained_tokens(model, tokenizer, train_texts: Optional[List[str]]
                         = None, eps: float = 1e-16):
    """Set near-zero embedding rows to the mean embedding
    (reference: zoo fix_untrained_tokens, applied at load; also
    rl_replacements.py:135 for SFT). Works on the functional param tree:
    returns modified params."""
    import jax.numpy as jnp

    params = model.params
    embed = params["embed"]
    if hasattr(embed, "packed"):
        return params  # quantized embeddings: skip (reference also skips)
    norms = jnp.linalg.norm(embed.astype(jnp.float32), axis=-1)
    untrained = norms < eps
    n_bad = int(untrained.sum())
    if n_bad == 0 or n_bad == embed.shape[0]:
        return params
    mean_vec = jnp.mean(
        jnp.where(untrained[:, None], 0.0, embed.astype(jnp.float32)),
        axis=0) * (embed.shape[0] / max(embed.shape[0] - n_bad, 1))
    new_embed = jnp.where(untrained[:, None], mean_vec,
                          embed.astype(jnp.float32)).astype(embed.dtype)
    params = dict(params, embed=new_embed)
    lm_head = params.get("lm_head")
    if lm_head is not None and not hasattr(lm_head, "packed"):
        lm_norms = jnp.linalg.norm(lm_head.astype(jnp.float32), axis=-1)
        bad = lm_norms < eps
        if int(bad.sum()) not in (0, lm_head.shape[0]):
            mean_h = jnp.mean(
                jnp.where(bad[:, None], 0.0, lm_head.astype(jnp.float32)),
                axis=0) * (lm_head.shape[0] / max(
                    lm_head.shape[0] - int(bad.sum()), 1))
            params["lm_head"] = jnp.where(
                bad[:, None], mean_h,
                lm_head.astype(jnp.float32)).astype(lm_head.dtype)
    model.params = params
    return params


def mean_of_trained_tokens(model, eps: float = 1e-16):
    """fp32 mean of the trained embedding / lm_head rows (rows whose norm
    is >= eps), the init vector for new tokens (reference:
    tokenizer_utils.py:35 re-exports zoo mean_of_trained_tokens)."""
    import jax.numpy as jnp

    def _mean(mat):
        mat32 = mat.astype(jnp.float32)
        trained = jnp.linalg.norm(mat32, axis=-1) >= eps
        denom = jnp.maximum(trained.sum(), 1)
        return jnp.where(trained[:, None], mat32, 0.0).sum(axis=0) / denom

    embed = model.params["embed"]
    if hasattr(embed, "packed"):
        raise ValueError(
            "add_new_tokens/mean_of_trained_tokens need unquantized "
            "embeddings (the embed table is a packed quantized tensor)")
    mean_embed = _mean(embed)
    lm_head = model.params.get("lm_head")
    mean_head = None
    if lm_head is not None and not hasattr(lm_head, "packed"):
        mean_head = _mean(lm_head)
    return mean_embed, mean_head


def add_new_tokens(model, tokenizer, new_tokens=(), method: str = "mean",
                   interpolation: float = 0.5):
    """Add tokens to the tokenizer and grow the embedding / lm_head rows
    (reference: tokenizer_utils.py:35/:46 `add_new_tokens` from zoo).

    method="mean": each new row is the mean of the trained rows.
    method="interpolation": blend that mean with the mean embedding of the
    token STRING's existing-subword tokenization —
    row = (1-interpolation)*mean + interpolation*subword_mean.

    Mutates `model.params` / `model.cfg.vocab_size` and the tokenizer;
    returns the model for chaining."""
    import dataclasses

    import jax.numpy as jnp

    if isinstance(new_tokens, str):
        new_tokens = [new_tokens]
    new_tokens = list(new_tokens)
    assert method in ("mean", "interpolation"), method
    assert 0.0 <= interpolation <= 1.0, interpolation
    if not new_tokens:
        return model
    vocab = set(tokenizer.get_vocab())
    overlap = [t for t in new_tokens if t in vocab]
    if overlap:
        raise ValueError(
            f"tokens already exist in the tokenizer: {overlap}")

    if hasattr(model.params.get("lm_head"), "packed"):
        # mirror the embed guard: silently skipping the head while still
        # growing embed/vocab_size would leave lm_head rows short of the
        # new token ids (logits/labels indexing past the head)
        raise ValueError(
            "add_new_tokens needs an unquantized lm_head (the head is a "
            "packed quantized tensor); dequantize it before adding tokens")
    mean_embed, mean_head = mean_of_trained_tokens(model)

    # Per-token subword means BEFORE the tokenizer grows.
    sub_embeds, sub_heads = [], []
    embed = model.params["embed"]
    lm_head = model.params.get("lm_head")
    for tok in new_tokens:
        ids = tokenizer(tok, add_special_tokens=False)["input_ids"]
        if method == "interpolation" and ids:
            idx = jnp.asarray(ids)
            se = embed.astype(jnp.float32)[idx].mean(axis=0)
            sub_embeds.append(
                (1.0 - interpolation) * mean_embed + interpolation * se)
            if mean_head is not None:
                sh = lm_head.astype(jnp.float32)[idx].mean(axis=0)
                sub_heads.append((1.0 - interpolation) * mean_head
                                 + interpolation * sh)
        else:
            sub_embeds.append(mean_embed)
            if mean_head is not None:
                sub_heads.append(mean_head)

    tokenizer.add_tokens(new_tokens)
    new_ids = [tokenizer.convert_tokens_to_ids(t) for t in new_tokens]

    def _grow(mat, rows):
        # embed tables may be padded past len(tokenizer); only grow when
        # the new ids don't fit.
        old_v = mat.shape[0]
        new_v = max(old_v, max(new_ids) + 1)
        grown = mat
        if new_v > old_v:
            grown = jnp.zeros((new_v, mat.shape[1]), dtype=mat.dtype)
            grown = grown.at[:old_v].set(mat)
        for tid, r in zip(new_ids, rows):
            grown = grown.at[tid].set(r.astype(mat.dtype))
        return grown

    params = dict(model.params)
    params["embed"] = _grow(embed, sub_embeds)
    if lm_head is not None and mean_head is not None:
        params["lm_head"] = _grow(lm_head, sub_heads)
    model.params = params
    model.cfg = dataclasses.replace(
        model.cfg, vocab_size=int(params["embed"].shape[0]))
    return model


# ---------------------------------------------------------------------------
# Chat-template auto-repair (reference: tokenizer_utils.py:950-1326
# _fix_chat_template / _validate_patched_template /
# _fix_chat_template_for_tokenizer) and the repair loop around it
# (reference: tokenizer_utils.py:1343 check_tokenizer's fix-then-recheck)
# ---------------------------------------------------------------------------

_AGP_MSGS = [{"role": "user", "content": "__U__"}]


def _render(tokenizer, template, agp: bool) -> str:
    prev = getattr(tokenizer, "chat_template", None)
    tokenizer.chat_template = template
    try:
        return tokenizer.apply_chat_template(
            _AGP_MSGS, tokenize=False, add_generation_prompt=agp)
    finally:
        tokenizer.chat_template = prev


def _derive_generation_prefix(tokenizer) -> Optional[str]:
    """Render-diff derivation of the assistant generation prefix: the text
    the template emits between the end of the last user turn and the
    assistant's content (reference: tokenizer_utils.py:982-1005 derives
    the prefix the same way, by diffing renders)."""
    try:
        user_only = tokenizer.apply_chat_template(
            _AGP_MSGS, tokenize=False, add_generation_prompt=False)
        both = tokenizer.apply_chat_template(
            _AGP_MSGS + [{"role": "assistant", "content": "__A__"}],
            tokenize=False, add_generation_prompt=False)
    except Exception:
        return None
    marker = both.find("__A__")
    if marker < 0:
        return None
    # longest common prefix of (user_only, both) ends where the assistant
    # block begins; the generation prefix is everything from there to the
    # assistant content
    n = 0
    while n < min(len(user_only), marker) and user_only[n] == both[n]:
        n += 1
    prefix = both[n:marker]
    return prefix or None


def fix_chat_template(tokenizer):
    """Repair a chat template that ignores ``add_generation_prompt``
    (reference: tokenizer_utils.py:950-1070 _fix_chat_template).

    Returns (tokenizer, repaired: bool). The repaired template must pass
    the reference's validation contract (:1089-1125): the agp=True render
    differs from agp=False and strictly EXTENDS it; otherwise the original
    template is restored untouched."""
    template = getattr(tokenizer, "chat_template", None)
    if not template:
        return tokenizer, False
    try:
        no = _render(tokenizer, template, False)
        yes = _render(tokenizer, template, True)
    except Exception:
        return tokenizer, False  # syntax errors are repair_tokenizer's job
    if yes != no:
        return tokenizer, False  # already responds to the flag
    candidates = []
    stripped = template.rstrip()
    # Case 1 (reference :1010): trailing {{ expr }} IS the generation
    # prefix (always emitted) — wrap it in the conditional block.
    if stripped.endswith("}}"):
        start = stripped.rfind("{{")
        if start > 0 and "{%" not in stripped[start:]:
            candidates.append(
                stripped[:start]
                + "{% if add_generation_prompt %}"
                + stripped[start:] + "{% endif %}")
    # Case 2 (reference :1032, GH#4150): template simply never emits a
    # prefix — append an add_generation_prompt block with the render-diff
    # derived prefix.
    prefix = _derive_generation_prefix(tokenizer)
    if prefix is not None:
        escaped = prefix.replace("\\", "\\\\").replace("'", "\\'") \
            .replace("\n", "\\n")
        candidates.append(
            template + "{% if add_generation_prompt %}{{ '"
            + escaped + "' }}{% endif %}")
    if not candidates:
        return tokenizer, False
    for cand in candidates:
        try:
            no2 = _render(tokenizer, cand, False)
            yes2 = _render(tokenizer, cand, True)
        except Exception:
            continue
        # contract (reference :1089-1125): renders differ and the agp=True
        # render strictly EXTENDS the agp=False one. (Case 1 legitimately
        # changes the agp=False render — it stops emitting the prefix.)
        if yes2 != no2 and yes2.startswith(no2):
            tokenizer.chat_template = cand
            return tokenizer, True
    return tokenizer, False


def repair_tokenizer(tokenizer, model_config=None,
                     fallback_template: Optional[str] = None):
    """Auto-repair loop: fix what can be fixed, report what can't
    (reference: tokenizer_utils.py:950-1343 — the repair/validate cycle
    load_tokenizer runs before training).

    Returns (tokenizer, repairs, problems): ``repairs`` lists what was
    changed, ``problems`` what remains broken after repair.

    Breakage classes handled:
      * missing pad token / pad == eos   -> fix_pad_token
      * pad/eos id out of model range    -> reassign pad; report eos
      * jinja template that fails to render -> install fallback_template
        from the registry (when given), else report
      * template that drops message content -> same
      * template ignoring add_generation_prompt -> fix_chat_template
      * broken encode/decode round-trip  -> report (not repairable)
    """
    repairs: List[str] = []
    problems: List[str] = []
    if tokenizer is None:
        return tokenizer, repairs, ["tokenizer is None"]

    # -- pad token ---------------------------------------------------------
    pad_before = getattr(tokenizer, "pad_token", None)
    eos = getattr(tokenizer, "eos_token", None)
    if pad_before is None or pad_before == eos:
        fix_pad_token(tokenizer, model_config)
        pad_now = getattr(tokenizer, "pad_token", None)
        if pad_now != pad_before:
            repairs.append(
                f"pad_token: {pad_before!r} -> {pad_now!r}"
                + (" (was eos)" if pad_before == eos and pad_before
                   else " (was missing)"))
        if pad_now is not None and pad_now == eos:
            problems.append(
                "pad_token == eos_token (no dedicated pad in vocab); "
                "label masking must not mask real EOS supervision")

    # -- special ids inside the model vocab ---------------------------------
    vocab_size = getattr(model_config, "vocab_size", None) \
        if model_config is not None else None
    if vocab_size is not None:
        pad_id = getattr(tokenizer, "pad_token_id", None)
        if pad_id is not None and pad_id >= vocab_size:
            try:
                vocab = tokenizer.get_vocab()
            except Exception:
                vocab = {}
            for cand in PAD_CANDIDATES:
                cid = vocab.get(cand)
                if cid is not None and cid < vocab_size and cand != eos:
                    tokenizer.pad_token = cand
                    repairs.append(
                        f"pad_token_id {pad_id} >= model vocab "
                        f"{vocab_size}: reassigned to {cand!r} ({cid})")
                    break
            else:
                problems.append(
                    f"pad_token_id {pad_id} out of model vocab "
                    f"{vocab_size} and no in-range candidate")
        for name in ("eos_token_id", "bos_token_id"):
            tid = getattr(tokenizer, name, None)
            if tid is not None and tid >= vocab_size:
                problems.append(f"{name}={tid} >= model vocab "
                                f"{vocab_size} (cannot guess a repair)")

    # -- chat template -------------------------------------------------------
    err = validate_chat_template(tokenizer)
    if err is not None and getattr(tokenizer, "chat_template", None):
        if fallback_template is not None:
            from .chat_templates import get_chat_template

            broken = err
            tokenizer.chat_template = None
            get_chat_template(tokenizer, chat_template=fallback_template)
            err = validate_chat_template(tokenizer)
            if err is None:
                repairs.append(
                    f"chat_template replaced with registry "
                    f"{fallback_template!r} (was: {broken})")
            else:
                problems.append(f"chat_template still broken after "
                                f"registry install: {err}")
        else:
            problems.append(f"chat_template: {err}")
    elif err is None:
        tokenizer, fixed = fix_chat_template(tokenizer)
        if fixed:
            repairs.append(
                "chat_template ignored add_generation_prompt: injected a "
                "render-diff-derived generation-prefix block")

    # -- round trip ----------------------------------------------------------
    try:
        ids = tokenizer("hello world")["input_ids"]
        text = tokenizer.decode(ids, skip_special_tokens=True)
        # whitespace-insensitive: char/word-level decoders may re-join
        # pieces with separators
        if "hello" not in text.replace(" ", ""):
            problems.append(f"encode/decode round-trip failed: {text!r}")
    except Exception as e:
        problems.append(
            f"round-trip raised {type(e).__name__}: {e}")

    return tokenizer, repairs, problems


# ---------------------------------------------------------------------------
# Slow -> fast tokenizer conversion (reference: tokenizer_utils.py:141-262
# convert_to_fast_tokenizer + assert_same_tokenization)
# ---------------------------------------------------------------------------

_PROBE_TEXTS = (
    "Hello world!",
    "The quick brown fox jumps over the lazy dog.",
    "def f(x):\n    return x * 2  # comment",
    "Unicode: naïve café — 你好 🌍",
    "   leading spaces\tand\ttabs",
)


def assert_same_tokenization(slow, fast,
                             texts=_PROBE_TEXTS) -> bool:
    """True when both tokenizers produce identical ids on the probe set
    (the reference's equality gate before swapping a converted fast
    tokenizer in)."""
    try:
        for t in texts:
            a = slow(t, add_special_tokens=False)["input_ids"]
            b = fast(t, add_special_tokens=False)["input_ids"]
            if list(a) != list(b):
                return False
        return True
    except Exception:
        return False


def convert_to_fast_tokenizer(tokenizer, texts=_PROBE_TEXTS):
    """Convert a slow (python) tokenizer to a fast (tokenizers-backed) one,
    keeping the slow one when conversion fails or changes tokenization on
    the probe texts."""
    if getattr(tokenizer, "is_fast", False):
        return tokenizer
    try:
        from transformers import PreTrainedTokenizerFast
        from transformers.convert_slow_tokenizer import (
            convert_slow_tokenizer)

        backend = convert_slow_tokenizer(tokenizer)
        fast = PreTrainedTokenizerFast(
            tokenizer_object=backend,
            bos_token=getattr(tokenizer, "bos_token", None),
            eos_token=getattr(tokenizer, "eos_token", None),
            unk_token=getattr(tokenizer, "unk_token", None),
            pad_token=getattr(tokenizer, "pad_token", None),
            model_max_length=getattr(tokenizer, "model_max_length", None),
        )
        fast.chat_template = getattr(tokenizer, "chat_template", None)
    except Exception:
        return tokenizer
    return fast if assert_same_tokenization(tokenizer, fast, texts) \
        else tokenizer


# ---------------------------------------------------------------------------
# SentencePiece proto surgery (reference: tokenizer_utils.py:347-432
# fix_sentencepiece_tokenizer / fix_sentencepiece_gguf). Operates on
# tokenizer.model FILES through the protobuf schema transformers vendors,
# so no sentencepiece runtime is needed.
# ---------------------------------------------------------------------------

_SP_CONTROL = 3          # ModelProto.SentencePiece.Type.CONTROL
_SP_USER_DEFINED = 4


def _sp_proto():
    from transformers.convert_slow_tokenizer import import_protobuf

    return import_protobuf()


def rename_sentencepiece_pieces(model_file: str, token_mapping) -> int:
    """Rename pieces in a tokenizer.model in place (the reference's
    fix_sentencepiece_tokenizer applied at file level: old piece text ->
    new piece text). Returns how many pieces were renamed."""
    pb = _sp_proto()
    proto = pb.ModelProto()
    with open(model_file, "rb") as f:
        proto.ParseFromString(f.read())
    by_piece = {p.piece: p for p in proto.pieces}
    renamed = 0
    for old, new in token_mapping.items():
        p = by_piece.get(old)
        if p is None or new in by_piece:
            continue
        p.piece = new
        renamed += 1
    with open(model_file, "wb") as f:
        f.write(proto.SerializeToString())
    return renamed


def fix_sentencepiece_gguf(saved_location: str,
                           special_tokens=None) -> int:
    """Prepare a sentencepiece tokenizer.model for GGUF conversion
    (reference: tokenizer_utils.py:432 fix_sentencepiece_gguf, inspired by
    llama.cpp's convert_hf_to_gguf):

      * appends added-vocab tokens missing from the proto as USER_DEFINED
      * retypes special tokens stored as NORMAL to CONTROL (llama.cpp's
        parse_special only honors CONTROL pieces)

    Returns the number of pieces changed/added."""
    import json
    import os

    model_file = os.path.join(saved_location, "tokenizer.model")
    if not os.path.isfile(model_file):
        return 0
    pb = _sp_proto()
    proto = pb.ModelProto()
    with open(model_file, "rb") as f:
        proto.ParseFromString(f.read())
    by_piece = {p.piece: p for p in proto.pieces}

    specials = set(special_tokens or ())
    added = []
    for fname in ("special_tokens_map.json", "tokenizer_config.json"):
        path = os.path.join(saved_location, fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        for v in (data.get("additional_special_tokens") or []):
            specials.add(v["content"] if isinstance(v, dict) else v)
        for key in ("bos_token", "eos_token", "unk_token", "pad_token"):
            v = data.get(key)
            if v:
                specials.add(v["content"] if isinstance(v, dict) else v)
        for tok in (data.get("added_tokens_decoder") or {}).values():
            if isinstance(tok, dict) and tok.get("content"):
                added.append((tok["content"], bool(tok.get("special"))))

    changed = 0
    for piece_text, special in added:
        p = by_piece.get(piece_text)
        if p is None:
            p = proto.pieces.add()
            p.piece = piece_text
            p.score = 0.0
            p.type = _SP_CONTROL if special else _SP_USER_DEFINED
            by_piece[piece_text] = p
            changed += 1
        elif special and p.type not in (_SP_CONTROL,):
            p.type = _SP_CONTROL
            changed += 1
    for s in specials:
        p = by_piece.get(s)
        if p is not None and p.type != _SP_CONTROL:
            p.type = _SP_CONTROL
            changed += 1
    if changed:
        with open(model_file, "wb") as f:
            f.write(proto.SerializeToString())
    return changed
