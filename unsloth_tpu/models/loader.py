"""FastLanguageModel — the user-facing facade.

API parity with the reference (reference: models/loader.py:403
`FastLanguageModel.from_pretrained`, models/llama.py:3044 `get_peft_model`,
:3807/:3856 `for_inference`/`for_training`): same method names and the
load -> get_peft_model -> train -> save flow, returning (model, tokenizer).

TPU-native differences:
  * the returned model is a lightweight handle over functional state
    (config + frozen param pytree + trainable LoRA pytree + mesh) — there is
    no monkey-patched torch module graph;
  * ``load_in_4bit`` quantizes to NF4 pytrees on load (no bitsandbytes);
  * multi-chip placement is a mesh + sharding rules, not per-rank
    device_map.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..parallel.mesh import ShardingRules, create_mesh
from ..utils.dtypes import canonical_dtype
from .config import ModelConfig, load_hf_config
from . import hf_loader

logger = logging.getLogger(__name__)
from .params import (DEFAULT_TARGET_MODULES, init_lora_tree,
                     normalize_target_modules)


@dataclasses.dataclass
class LanguageModel:
    """Functional model handle (what `from_pretrained` returns)."""

    cfg: ModelConfig
    params: Dict[str, Any]                 # frozen base weights
    lora: Optional[Dict[str, Any]] = None  # trainable LoRA tree
    mesh: Optional[Any] = None
    rules: ShardingRules = dataclasses.field(default_factory=ShardingRules)
    max_seq_length: int = 2048
    tokenizer: Any = None
    model_path: Optional[str] = None
    hf_config: Optional[Dict[str, Any]] = None
    lora_config: Optional[Dict[str, Any]] = None
    _mode: str = "training"
    # gradient checkpointing mode: False | True/"layer" | "offload"
    # ("unsloth" maps to "offload": host-offloaded GC, _utils.py:356-382)
    gc_mode: Any = True

    # -- reference-parity conveniences --------------------------------
    @property
    def config(self) -> ModelConfig:
        return self.cfg

    def for_inference(self, decode_cache: Any = None) -> "LanguageModel":
        """(reference: models/llama.py:3807) — toggles decode mode.

        decode_cache: opt-in decode-time dequant cache (the TPU answer to
        the reference's 4-bit ``fast_gemv``, kernels/utils.py:765-982 —
        see inference/decode_cache.py): "auto" spends spare HBM
        dequantizing NF4 weights to persistent dense bf16 so the decode
        loop skips the per-step VPU nibble decode; a number = that many
        extra GB; None (default) = off. Training state is untouched —
        ``for_training()`` restores the NF4 tree."""
        self._mode = "inference"
        if decode_cache is not None:
            from ..inference.decode_cache import (apply_decode_cache,
                                                  decode_cache_summary)

            if getattr(self, "_nf4_params", None) is None:
                self._nf4_params = self.params
            cached, stats = apply_decode_cache(
                self._nf4_params, hbm_budget_gb=decode_cache)
            self.params = cached
            self._decode_cache_stats = stats
            import logging

            logging.getLogger("unsloth_tpu").info(
                decode_cache_summary(stats))
        return self

    def for_training(self) -> "LanguageModel":
        self._mode = "training"
        if getattr(self, "_nf4_params", None) is not None:
            self.params = self._nf4_params
            self._nf4_params = None
        return self

    def get_peft_model(self, **kwargs) -> "LanguageModel":
        return FastLanguageModel.get_peft_model(self, **kwargs)

    # -- functional API ------------------------------------------------
    def loss_fn(self, lora, batch, **kw):
        from .decoder import loss_fn

        return loss_fn(self.params, lora, batch, self.cfg, **kw)

    def forward(self, input_ids, **kw):
        from .decoder import forward

        return forward(self.params, self.lora, input_ids, self.cfg, **kw)

    def logits(self, input_ids, **kw):
        from .decoder import logits_fn

        return logits_fn(self.params, self.lora, input_ids, self.cfg, **kw)

    def generate(self, *args, **kw):
        from ..inference.generate import generate

        return generate(self, *args, **kw)

    # -- persistence ----------------------------------------------------
    def save_pretrained_merged(self, path: str, tokenizer=None,
                               save_method: str = "merged_16bit", **kw):
        from ..export.save import save_pretrained_merged

        return save_pretrained_merged(self, path, tokenizer=tokenizer,
                                      save_method=save_method, **kw)

    def save_pretrained_gguf(self, path: str,
                             tokenizer=None,
                             quantization_method: str = "q8_0", **kw):
        """GGUF export (reference: save.py:2940 binds
        .save_pretrained_gguf on the model)."""
        from ..export.gguf import save_pretrained_gguf

        return save_pretrained_gguf(
            self, path, quantization_method=quantization_method,
            tokenizer=tokenizer or self.tokenizer, **kw)

    def push_to_hub_merged(self, repo_id: str, tokenizer=None,
                           save_method: str = "merged_16bit", **kw):
        from ..export.save import push_to_hub_merged

        return push_to_hub_merged(self, repo_id, tokenizer=tokenizer,
                                  save_method=save_method, **kw)

    def push_to_hub_gguf(self, repo_id: str, tokenizer=None,
                         quantization_method: str = "q8_0", **kw):
        from ..export.save import push_to_hub_gguf

        return push_to_hub_gguf(
            self, repo_id, tokenizer=tokenizer,
            quantization_method=quantization_method, **kw)

    def save_lora(self, path: str):
        from ..export.save import save_lora

        return save_lora(self, path)

    def load_lora(self, path: str):
        """Load a peft adapter into the LoRA tree (reference:
        models/_utils.py:3681-3690 binds .load_lora/.save_lora on the
        fast-inference model)."""
        from ..export.save import load_lora

        return load_lora(self, path)


class FastLanguageModel:
    """Reference-compatible entry point (reference: models/loader.py:403)."""

    @staticmethod
    def from_pretrained(
        model_name: str,
        max_seq_length: int = 2048,
        dtype: Optional[Any] = None,
        load_in_4bit: bool = True,
        load_in_8bit: bool = False,
        full_finetuning: bool = False,
        *,
        mesh: Optional[Any] = None,
        rules: Optional[ShardingRules] = None,
        token: Optional[str] = None,
        trust_remote_code: bool = False,
        fast_inference: bool = False,
        stack_layers: bool = False,
        qat_scheme: Optional[str] = None,
        **kwargs,
    ) -> Tuple[LanguageModel, Any]:
        """Load a model + tokenizer from a local HF checkpoint directory.

        Remote hub names are resolved through the local HF cache when
        present; this environment is offline-first (the reference's
        `@_offline_aware_load` retry, loader_utils.py:1183, is the default
        behavior here)."""
        if qat_scheme is not None and not full_finetuning:
            # reference error parity (loader.py:1304-1309): QAT+LoRA goes
            # through get_peft_model(qat_scheme=...)
            raise ValueError(
                "Specifying `qat_scheme` in `from_pretrained(...)` is "
                "only compatible with `full_finetuning=True`. For QAT "
                "with LoRA, pass `qat_scheme` to `get_peft_model(...)`.")
        if qat_scheme is not None:
            kwargs["_qat_scheme_full_ft"] = qat_scheme
        if model_name.endswith(".gguf") and os.path.isfile(model_name):
            # a GGUF export is a runnable artifact (the reference serves
            # GGUF via llama.cpp's llama-server; here it loads straight
            # back into the functional decoder) — export/gguf_loader.py
            from ..export.gguf_loader import load_gguf

            return load_gguf(model_name,
                             dtype=canonical_dtype(dtype) or jnp.bfloat16,
                             max_seq_length=max_seq_length,
                             load_in_4bit=load_in_4bit and not
                             full_finetuning)
        from .mapper import get_model_name

        if not os.path.isdir(model_name):
            model_name, load_in_4bit = get_model_name(model_name,
                                                      load_in_4bit)
        path = _resolve_model_path(model_name)
        hf_config = load_hf_config(path)
        mt = hf_config.get("model_type", "")
        if "vision_config" in hf_config and mt not in ("gemma3n",):
            # FastModel auto-routing (reference: FastModel loads any
            # architecture — models/loader.py:820-897 dispatch): VLM
            # checkpoints go through the vision path
            from .vision import FastVisionModel

            return FastVisionModel.from_pretrained(
                model_name, load_in_4bit=load_in_4bit, dtype=dtype,
                max_seq_length=max_seq_length, **kwargs)
        if mt == "whisper":
            from .whisper import load_whisper

            model = load_whisper(path, dtype=canonical_dtype(dtype)
                                 or jnp.float32)
            return model, getattr(model, "tokenizer", None)
        if mt == "csm":
            from .csm import load_csm

            model = load_csm(path, dtype=canonical_dtype(dtype)
                             or jnp.float32)
            return model, None
        cfg = ModelConfig.from_hf_config(hf_config, name=model_name)

        dtype = canonical_dtype(dtype) or jnp.bfloat16
        if full_finetuning:
            load_in_4bit = False

        put = None
        if mesh is not None:
            rules = rules or ShardingRules()
            put = _make_param_placer(mesh, rules)

        params = hf_loader.load_params(
            path, cfg, dtype=dtype, load_in_4bit=load_in_4bit, put=put)
        if stack_layers:
            # scan-over-layers layout: compile time of one layer, not N
            # (homogeneous stacks only — the loader raises otherwise)
            from .decoder import stack_params

            params = stack_params(params)

        tokenizer = load_tokenizer(path)
        if tokenizer is not None:
            # auto-repair loop (reference: tokenizer_utils.py:950-1343 —
            # pad fixing, special-id range checks, chat-template
            # render-validation/repair); unrepairable problems are
            # warnings, not crashes, matching the reference's behavior
            from ..data.tokenizer_utils import repair_tokenizer

            tokenizer, repairs, problems = repair_tokenizer(
                tokenizer, model_config=cfg)
            for msg in repairs:
                logger.info("tokenizer repair: %s", msg)
            for msg in problems:
                logger.warning("tokenizer problem: %s", msg)
        model = LanguageModel(
            cfg=cfg, params=params, mesh=mesh,
            rules=rules or ShardingRules(),
            max_seq_length=max_seq_length, tokenizer=tokenizer,
            model_path=path, hf_config=hf_config)
        qat_full = kwargs.get("_qat_scheme_full_ft")
        if qat_full is not None:
            from .qat import apply_qat

            model.params = apply_qat(model.params, qat_full)
            model.qat_scheme = qat_full
        return model, tokenizer

    @staticmethod
    def get_peft_model(
        model: LanguageModel,
        r: int = 16,
        target_modules: Sequence[str] = DEFAULT_TARGET_MODULES,
        lora_alpha: float = 16.0,
        lora_dropout: float = 0.0,
        bias: str = "none",
        use_gradient_checkpointing: Any = "unsloth",
        random_state: int = 3407,
        use_rslora: bool = False,
        modules_to_save: Optional[Sequence[str]] = None,
        qat_scheme: Optional[str] = None,
        loftq_config: Optional[Any] = None,
        use_dora: bool = False,
        **kwargs,
    ) -> LanguageModel:
        """Attach a LoRA tree (reference: models/llama.py:3044).

        lora_dropout != 0 and bias != "none" are accepted but, like the
        reference's fast path, the optimized kernels assume dropout=0 and
        bias=none (reference: models/llama.py:3582-3700 binds fast LoRA
        only under those settings).

        qat_scheme ("int4" | "int8-int4" | "fp8-int4" | "fp8-fp8" |
        "phone-deployment"): QAT+LoRA — fake-quantize the frozen dense
        base so LoRA learns to compensate the quantization error
        (reference: models/llama.py:3476 _prepare_for_qat +
        _utils.py:3828; because the base is frozen, a one-time
        dequant(quant(W)) is exactly equivalent to per-step fake quant)."""
        if qat_scheme is not None:
            from .qat import apply_qat

            model.params = apply_qat(model.params, qat_scheme)
            model.qat_scheme = qat_scheme
        if lora_dropout != 0.0:
            import warnings

            warnings.warn("lora_dropout > 0 is not yet implemented on the "
                          "fast path; proceeding with dropout=0.")
        model.gc_mode = {"unsloth": "offload", True: True, False: False,
                         "layer": True, "offload": "offload"}.get(
            use_gradient_checkpointing, True)
        key = jax.random.PRNGKey(random_state)
        model.lora = init_lora_tree(
            model.cfg, key, r=r, alpha=lora_alpha,
            target_modules=normalize_target_modules(target_modules),
            use_rslora=use_rslora)
        if loftq_config:
            # LoftQ (reference: models/llama.py:3068,3102 routes
            # init_lora_weights="loftq" + loftq_config into peft): the
            # dense base is quantized HERE with SVD-initialized adapters
            # absorbing the quantization error.
            from .loftq import apply_loftq

            model.params, model.lora = apply_loftq(
                model.params, model.lora, loftq_config,
                {"r": r, "lora_alpha": lora_alpha,
                 "use_rslora": use_rslora})
        if use_dora and "layers" in model.params:
            # DoRA (reference: models/llama.py:3149 use_dora via kwargs
            # -> peft): magnitude-initialized so step 0 == plain LoRA.
            from ..ops.lora import LoRAWeights, to_dora

            for layer_p, layer_l in zip(model.params["layers"],
                                        model.lora["layers"]):
                for name, lw in list(layer_l.items()):
                    if isinstance(lw, LoRAWeights) and name in layer_p:
                        layer_l[name] = to_dora(layer_p[name], lw)
        if "layers_stacked" in model.params:
            from .decoder import stack_lora

            model.lora = stack_lora(model.lora)
            if use_dora:
                # pre-stacked params: vmap the magnitude init over the
                # layer axis of the stacked weights.
                from ..ops.lora import LoRAWeights, to_dora

                sp = model.params["layers_stacked"]
                sl = model.lora["layers_stacked"]
                for name, lw in list(sl.items()):
                    if isinstance(lw, LoRAWeights) and name in sp:
                        sl[name] = jax.vmap(to_dora)(sp[name], lw)
        # modules_to_save: full-rank trainable copies shadowing frozen base
        # (reference: peft modules_to_save; enables embedding fine-tuning
        # with the separate embedding_learning_rate, trainer.py:435-456)
        _m2s = {"embed_tokens": "embed", "embed": "embed",
                "lm_head": "lm_head"}
        for mod in (modules_to_save or []):
            ours = _m2s.get(mod)
            if ours is None:
                continue
            src = model.params.get(ours)
            if src is None and ours == "lm_head":
                src = model.params["embed"]  # tied: untie into trainable
            if src is not None and not hasattr(src, "packed"):
                # copy=True is load-bearing: the trainable copy gets donated
                # by the jitted train step; aliasing the frozen base buffer
                # would delete it.
                model.lora[ours] = jnp.array(src, dtype=jnp.float32,
                                             copy=True)
        model.lora_config = {
            "r": r, "lora_alpha": lora_alpha,
            "target_modules": list(target_modules),
            "lora_dropout": lora_dropout, "bias": bias,
            "use_rslora": use_rslora,
            "modules_to_save": list(modules_to_save or []),
            "init_lora_weights": "loftq" if loftq_config else True,
            "use_dora": use_dora,
        }
        return model

    # alias for API parity
    for_inference = staticmethod(lambda model: model.for_inference())
    for_training = staticmethod(lambda model: model.for_training())


# FastModel is the "any architecture" generation in the reference
# (models/loader.py:1126); here the archetype already covers families by
# config, so it is the same entry point.
FastModel = FastLanguageModel


def _resolve_model_path(model_name: str) -> str:
    if os.path.isdir(model_name):
        return model_name
    # HF cache layout: ~/.cache/huggingface/hub/models--org--name/snapshots/*
    cache = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    hub = os.path.join(cache, "hub",
                       "models--" + model_name.replace("/", "--"),
                       "snapshots")
    if os.path.isdir(hub):
        snaps = sorted(os.listdir(hub))
        if snaps:
            return os.path.join(hub, snaps[-1])
    raise FileNotFoundError(
        f"Model {model_name!r} is not a local directory and was not found "
        f"in the HF cache ({hub}). This environment has no network access; "
        f"download the checkpoint first or pass a local path.")


def load_tokenizer(path: str):
    """Tokenizer via transformers (works fully offline from a local dir)."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(path, local_files_only=True)
    except Exception:
        return None


def _make_param_placer(mesh, rules: ShardingRules):
    """Return put(tree_path, array) that shards big tensors over fsdp/tp.

    Placement policy (the FSDP default for LoRA/QLoRA — SURVEY §7 step 7):
      * embed/lm_head: shard vocab dim over tp (falls back to replicate
        when indivisible)
      * linear kernels: shard the largest dim over fsdp
      * NF4 leaves: shard packed rows over fsdp
      * small tensors (norms, biases, absmax): replicate
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    fsdp = mesh.shape.get("fsdp", 1)
    tp = mesh.shape.get("tp", 1)

    def put(tree_path: str, x):
        spec = P()
        if hasattr(x, "ndim") and x.ndim >= 1:
            if tree_path in ("embed", "lm_head"):
                if x.shape[0] % (fsdp * tp) == 0:
                    spec = P(("fsdp", "tp"))
            elif x.ndim == 2 and "packed" not in tree_path:
                if x.shape[0] % fsdp == 0 and x.size >= 1 << 20:
                    spec = P("fsdp")
            elif x.ndim == 2:  # NF4 packed
                if x.shape[0] % fsdp == 0:
                    spec = P("fsdp")
            elif x.ndim == 3:  # stacked experts
                if x.shape[0] % tp == 0:
                    spec = P("tp")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return put
