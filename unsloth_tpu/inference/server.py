"""OpenAI- and Anthropic-compatible HTTP serving.

Parity target: the reference exposes `/v1/chat/completions`, `/v1/responses`
and `/v1/messages` from the Studio backend (reference: studio/backend/core/
inference/{inference,anthropic_compat}.py, served by llama.cpp subprocesses)
and `unsloth start <agent>` connects coding agents to them.

Implementation: stdlib ThreadingHTTPServer (this image ships no
fastapi/flask) in front of the on-device generate loop. Single-flight
generation guarded by a lock — the analog of the reference's llama.cpp
admission control (llama_admission.py).
"""

from __future__ import annotations

import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from .generate import SamplingParams, generate


class InferenceServer:
    def __init__(self, model, tokenizer=None, model_name: str = "local",
                 continuous_batching: bool = False, max_batch: int = 4,
                 max_len: int = 2048, speculative: bool = False,
                 adapters: Optional[Dict[str, str]] = None,
                 kv_cache_dtype: str = "bf16",
                 prefix_caching: bool = False,
                 embed_model: Any = None):
        self.model = model
        self.tokenizer = tokenizer or model.tokenizer
        self.model_name = model_name
        # ngram speculative decoding for greedy single-flight requests
        # (inference/speculative.py; exact output, fewer weight passes)
        self.speculative = speculative
        # "bf16" | "fp8_e4m3" | "fp8_e5m2" — the llama.cpp
        # --cache-type-k/v analog (halves decode-cache HBM)
        self.kv_cache_dtype = kv_cache_dtype
        # /v1/embeddings backend (FastSentenceTransformer handle)
        self.embed_model = embed_model
        # multi-LoRA serving: {"name": peft_dir_or_lora_tree}; requests
        # select via the OpenAI "model" field — an adapter swap is a
        # data swap (same pytree shapes -> same compiled program), the
        # TPU-native form of vLLM's LoRARequest routing the reference
        # leans on (reference: _utils.py:3681-3690 .load_lora binding)
        self.adapters: Dict[str, Any] = {}
        for name, src in (adapters or {}).items():
            if isinstance(src, str):
                from ..export.save import load_lora_tree

                src, _ = load_lora_tree(src, model.cfg.num_layers)
            self.adapters[name] = src
        self._lock = threading.Lock()  # single-flight generation
        self._batcher = None
        if continuous_batching:
            # llama-server-shape serving: concurrent requests share one
            # paged decode loop (inference/scheduler.py). Greedy decoding
            # (per-request temperature is a single-flight feature).
            from .scheduler import BatcherThread, ContinuousBatcher

            self._batcher = BatcherThread(ContinuousBatcher(
                model, max_batch=max_batch, max_len=max_len,
                prefix_caching=prefix_caching,
                speculative=speculative))

    def _resolve_lora(self, body) -> Any:
        """OpenAI "model" field -> adapter tree. Unknown names keep the
        model's own adapter; the literal name "base" forces the bare
        base model (lora=None)."""
        name = body.get("model") if isinstance(body, dict) else None
        if name in self.adapters:
            return self.adapters[name]
        if name == "base":
            return None
        return "__model__"

    def _gen_text(self, prompt: str, params: SamplingParams,
                  lora: Any = "__model__") -> str:
        if self._batcher is not None:
            ids = self.tokenizer(prompt)["input_ids"]
            out = self._batcher.generate(ids,
                                         max_new_tokens=params.max_tokens)
            eos = getattr(self.tokenizer, "eos_token_id", None)
            if eos is not None and out and out[-1] == eos:
                out = out[:-1]
            return self.tokenizer.decode(out, skip_special_tokens=True)
        with self._lock:
            return generate(self.model, [prompt], params,
                            tokenizer=self.tokenizer,
                            speculative=self.speculative, lora=lora,
                            kv_cache_dtype=self.kv_cache_dtype)[0]

    def _gen_stream(self, prompt: str, params: SamplingParams,
                    lora: Any = "__model__"):
        """Yield text deltas. With continuous batching the shared decode
        loop streams true per-token deltas (incremental detokenization
        against the running id list, so multi-token codepoints surface
        whole); single-flight falls back to generate-then-chunk, which
        keeps the SSE protocol shape for clients that require
        stream=true (the reference proxies llama-server's SSE)."""
        if self._batcher is not None:
            ids = self.tokenizer(prompt)["input_ids"]
            eos = getattr(self.tokenizer, "eos_token_id", None)
            out_ids: list = []
            emitted = ""
            for new in self._batcher.stream(
                    ids, max_new_tokens=params.max_tokens):
                out_ids.extend(new)
                while out_ids and eos is not None and out_ids[-1] == eos:
                    out_ids = out_ids[:-1]
                text = self.tokenizer.decode(out_ids,
                                             skip_special_tokens=True)
                if text.endswith("�"):   # mid-codepoint: hold back
                    continue
                if len(text) > len(emitted):
                    yield text[len(emitted):]
                    emitted = text
            return
        text = self._gen_text(prompt, params, lora=lora)
        chunk = 16
        for i in range(0, len(text), chunk):
            yield text[i:i + chunk]

    # -- request handling ------------------------------------------------

    # -- multimodal content blocks ----------------------------------------

    def _decode_image(self, data: str):
        """base64 (optionally a data: URI) -> preprocessed [C, H, W]
        pixel array for the model's vision tower. Uses the checkpoint's
        image processor when present; falls back to SigLIP-style
        resize + (x/255 - 0.5) / 0.5."""
        import base64
        import io

        from PIL import Image

        if data.startswith("data:"):
            data = data.split(",", 1)[1]
        img = Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")

        if hasattr(self.model, "spatial_merge_size"):
            # qwen-vl: the image becomes packed patch rows + a grid
            import numpy as _np

            proc = getattr(self, "_qwen_proc", None)
            if proc is None:
                try:
                    from transformers import AutoImageProcessor

                    proc = AutoImageProcessor.from_pretrained(
                        self.model.model_path, local_files_only=True)
                except Exception:
                    from transformers import Qwen2VLImageProcessor

                    proc = Qwen2VLImageProcessor()
                self._qwen_proc = proc
            out = proc(images=img, return_tensors="np")
            grid = tuple(int(x) for x in out["image_grid_thw"][0])
            return ("qwen", _np.asarray(out["pixel_values"],
                                        _np.float32), grid)

        proc = getattr(self, "_image_proc", None)
        if proc is None and getattr(self.model, "model_path", None):
            try:
                from transformers import AutoImageProcessor

                proc = AutoImageProcessor.from_pretrained(
                    self.model.model_path, local_files_only=True)
            except Exception:
                proc = False
            self._image_proc = proc
        if proc:
            import numpy as _np

            out = proc(images=img, return_tensors="np")
            return _np.asarray(out["pixel_values"][0], _np.float32)
        import numpy as _np

        size = getattr(getattr(self.model, "vision_cfg", None),
                       "image_size", 224)
        img = img.resize((size, size), Image.BICUBIC)
        arr = _np.asarray(img, _np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        return arr.transpose(2, 0, 1)

    def _split_multimodal(self, messages):
        """OpenAI/Anthropic content blocks -> (text messages, images)."""
        images = []
        norm = []
        for m in messages:
            c = m.get("content")
            if isinstance(c, list):
                text = ""
                for block in c:
                    t = block.get("type")
                    if t == "text":
                        text += block.get("text", "")
                    elif t == "image_url":              # OpenAI shape
                        images.append(self._decode_image(
                            block["image_url"]["url"]))
                    elif t == "image":                  # Anthropic shape
                        images.append(self._decode_image(
                            block["source"]["data"]))
                norm.append({"role": m["role"], "content": text})
            else:
                norm.append(m)
        return norm, images

    def _gen_multimodal(self, norm_messages, images, params) -> str:
        prompt = self._render(norm_messages)
        if not images or not hasattr(self.model, "embed_multimodal"):
            return self._gen_text(prompt, params)
        if isinstance(images[0], tuple) and images[0][0] == "qwen":
            # qwen-vl: prepend [vision_start][img]*n[vision_end] per
            # image, concat the packed patch rows, M-RoPE decode
            import numpy as _np

            m = self.model
            merge = m.spatial_merge_size
            ids = self.tokenizer(prompt)["input_ids"]
            grids, patch_rows = [], []
            header: list = []
            for _, patches, grid in images:
                t, h, w = grid
                n = t * (h // merge) * (w // merge)
                header += [m.vision_start_token_id] \
                    + [m.image_token_id] * n + [m.vision_end_token_id]
                grids.append(grid)
                patch_rows.append(patches)
            with self._lock:
                return m.generate(
                    [header + list(ids)],
                    images=_np.concatenate(patch_rows, axis=0),
                    grids=grids, sampling_params=params,
                    tokenizer=self.tokenizer)[0]
        with self._lock:
            return self.model.generate(
                [prompt], images=[images], sampling_params=params,
                tokenizer=self.tokenizer)[0]

    @staticmethod
    def _stop_list(body) -> list:
        stop = body.get("stop") or body.get("stop_sequences") or []
        return [stop] if isinstance(stop, str) else list(stop)

    @staticmethod
    def _apply_stop(text: str, stops: list) -> str:
        """OpenAI `stop` semantics: truncate at the first occurrence of
        any stop string (the stop itself is not returned)."""
        for s in stops:
            i = text.find(s)
            if i >= 0:
                text = text[:i]
        return text

    def _chat_prompt_params(self, body):
        prompt = self._render(
            self._normalize_tool_messages(body["messages"]),
            tools=body.get("tools"))
        params = SamplingParams(
            max_tokens=int(body.get("max_tokens",
                                    body.get("max_completion_tokens", 256))),
            temperature=float(body.get("temperature", 0.7)),
            top_p=float(body.get("top_p", 1.0)),
            seed=int(body.get("seed", 0)),
        )
        return prompt, params

    @staticmethod
    def _anthropic_tools(body):
        """Anthropic tool schema ({name, description, input_schema}) ->
        the OpenAI function shape chat templates consume."""
        return [{"type": "function",
                 "function": {"name": t.get("name"),
                              "description": t.get("description", ""),
                              "parameters": t.get("input_schema", {})}}
                for t in body.get("tools", [])] or None

    def _anthropic_prompt_params(self, body):
        messages = self._normalize_tool_messages(
            list(body.get("messages", [])))
        if body.get("system"):
            messages = [{"role": "system", "content": body["system"]}] \
                + messages
        norm = []
        for m in messages:
            c = m["content"]
            if isinstance(c, list):
                c = "".join(b.get("text", "") for b in c
                            if b.get("type") == "text")
            norm.append({"role": m["role"], "content": c})
        prompt = self._render(norm, tools=self._anthropic_tools(body))
        params = SamplingParams(
            max_tokens=int(body.get("max_tokens", 256)),
            temperature=float(body.get("temperature", 0.7)),
        )
        return prompt, params

    def chat_completion(self, body: Dict[str, Any]) -> Dict[str, Any]:
        messages = self._normalize_tool_messages(body["messages"])
        body = {**body, "messages": messages}
        if any(isinstance(m.get("content"), list) for m in messages):
            norm, images = self._split_multimodal(messages)
            prompt, params = self._chat_prompt_params(
                {**body, "messages": norm})
            text = self._gen_multimodal(norm, images, params)
        else:
            prompt, params = self._chat_prompt_params(body)
            text = self._gen_text(prompt, params,
                                  lora=self._resolve_lora(body))
        text = self._apply_stop(text, self._stop_list(body))
        message: Dict[str, Any] = {"role": "assistant", "content": text}
        finish = "stop"
        if body.get("tools") and body.get("tool_choice") != "none":
            calls, rest = self._parse_tool_calls(text)
            if calls:
                message = {
                    "role": "assistant",
                    "content": rest or None,
                    "tool_calls": [{
                        "id": f"call_{uuid.uuid4().hex[:12]}",
                        "type": "function",
                        "function": {"name": c["name"],
                                     "arguments": json.dumps(
                                         c["arguments"])},
                    } for c in calls],
                }
                finish = "tool_calls"
        n_prompt = len(self.tokenizer(prompt)["input_ids"])
        n_out = len(self.tokenizer(text)["input_ids"])
        return {
            "id": f"chatcmpl-{uuid.uuid4().hex[:16]}",
            "object": "chat.completion",
            "created": int(time.time()),
            "model": body.get("model", self.model_name),
            "choices": [{
                "index": 0,
                "message": message,
                "finish_reason": finish,
            }],
            "usage": {"prompt_tokens": n_prompt,
                      "completion_tokens": n_out,
                      "total_tokens": n_prompt + n_out},
        }

    def anthropic_messages(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """/v1/messages (Anthropic Messages API shape)."""
        messages = list(body.get("messages", []))
        has_images = any(
            isinstance(m.get("content"), list)
            and any(b.get("type") == "image" for b in m["content"])
            for m in messages)
        prompt, params = self._anthropic_prompt_params(body)
        if has_images and hasattr(self.model, "embed_multimodal"):
            if body.get("system"):
                messages = [{"role": "system",
                             "content": body["system"]}] + messages
            norm, images = self._split_multimodal(messages)
            text = self._gen_multimodal(norm, images, params)
        else:
            text = self._gen_text(prompt, params,
                                  lora=self._resolve_lora(body))
        text = self._apply_stop(text, self._stop_list(body))
        content: list = [{"type": "text", "text": text}]
        stop_reason = "end_turn"
        if body.get("tools"):
            calls, rest = self._parse_tool_calls(text)
            if calls:
                content = ([{"type": "text", "text": rest}] if rest
                           else [])
                content += [{"type": "tool_use",
                             "id": f"toolu_{uuid.uuid4().hex[:12]}",
                             "name": c["name"],
                             "input": c["arguments"]} for c in calls]
                stop_reason = "tool_use"
        return {
            "id": f"msg_{uuid.uuid4().hex[:16]}",
            "type": "message",
            "role": "assistant",
            "model": body.get("model", self.model_name),
            "content": content,
            "stop_reason": stop_reason,
            "usage": {"input_tokens": len(self.tokenizer(prompt)["input_ids"]),
                      "output_tokens": len(self.tokenizer(text)["input_ids"])},
        }

    def completions(self, body: Dict[str, Any]) -> Dict[str, Any]:
        prompt = body["prompt"]
        if isinstance(prompt, list):
            prompt = prompt[0]
        params = SamplingParams(
            max_tokens=int(body.get("max_tokens", 256)),
            temperature=float(body.get("temperature", 0.7)))
        text = self._apply_stop(
            self._gen_text(prompt, params, lora=self._resolve_lora(body)),
            self._stop_list(body))
        return {
            "id": f"cmpl-{uuid.uuid4().hex[:16]}",
            "object": "text_completion",
            "created": int(time.time()),
            "model": body.get("model", self.model_name),
            "choices": [{"index": 0, "text": text,
                         "finish_reason": "stop"}],
        }

    @staticmethod
    def _responses_messages(body) -> list:
        """OpenAI Responses API `input`/`instructions` -> chat messages.

        `input` is either a bare string (one user turn) or a list of
        role/content items whose content blocks use the Responses block
        types (input_text / output_text / input_image); those are mapped
        onto the chat-completions block types so the multimodal splitter
        applies unchanged. Reference surface: studio
        `core/inference/inference.py` exposes /v1/responses alongside
        /v1/chat/completions.
        """
        messages = []
        if body.get("instructions"):
            messages.append({"role": "system",
                             "content": body["instructions"]})
        inp = body.get("input", "")
        if isinstance(inp, str):
            messages.append({"role": "user", "content": inp})
            return messages
        for item in inp:
            t = item.get("type")
            if t == "function_call":
                messages.append({"role": "assistant", "content":
                                 "<tool_call>" + json.dumps(
                                     {"name": item.get("name"),
                                      "arguments": json.loads(
                                          item.get("arguments") or "{}")})
                                 + "</tool_call>"})
                continue
            if t == "function_call_output":
                messages.append({"role": "tool",
                                 "content": item.get("output", "")})
                continue
            if t not in (None, "message"):
                continue  # other item kinds are not served natively
            content = item.get("content", "")
            if isinstance(content, list):
                blocks = []
                for b in content:
                    t = b.get("type")
                    if t in ("input_text", "output_text", "text"):
                        blocks.append({"type": "text",
                                       "text": b.get("text", "")})
                    elif t == "input_image":
                        blocks.append({"type": "image_url", "image_url":
                                       {"url": b.get("image_url", "")}})
                content = blocks
            messages.append({"role": item.get("role", "user"),
                             "content": content})
        return messages

    def _responses_params(self, body) -> SamplingParams:
        return SamplingParams(
            max_tokens=int(body.get("max_output_tokens", 256)),
            temperature=float(body.get("temperature", 0.7)),
            top_p=float(body.get("top_p", 1.0)),
        )

    @staticmethod
    def _responses_tools(body):
        """Responses API flat tool entries ({type:function, name,
        parameters}) -> the nested chat-template shape."""
        return [{"type": "function",
                 "function": {"name": t.get("name"),
                              "description": t.get("description", ""),
                              "parameters": t.get("parameters", {})}}
                for t in body.get("tools", [])
                if t.get("type", "function") == "function"] or None

    def responses(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """/v1/responses (OpenAI Responses API), non-streaming."""
        messages = self._responses_messages(body)
        params = self._responses_params(body)
        tools = self._responses_tools(body)
        if any(isinstance(m.get("content"), list) for m in messages):
            norm, images = self._split_multimodal(messages)
            prompt = self._render(norm, tools=tools)
            text = self._gen_multimodal(norm, images, params)
        else:
            prompt = self._render(messages, tools=tools)
            text = self._gen_text(prompt, params,
                                  lora=self._resolve_lora(body))
        output: list = []
        output_text = text
        if tools:
            calls, rest = self._parse_tool_calls(text)
            if calls:
                output_text = rest
                output += [{
                    "type": "function_call",
                    "id": f"fc_{uuid.uuid4().hex[:12]}",
                    "call_id": f"call_{uuid.uuid4().hex[:12]}",
                    "name": c["name"],
                    "arguments": json.dumps(c["arguments"]),
                    "status": "completed",
                } for c in calls]
        if output_text or not output:
            output.insert(0, {
                "type": "message",
                "id": f"msg_{uuid.uuid4().hex[:16]}",
                "status": "completed",
                "role": "assistant",
                "content": [{"type": "output_text", "text": output_text,
                             "annotations": []}],
            })
        n_in = len(self.tokenizer(prompt)["input_ids"])
        n_out = len(self.tokenizer(text)["input_ids"])
        return {
            "id": f"resp_{uuid.uuid4().hex[:16]}",
            "object": "response",
            "created_at": int(time.time()),
            "status": "completed",
            "model": body.get("model", self.model_name),
            "output": output,
            "output_text": output_text,
            "usage": {"input_tokens": n_in, "output_tokens": n_out,
                      "total_tokens": n_in + n_out},
        }

    def embeddings(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """/v1/embeddings (OpenAI shape) backed by the embed model
        (a FastSentenceTransformer handle passed as `embed_model`, or
        the served model itself when it has .encode — the reference's
        embedding-model serving goes through its embedder zoo)."""
        target = self.embed_model or (
            self.model if hasattr(self.model, "encode") else None)
        if target is None:
            raise KeyError("no embedding model configured")
        texts = body["input"]
        if isinstance(texts, str):
            texts = [texts]
        with self._lock:
            embs = target.encode(texts)
        return {
            "object": "list",
            "model": body.get("model", self.model_name),
            "data": [{"object": "embedding", "index": i,
                      "embedding": [float(x) for x in e]}
                     for i, e in enumerate(embs)],
            "usage": {"prompt_tokens": sum(len(t) for t in texts),
                      "total_tokens": sum(len(t) for t in texts)},
        }

    def models_list(self) -> Dict[str, Any]:
        data = [{"id": self.model_name, "object": "model",
                 "owned_by": "unsloth_tpu"}]
        data += [{"id": name, "object": "model",
                  "owned_by": "unsloth_tpu", "parent": self.model_name}
                 for name in self.adapters]
        return {"object": "list", "data": data}

    @staticmethod
    def _tools_preamble(tools) -> str:
        """System-turn tool listing for templates without native tools
        support; the call format matches what _parse_tool_calls reads."""
        return (
            "You may call functions. Available tools:\n"
            + json.dumps(tools) +
            '\nTo call one, reply with <tool_call>{"name": <name>, '
            '"arguments": <args-object>}</tool_call>.')

    def _render(self, messages, tools=None) -> str:
        template = getattr(self.tokenizer, "chat_template", None)
        if template:
            if tools and "tools" in template:
                try:
                    return self.tokenizer.apply_chat_template(
                        messages, tools=tools, tokenize=False,
                        add_generation_prompt=True)
                except Exception:  # noqa: BLE001 — template lacks tools
                    pass
            if tools:
                # template ignores the tools kwarg — inject a system
                # preamble so the definitions still reach the model
                messages = [{"role": "system", "content":
                             self._tools_preamble(tools)}] \
                    + list(messages)
            return self.tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
        text = "\n".join(f"{m['role']}: {m['content']}"
                         for m in messages)
        if tools:
            text = self._tools_preamble(tools) + "\n" + text
        return text + "\nassistant:"

    # -- tool calling ----------------------------------------------------

    @staticmethod
    def _parse_tool_calls(text: str):
        """Extract model-emitted tool calls. Handles the two formats the
        catalogued templates produce: `<tool_call>{json}</tool_call>`
        blocks (qwen/chatml-tools, llama-3.1 json) and a bare top-level
        JSON object with "name" + "arguments"/"parameters". Returns
        (calls, remaining_text); calls = [{"name", "arguments": dict}].
        """
        calls = []
        remaining = text
        start = 0
        while True:
            i = remaining.find("<tool_call>", start)
            if i < 0:
                break
            j = remaining.find("</tool_call>", i)
            if j < 0:
                break
            blob = remaining[i + len("<tool_call>"):j].strip()
            try:
                obj = json.loads(blob)
                calls.append({"name": obj["name"],
                              "arguments": obj.get("arguments",
                                                   obj.get("parameters",
                                                           {}))})
            except (json.JSONDecodeError, KeyError):
                pass
            remaining = remaining[:i] + remaining[j + len("</tool_call>"):]
            start = i
        if not calls:
            stripped = text.strip()
            if stripped.startswith("{") and stripped.endswith("}"):
                try:
                    obj = json.loads(stripped)
                    if "name" in obj and ("arguments" in obj
                                          or "parameters" in obj):
                        calls.append({
                            "name": obj["name"],
                            "arguments": obj.get("arguments",
                                                 obj.get("parameters",
                                                         {}))})
                        remaining = ""
                except json.JSONDecodeError:
                    pass
        return calls, remaining.strip()

    @staticmethod
    def _normalize_tool_messages(messages) -> list:
        """Fold OpenAI tool-protocol messages (assistant tool_calls,
        role:"tool" results) and Anthropic tool_use/tool_result blocks
        into plain renderable turns for templates without native tool
        roles."""
        norm = []
        for m in messages:
            role = m.get("role")
            content = m.get("content")
            if role == "assistant" and m.get("tool_calls"):
                parts = [content] if isinstance(content, str) and content \
                    else []
                for tc in m["tool_calls"]:
                    fn = tc.get("function", tc)
                    args = fn.get("arguments")
                    if isinstance(args, str):  # OpenAI wire format
                        try:
                            args = json.loads(args)
                        except json.JSONDecodeError:
                            pass
                    parts.append("<tool_call>" + json.dumps(
                        {"name": fn.get("name"), "arguments": args}) +
                        "</tool_call>")
                norm.append({"role": "assistant",
                             "content": "\n".join(parts)})
            elif role == "tool":
                norm.append({"role": "tool",
                             "content": content if isinstance(content, str)
                             else json.dumps(content)})
            elif isinstance(content, list) and any(
                    b.get("type") in ("tool_use", "tool_result")
                    for b in content):
                texts = []
                for b in content:
                    t = b.get("type")
                    if t == "text":
                        texts.append(b.get("text", ""))
                    elif t == "tool_use":
                        texts.append("<tool_call>" + json.dumps(
                            {"name": b.get("name"),
                             "arguments": b.get("input", {})}) +
                            "</tool_call>")
                    elif t == "tool_result":
                        rc = b.get("content")
                        if isinstance(rc, list):
                            rc = "".join(x.get("text", "") for x in rc)
                        texts.append(str(rc))
                norm.append({"role": role, "content": "\n".join(texts)})
            else:
                norm.append(m)
        return norm

    # -- HTTP plumbing ---------------------------------------------------

    def make_handler(server):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _send(self, code: int, payload: Dict[str, Any]):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _sse_start(self):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "close")
                self.end_headers()

            def _sse(self, payload, event=None):
                if event is not None:
                    self.wfile.write(f"event: {event}\n".encode())
                data = payload if isinstance(payload, str) \
                    else json.dumps(payload)
                self.wfile.write(f"data: {data}\n\n".encode())
                self.wfile.flush()

            def _stream_chat(self, body):
                prompt, params = server._chat_prompt_params(body)
                rid = f"chatcmpl-{uuid.uuid4().hex[:16]}"
                base = {"id": rid, "object": "chat.completion.chunk",
                        "created": int(time.time()),
                        "model": body.get("model", server.model_name)}
                self._sse_start()
                self._sse({**base, "choices": [{
                    "index": 0, "delta": {"role": "assistant",
                                          "content": ""},
                    "finish_reason": None}]})
                if body.get("tools") and body.get("tool_choice") != "none":
                    # buffered: tool-call markup must be parsed whole
                    text = "".join(server._gen_stream(
                        prompt, params,
                        lora=server._resolve_lora(body)))
                    calls, rest = server._parse_tool_calls(text)
                    if calls:
                        if rest:
                            self._sse({**base, "choices": [{
                                "index": 0, "delta": {"content": rest},
                                "finish_reason": None}]})
                        for i, c in enumerate(calls):
                            self._sse({**base, "choices": [{
                                "index": 0, "delta": {"tool_calls": [{
                                    "index": i,
                                    "id": f"call_{uuid.uuid4().hex[:12]}",
                                    "type": "function",
                                    "function": {
                                        "name": c["name"],
                                        "arguments": json.dumps(
                                            c["arguments"])}}]},
                                "finish_reason": None}]})
                        self._sse({**base, "choices": [{
                            "index": 0, "delta": {},
                            "finish_reason": "tool_calls"}]})
                        self._sse("[DONE]")
                        return
                    if text:
                        self._sse({**base, "choices": [{
                            "index": 0, "delta": {"content": text},
                            "finish_reason": None}]})
                else:
                    for delta in server._gen_stream(
                            prompt, params,
                            lora=server._resolve_lora(body)):
                        self._sse({**base, "choices": [{
                            "index": 0, "delta": {"content": delta},
                            "finish_reason": None}]})
                self._sse({**base, "choices": [{
                    "index": 0, "delta": {}, "finish_reason": "stop"}]})
                self._sse("[DONE]")

            def _stream_completions(self, body):
                prompt = body["prompt"]
                if isinstance(prompt, list):
                    prompt = prompt[0]
                params = SamplingParams(
                    max_tokens=int(body.get("max_tokens", 256)),
                    temperature=float(body.get("temperature", 0.7)))
                base = {"id": f"cmpl-{uuid.uuid4().hex[:16]}",
                        "object": "text_completion",
                        "created": int(time.time()),
                        "model": body.get("model", server.model_name)}
                self._sse_start()
                for delta in server._gen_stream(
                        prompt, params,
                        lora=server._resolve_lora(body)):
                    self._sse({**base, "choices": [{
                        "index": 0, "text": delta,
                        "finish_reason": None}]})
                self._sse({**base, "choices": [{
                    "index": 0, "text": "", "finish_reason": "stop"}]})
                self._sse("[DONE]")

            def _stream_responses(self, body):
                """Responses API streaming event sequence
                (response.created .. response.output_text.delta ..
                response.completed)."""
                messages = server._responses_messages(body)
                params = server._responses_params(body)
                prompt = server._render(messages)
                rid = f"resp_{uuid.uuid4().hex[:16]}"
                mid = f"msg_{uuid.uuid4().hex[:16]}"
                shell = {"id": rid, "object": "response",
                         "created_at": int(time.time()),
                         "model": body.get("model", server.model_name)}
                self._sse_start()
                self._sse({"type": "response.created",
                           "response": {**shell, "status": "in_progress",
                                        "output": []}},
                          event="response.created")
                self._sse({"type": "response.output_item.added",
                           "output_index": 0,
                           "item": {"type": "message", "id": mid,
                                    "status": "in_progress",
                                    "role": "assistant", "content": []}},
                          event="response.output_item.added")
                text = ""
                for delta in server._gen_stream(
                        prompt, params,
                        lora=server._resolve_lora(body)):
                    text += delta
                    self._sse({"type": "response.output_text.delta",
                               "item_id": mid, "output_index": 0,
                               "content_index": 0, "delta": delta},
                              event="response.output_text.delta")
                self._sse({"type": "response.output_text.done",
                           "item_id": mid, "output_index": 0,
                           "content_index": 0, "text": text},
                          event="response.output_text.done")
                n_in = len(server.tokenizer(prompt)["input_ids"])
                n_out = len(server.tokenizer(text)["input_ids"])
                self._sse({"type": "response.completed", "response": {
                    **shell, "status": "completed",
                    "output": [{"type": "message", "id": mid,
                                "status": "completed",
                                "role": "assistant",
                                "content": [{"type": "output_text",
                                             "text": text,
                                             "annotations": []}]}],
                    "usage": {"input_tokens": n_in,
                              "output_tokens": n_out,
                              "total_tokens": n_in + n_out}}},
                          event="response.completed")

            def _stream_anthropic(self, body):
                """Anthropic Messages streaming event sequence
                (message_start .. content_block_delta .. message_stop),
                the shape `unsloth start claude` clients consume."""
                prompt, params = server._anthropic_prompt_params(body)
                mid = f"msg_{uuid.uuid4().hex[:16]}"
                self._sse_start()
                self._sse({"type": "message_start", "message": {
                    "id": mid, "type": "message", "role": "assistant",
                    "model": body.get("model", server.model_name),
                    "content": [],
                    "usage": {"input_tokens": len(
                        server.tokenizer(prompt)["input_ids"]),
                        "output_tokens": 0}}}, event="message_start")
                n_out = 0
                if body.get("tools"):
                    # buffered: tool-call markup must be parsed whole
                    text = "".join(server._gen_stream(
                        prompt, params,
                        lora=server._resolve_lora(body)))
                    n_out = len(server.tokenizer(text)["input_ids"])
                    calls, rest = server._parse_tool_calls(text)
                    idx = 0
                    if rest or not calls:
                        self._sse({"type": "content_block_start",
                                   "index": idx,
                                   "content_block": {"type": "text",
                                                     "text": ""}},
                                  event="content_block_start")
                        self._sse({"type": "content_block_delta",
                                   "index": idx,
                                   "delta": {"type": "text_delta",
                                             "text": rest if calls
                                             else text}},
                                  event="content_block_delta")
                        self._sse({"type": "content_block_stop",
                                   "index": idx},
                                  event="content_block_stop")
                        idx += 1
                    for c in calls:
                        self._sse({"type": "content_block_start",
                                   "index": idx, "content_block": {
                                       "type": "tool_use",
                                       "id": f"toolu_"
                                             f"{uuid.uuid4().hex[:12]}",
                                       "name": c["name"], "input": {}}},
                                  event="content_block_start")
                        self._sse({"type": "content_block_delta",
                                   "index": idx, "delta": {
                                       "type": "input_json_delta",
                                       "partial_json": json.dumps(
                                           c["arguments"])}},
                                  event="content_block_delta")
                        self._sse({"type": "content_block_stop",
                                   "index": idx},
                                  event="content_block_stop")
                        idx += 1
                    stop_reason = "tool_use" if calls else "end_turn"
                else:
                    self._sse({"type": "content_block_start", "index": 0,
                               "content_block": {"type": "text",
                                                 "text": ""}},
                              event="content_block_start")
                    for delta in server._gen_stream(
                            prompt, params,
                            lora=server._resolve_lora(body)):
                        n_out += len(server.tokenizer(delta)["input_ids"])
                        self._sse({"type": "content_block_delta",
                                   "index": 0,
                                   "delta": {"type": "text_delta",
                                             "text": delta}},
                                  event="content_block_delta")
                    self._sse({"type": "content_block_stop", "index": 0},
                              event="content_block_stop")
                    stop_reason = "end_turn"
                self._sse({"type": "message_delta",
                           "delta": {"stop_reason": stop_reason,
                                     "stop_sequence": None},
                           "usage": {"output_tokens": n_out}},
                          event="message_delta")
                self._sse({"type": "message_stop"}, event="message_stop")

            def do_GET(self):
                if self.path == "/v1/models":
                    return self._send(200, server.models_list())
                if self.path == "/health":
                    return self._send(200, {"status": "ok"})
                return self._send(404, {"error": "not found"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    return self._send(400, {"error": {
                        "message": "invalid JSON body"}})
                try:
                    stream = bool(body.get("stream"))
                    if self.path == "/v1/chat/completions":
                        if stream:
                            return self._stream_chat(body)
                        return self._send(200, server.chat_completion(body))
                    if self.path == "/v1/messages":
                        if stream:
                            return self._stream_anthropic(body)
                        return self._send(200,
                                          server.anthropic_messages(body))
                    if self.path == "/v1/completions":
                        if stream:
                            return self._stream_completions(body)
                        return self._send(200, server.completions(body))
                    if self.path == "/v1/responses":
                        if stream:
                            return self._stream_responses(body)
                        return self._send(200, server.responses(body))
                    if self.path == "/v1/embeddings":
                        return self._send(200, server.embeddings(body))
                    return self._send(404, {"error": "not found"})
                except KeyError as e:
                    return self._send(400, {"error": {
                        "message": f"missing field: {e}"}})
                except Exception as e:  # noqa: BLE001
                    return self._send(500, {"error": {
                        "message": f"{type(e).__name__}: {e}"}})

        return Handler

    def serve(self, host: str = "127.0.0.1", port: int = 8000,
              background: bool = False):
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        if background:
            thread = threading.Thread(target=httpd.serve_forever,
                                      daemon=True)
            thread.start()
            return httpd
        httpd.serve_forever()
