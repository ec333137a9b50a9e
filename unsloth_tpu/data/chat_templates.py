"""Chat template registry.

Parity target: reference unsloth/chat_templates.py — a registry of named
templates each pairing a jinja chat_template with stop tokens and an Ollama
modelfile template (`get_chat_template` :1890, `standardize_sharegpt` ~:2200,
`to_sharegpt` :2291, `apply_chat_template` :2826). The template strings
below are written from the public, well-known prompt formats of each model
family (they are format specs, not code).

Usage parity:
    tokenizer = get_chat_template(tokenizer, chat_template="llama-3.1")
    text = tokenizer.apply_chat_template(messages, tokenize=False)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional


@dataclasses.dataclass(frozen=True)
class ChatTemplate:
    name: str
    jinja: str
    eos_token: str                     # token that ends an assistant turn
    stop_word: str                     # generation stopper
    default_system: Optional[str] = None
    # marker pair for train_on_responses_only
    instruction_part: Optional[str] = None
    response_part: Optional[str] = None
    # Ollama TEMPLATE string for export (reference pairs each template
    # with one: chat_templates.py + ollama_template_mappers.py)
    ollama: Optional[str] = None


_REGISTRY: Dict[str, ChatTemplate] = {}


def register(t: ChatTemplate, *aliases: str):
    _REGISTRY[t.name] = t
    for a in aliases:
        _REGISTRY[a] = t


# ---------------------------------------------------------------------------
# ChatML (qwen, many others)
# ---------------------------------------------------------------------------

_CHATML_JINJA = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
    "{% endif %}"
)

register(ChatTemplate(
    name="chatml",
    jinja=_CHATML_JINJA,
    eos_token="<|im_end|>",
    stop_word="<|im_end|>",
    instruction_part="<|im_start|>user\n",
    response_part="<|im_start|>assistant\n",
    ollama=("{{ if .System }}<|im_start|>system\n{{ .System }}<|im_end|>\n"
            "{{ end }}{{ if .Prompt }}<|im_start|>user\n{{ .Prompt }}"
            "<|im_end|>\n{{ end }}<|im_start|>assistant\n{{ .Response }}"
            "<|im_end|>\n"),
), "qwen-2.5", "qwen2.5", "qwen-3", "qwen3")


# ---------------------------------------------------------------------------
# Llama-3 family
# ---------------------------------------------------------------------------

_LLAMA3_JINJA = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{{ '<|start_header_id|>' + message['role'] + '<|end_header_id|>\n\n' "
    "+ message['content'] | trim + '<|eot_id|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}"
    "{% endif %}"
)

register(ChatTemplate(
    name="llama-3",
    jinja=_LLAMA3_JINJA,
    eos_token="<|eot_id|>",
    stop_word="<|eot_id|>",
    instruction_part="<|start_header_id|>user<|end_header_id|>\n\n",
    response_part="<|start_header_id|>assistant<|end_header_id|>\n\n",
    ollama=("{{ if .System }}<|start_header_id|>system<|end_header_id|>\n\n"
            "{{ .System }}<|eot_id|>{{ end }}{{ if .Prompt }}"
            "<|start_header_id|>user<|end_header_id|>\n\n{{ .Prompt }}"
            "<|eot_id|>{{ end }}<|start_header_id|>assistant"
            "<|end_header_id|>\n\n{{ .Response }}<|eot_id|>"),
), "llama-3.1", "llama-31", "llama3", "llama-3.2", "llama-3.3")


# ---------------------------------------------------------------------------
# Llama-2 chat
# ---------------------------------------------------------------------------

_LLAMA2_JINJA = (
    "{% if messages[0]['role'] == 'system' %}"
    "{% set system_message = messages[0]['content'] %}"
    "{% set loop_messages = messages[1:] %}"
    "{% else %}{% set system_message = none %}"
    "{% set loop_messages = messages %}{% endif %}"
    "{% for message in loop_messages %}"
    "{% if message['role'] == 'user' %}"
    "{% if loop.index0 == 0 and system_message %}"
    "{{ bos_token + '[INST] <<SYS>>\n' + system_message + '\n<</SYS>>\n\n' "
    "+ message['content'] + ' [/INST]' }}"
    "{% else %}{{ bos_token + '[INST] ' + message['content'] + ' [/INST]' }}"
    "{% endif %}"
    "{% else %}{{ ' ' + message['content'] + ' ' + eos_token }}"
    "{% endif %}{% endfor %}"
)

register(ChatTemplate(
    name="llama-2",
    jinja=_LLAMA2_JINJA,
    eos_token="</s>",
    stop_word="</s>",
    instruction_part="[INST]",
    response_part="[/INST]",
), "llama", "llama2")


# ---------------------------------------------------------------------------
# Gemma family
# ---------------------------------------------------------------------------

_GEMMA_JINJA = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{% set role = 'model' if message['role'] == 'assistant' "
    "else message['role'] %}"
    "{{ '<start_of_turn>' + role + '\n' + message['content'] | trim "
    "+ '<end_of_turn>\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<start_of_turn>model\n' }}"
    "{% endif %}"
)

register(ChatTemplate(
    name="gemma",
    jinja=_GEMMA_JINJA,
    eos_token="<end_of_turn>",
    stop_word="<end_of_turn>",
    instruction_part="<start_of_turn>user\n",
    response_part="<start_of_turn>model\n",
    ollama=("{{ if .System }}<start_of_turn>user\n{{ .System }} {{ end }}"
            "{{ if .Prompt }}{{ .Prompt }}{{ end }}<end_of_turn>\n"
            "<start_of_turn>model\n{{ .Response }}<end_of_turn>\n"),
), "gemma-2", "gemma2", "gemma-3", "gemma3", "gemma-3n", "gemma3n")


# ---------------------------------------------------------------------------
# Mistral instruct
# ---------------------------------------------------------------------------

_MISTRAL_JINJA = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{% if message['role'] == 'user' %}"
    "{{ '[INST] ' + message['content'] + ' [/INST]' }}"
    "{% elif message['role'] == 'assistant' %}"
    "{{ message['content'] + eos_token }}"
    "{% endif %}{% endfor %}"
)

register(ChatTemplate(
    name="mistral",
    jinja=_MISTRAL_JINJA,
    eos_token="</s>",
    stop_word="</s>",
    instruction_part="[INST]",
    response_part="[/INST]",
), "mistral-nemo", "ministral")


# ---------------------------------------------------------------------------
# Phi
# ---------------------------------------------------------------------------

_PHI4_JINJA = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '<|im_sep|>' "
    "+ message['content'] + '<|im_end|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|im_start|>assistant<|im_sep|>' }}{% endif %}"
)

register(ChatTemplate(
    name="phi-4",
    jinja=_PHI4_JINJA,
    eos_token="<|im_end|>",
    stop_word="<|im_end|>",
    instruction_part="<|im_start|>user<|im_sep|>",
    response_part="<|im_start|>assistant<|im_sep|>",
), "phi4")

_PHI3_JINJA = (
    "{% for message in messages %}"
    "{{ '<|' + message['role'] + '|>\n' + message['content'] "
    "+ '<|end|>\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|assistant|>\n' }}{% endif %}"
)

register(ChatTemplate(
    name="phi-3",
    jinja=_PHI3_JINJA,
    eos_token="<|end|>",
    stop_word="<|end|>",
    instruction_part="<|user|>\n",
    response_part="<|assistant|>\n",
), "phi-3.5", "phi-35", "phi3")


# ---------------------------------------------------------------------------
# Zephyr
# ---------------------------------------------------------------------------

_ZEPHYR_JINJA = (
    "{% for message in messages %}"
    "{{ '<|' + message['role'] + '|>\n' + message['content'] "
    "+ eos_token + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|assistant|>\n' }}{% endif %}"
)

register(ChatTemplate(
    name="zephyr",
    jinja=_ZEPHYR_JINJA,
    eos_token="</s>",
    stop_word="</s>",
    instruction_part="<|user|>\n",
    response_part="<|assistant|>\n",
))


# ---------------------------------------------------------------------------
# Alpaca / Vicuna (instruct formats as chat templates)
# ---------------------------------------------------------------------------

_ALPACA_JINJA = (
    "{{ bos_token }}"
    "{% if messages[0]['role'] == 'system' %}"
    "{{ messages[0]['content'] + '\n\n' }}"
    "{% set loop_messages = messages[1:] %}"
    "{% else %}"
    "{{ 'Below are some instructions that describe some tasks. Write "
    "responses that appropriately complete each request.\n\n' }}"
    "{% set loop_messages = messages %}{% endif %}"
    "{% for message in loop_messages %}"
    "{% if message['role'] == 'user' %}"
    "{{ '### Instruction:\n' + message['content'] + '\n\n' }}"
    "{% else %}{{ '### Response:\n' + message['content'] + eos_token "
    "+ '\n\n' }}"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}{{ '### Response:\n' }}{% endif %}"
)

register(ChatTemplate(
    name="alpaca",
    jinja=_ALPACA_JINJA,
    eos_token="</s>",
    stop_word="###",
    instruction_part="### Instruction:\n",
    response_part="### Response:\n",
))

_VICUNA_JINJA = (
    "{{ bos_token }}"
    "{% if messages[0]['role'] == 'system' %}"
    "{{ messages[0]['content'] + ' ' }}"
    "{% set loop_messages = messages[1:] %}"
    "{% else %}"
    "{{ 'A chat between a curious user and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite answers "
    "to the user\\'s questions. ' }}"
    "{% set loop_messages = messages %}{% endif %}"
    "{% for message in loop_messages %}"
    "{% if message['role'] == 'user' %}"
    "{{ 'USER: ' + message['content'] + ' ' }}"
    "{% else %}{{ 'ASSISTANT: ' + message['content'] + eos_token }}"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}{{ 'ASSISTANT:' }}{% endif %}"
)

register(ChatTemplate(
    name="vicuna",
    jinja=_VICUNA_JINJA,
    eos_token="</s>",
    stop_word="</s>",
    instruction_part="USER:",
    response_part="ASSISTANT:",
))


# ---------------------------------------------------------------------------
# gpt-oss (harmony format, simplified text form)
# ---------------------------------------------------------------------------

_GPT_OSS_JINJA = (
    "{% for message in messages %}"
    "{{ '<|start|>' + message['role'] + '<|message|>' "
    "+ message['content'] + '<|end|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start|>assistant' }}{% endif %}"
)

register(ChatTemplate(
    name="gpt-oss",
    jinja=_GPT_OSS_JINJA,
    eos_token="<|end|>",
    stop_word="<|end|>",
    instruction_part="<|start|>user<|message|>",
    response_part="<|start|>assistant",
), "gpt_oss", "harmony")


# ---------------------------------------------------------------------------
# DeepSeek (V3 / R1)
# ---------------------------------------------------------------------------

_DEEPSEEK_JINJA = (
    "{{ bos_token }}"
    "{% if messages[0]['role'] == 'system' %}{{ messages[0]['content'] }}"
    "{% set loop_messages = messages[1:] %}"
    "{% else %}{% set loop_messages = messages %}{% endif %}"
    "{% for message in loop_messages %}"
    "{% if message['role'] == 'user' %}"
    "{{ '<｜User｜>' + message['content'] }}"
    "{% else %}{{ '<｜Assistant｜>' + message['content'] "
    "+ '<｜end▁of▁sentence｜>' }}"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<｜Assistant｜>' }}"
    "{% endif %}"
)

register(ChatTemplate(
    name="deepseek-r1",
    jinja=_DEEPSEEK_JINJA,
    eos_token="<｜end▁of▁sentence｜>",
    stop_word="<｜end▁of▁sentence｜>",
    instruction_part="<｜User｜>",
    response_part="<｜Assistant｜>",
), "deepseek", "deepseek-v3")


# ---------------------------------------------------------------------------
# Granite 3
# ---------------------------------------------------------------------------

_GRANITE_JINJA = (
    "{% for message in messages %}"
    "{{ '<|start_of_role|>' + message['role'] + '<|end_of_role|>' "
    "+ message['content'] + '<|end_of_text|>\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_of_role|>assistant<|end_of_role|>' }}{% endif %}"
)

register(ChatTemplate(
    name="granite",
    jinja=_GRANITE_JINJA,
    eos_token="<|end_of_text|>",
    stop_word="<|end_of_text|>",
    instruction_part="<|start_of_role|>user<|end_of_role|>",
    response_part="<|start_of_role|>assistant<|end_of_role|>",
), "granite-3", "granite3")


# ---------------------------------------------------------------------------
# Llama-4
# ---------------------------------------------------------------------------

_LLAMA4_JINJA = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{{ '<|header_start|>' + message['role'] + '<|header_end|>\n\n' "
    "+ message['content'] | trim + '<|eot|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|header_start|>assistant<|header_end|>\n\n' }}{% endif %}"
)

register(ChatTemplate(
    name="llama-4",
    jinja=_LLAMA4_JINJA,
    eos_token="<|eot|>",
    stop_word="<|eot|>",
    instruction_part="<|header_start|>user<|header_end|>\n\n",
    response_part="<|header_start|>assistant<|header_end|>\n\n",
), "llama4")


# ---------------------------------------------------------------------------
# Command-R (cohere)
# ---------------------------------------------------------------------------

_COMMAND_R_JINJA = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{% set role = {'user': '<|USER_TOKEN|>', 'system': "
    "'<|SYSTEM_TOKEN|>', 'assistant': '<|CHATBOT_TOKEN|>'}"
    "[message['role']] %}"
    "{{ '<|START_OF_TURN_TOKEN|>' + role + message['content'] "
    "+ '<|END_OF_TURN_TOKEN|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>' }}{% endif %}"
)

register(ChatTemplate(
    name="command-r",
    jinja=_COMMAND_R_JINJA,
    eos_token="<|END_OF_TURN_TOKEN|>",
    stop_word="<|END_OF_TURN_TOKEN|>",
    instruction_part="<|START_OF_TURN_TOKEN|><|USER_TOKEN|>",
    response_part="<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>",
), "cohere", "aya")


# ---------------------------------------------------------------------------
# Falcon
# ---------------------------------------------------------------------------

_FALCON_JINJA = (
    "{% for message in messages %}"
    "{% if message['role'] == 'user' %}"
    "{{ 'User: ' + message['content'] + '\n' }}"
    "{% elif message['role'] == 'system' %}"
    "{{ message['content'] + '\n' }}"
    "{% else %}{{ 'Falcon: ' + message['content'] + eos_token + '\n' }}"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}{{ 'Falcon:' }}{% endif %}"
)

register(ChatTemplate(
    name="falcon",
    jinja=_FALCON_JINJA,
    eos_token="<|endoftext|>",
    stop_word="User:",
    instruction_part="User:",
    response_part="Falcon:",
), "falcon-h1")


# orpheus TTS and qwen-vl reuse existing formats
register(_REGISTRY["llama-3"], "orpheus")
register(_REGISTRY["chatml"], "qwen-2.5-vl", "qwen2.5-vl", "qwen-vl")


# ---------------------------------------------------------------------------
# Qwen-3 thinking / instruct variants (public qwen3 format: the thinking
# model emits <think>...</think> before the answer; instruct strips it)
# ---------------------------------------------------------------------------

_QWEN3_THINKING_JINJA = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n<think>\n' }}"
    "{% endif %}"
)

register(ChatTemplate(
    name="qwen3-thinking",
    jinja=_QWEN3_THINKING_JINJA,
    eos_token="<|im_end|>",
    stop_word="<|im_end|>",
    instruction_part="<|im_start|>user\n",
    response_part="<|im_start|>assistant\n",
), "qwen-3-thinking")
register(_REGISTRY["chatml"], "qwen3-instruct", "qwen-25", "qwen25")


# ---------------------------------------------------------------------------
# Gemma-4 (follows the gemma turn format; the thinking variant opens a
# thought span after the model turn marker)
# ---------------------------------------------------------------------------

register(_REGISTRY["gemma"], "gemma-4", "gemma4", "gemma_chatml",
         "gemma2_chatml")

_GEMMA4_THINKING_JINJA = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{{ '<start_of_turn>' + (message['role'] == 'assistant' and 'model' "
    "or message['role']) + '\n' + message['content'] | trim "
    "+ '<end_of_turn>\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<start_of_turn>model\n<thinking>\n' }}{% endif %}"
)

register(ChatTemplate(
    name="gemma-4-thinking",
    jinja=_GEMMA4_THINKING_JINJA,
    eos_token="<end_of_turn>",
    stop_word="<end_of_turn>",
    instruction_part="<start_of_turn>user\n",
    response_part="<start_of_turn>model\n",
), "gemma4-thinking")


# ---------------------------------------------------------------------------
# LFM-2 (Liquid; ChatML-like with its own special tokens)
# ---------------------------------------------------------------------------

_LFM2_JINJA = (
    "{{ '<|startoftext|>' }}"
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
    "{% endif %}"
)

register(ChatTemplate(
    name="lfm-2",
    jinja=_LFM2_JINJA,
    eos_token="<|im_end|>",
    stop_word="<|im_end|>",
    instruction_part="<|im_start|>user\n",
    response_part="<|im_start|>assistant\n",
), "lfm-2.5", "lfm2")


# ---------------------------------------------------------------------------
# Starling / OpenChat ("GPT4 Correct" turns)
# ---------------------------------------------------------------------------

_STARLING_JINJA = (
    "{{ bos_token }}"
    "{% for message in messages %}"
    "{% if message['role'] == 'user' %}"
    "{{ 'GPT4 Correct User: ' + message['content'] "
    "+ '<|end_of_turn|>' }}"
    "{% elif message['role'] == 'system' %}"
    "{{ message['content'] + '<|end_of_turn|>' }}"
    "{% else %}"
    "{{ 'GPT4 Correct Assistant: ' + message['content'] "
    "+ '<|end_of_turn|>' }}"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}{{ 'GPT4 Correct Assistant:' }}"
    "{% endif %}"
)

register(ChatTemplate(
    name="starling",
    jinja=_STARLING_JINJA,
    eos_token="<|end_of_turn|>",
    stop_word="<|end_of_turn|>",
    instruction_part="GPT4 Correct User:",
    response_part="GPT4 Correct Assistant:",
), "openchat")


# ---------------------------------------------------------------------------
# Yi-chat (ChatML tokens, no trailing newline before im_end)
# ---------------------------------------------------------------------------

register(_REGISTRY["chatml"], "yi-chat", "yi")


# ---------------------------------------------------------------------------
# Vicuna v0 ("### Human:" / "### Assistant:") — the pre-v1.1 format
# ---------------------------------------------------------------------------

_VICUNA_OLD_JINJA = (
    "{% for message in messages %}"
    "{% if message['role'] == 'system' %}{{ message['content'] + '\n\n' }}"
    "{% elif message['role'] == 'user' %}"
    "{{ '### Human: ' + message['content'] + '\n' }}"
    "{% else %}{{ '### Assistant: ' + message['content'] + eos_token "
    "+ '\n' }}"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}{{ '### Assistant:' }}{% endif %}"
)

register(ChatTemplate(
    name="vicuna_old",
    jinja=_VICUNA_OLD_JINJA,
    eos_token="</s>",
    stop_word="### Human:",
    default_system=("A chat between a curious human and an artificial "
                    "intelligence assistant. The assistant gives helpful, "
                    "detailed, and polite answers to the human's "
                    "questions."),
    instruction_part="### Human:",
    response_part="### Assistant:",
), "vicuna-old")


# ---------------------------------------------------------------------------
# Unsloth's own simple template (reference chat_templates.py "unsloth")
# ---------------------------------------------------------------------------

_UNSLOTH_JINJA = (
    "{% for message in messages %}"
    "{% if message['role'] == 'system' %}{{ message['content'] + '\n' }}"
    "{% elif message['role'] == 'user' %}"
    "{{ '>>> User: ' + message['content'] + '\n' }}"
    "{% else %}{{ '>>> Assistant: ' + message['content'] + eos_token "
    "+ '\n' }}"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}{{ '>>> Assistant: ' }}{% endif %}"
)

register(ChatTemplate(
    name="unsloth",
    jinja=_UNSLOTH_JINJA,
    eos_token="</s>",
    stop_word=">>> User:",
    instruction_part=">>> User:",
    response_part=">>> Assistant:",
))


# gpt-oss extra alias used by the reference registry
register(_REGISTRY["gpt-oss"], "gptoss")
# llama-1-era plain alias
register(_REGISTRY["llama-2"], "llama")


# ---------------------------------------------------------------------------
# API
# ---------------------------------------------------------------------------

CHAT_TEMPLATES = _REGISTRY


def get_template(name: str) -> ChatTemplate:
    key = name.lower()
    if key not in _REGISTRY:
        raise ValueError(
            f"Unknown chat template {name!r}. Available: "
            f"{sorted(set(t.name for t in _REGISTRY.values()))}")
    return _REGISTRY[key]


def get_chat_template(tokenizer, chat_template: str = "chatml",
                      mapping: Optional[Dict[str, str]] = None,
                      map_eos_token: bool = True, **kwargs):
    """Install a named template on a tokenizer
    (reference: chat_templates.py:1890). Returns the tokenizer."""
    t = get_template(chat_template)
    tokenizer.chat_template = t.jinja
    if map_eos_token and t.eos_token and hasattr(tokenizer, "eos_token"):
        try:
            vocab = tokenizer.get_vocab()
            if t.eos_token in vocab:
                tokenizer.eos_token = t.eos_token
        except Exception:
            pass
    tokenizer._unsloth_template = t  # for train_on_responses_only defaults
    return tokenizer


def remove_special_tokens(tokenizer, prompt: str) -> str:
    """Strip a duplicated leading BOS from a rendered prompt (reference:
    chat_templates.py:2173 — templates that bake in the BOS double it
    when the tokenizer adds one too)."""
    bos = getattr(tokenizer, "bos_token", None)
    if bos and prompt.startswith(bos):
        prompt = prompt[len(bos):]
    return prompt


def standardize_sharegpt(dataset):
    """ShareGPT {"conversations": [{"from", "value"}]} ->
    {"messages": [{"role", "content"}]}
    (reference: zoo dataset_utils.standardize_sharegpt)."""
    role_map = {"human": "user", "gpt": "assistant", "system": "system",
                "user": "user", "assistant": "assistant", "tool": "tool"}

    def convert(ex):
        conv = ex.get("conversations") or ex.get("messages") or []
        messages = []
        for turn in conv:
            if "role" in turn:
                role = role_map.get(turn["role"], turn["role"])
                content = turn.get("content", "")
            else:
                role = role_map.get(turn.get("from", "user"), "user")
                content = turn.get("value", "")
            messages.append({"role": role, "content": content})
        return {"messages": messages}

    if hasattr(dataset, "map"):
        cols = [c for c in getattr(dataset, "column_names", [])
                if c != "messages"]
        return dataset.map(convert, remove_columns=cols or None)
    return [convert(ex) for ex in dataset]


def to_sharegpt(dataset, merged_prompt: str, output_column_name: str,
                conversation_extension: int = 1):
    """Merge arbitrary columns into user/assistant conversations
    (reference: chat_templates.py:2291). ``merged_prompt`` uses {column}
    placeholders; [[...{col}...]] sections are dropped when col is empty."""
    import re

    def render(ex):
        text = merged_prompt
        # optional sections
        for m in re.finditer(r"\[\[(.*?)\]\]", text, flags=re.S):
            section = m.group(1)
            cols = re.findall(r"\{(\w+)\}", section)
            keep = all(ex.get(c) for c in cols)
            text = text.replace(m.group(0), section if keep else "")
        for col in re.findall(r"\{(\w+)\}", text):
            text = text.replace("{" + col + "}", str(ex.get(col, "")))
        return {"conversations": [
            {"from": "human", "value": text},
            {"from": "gpt", "value": str(ex.get(output_column_name, ""))},
        ]}

    if hasattr(dataset, "map"):
        return dataset.map(render,
                           remove_columns=dataset.column_names)
    return [render(ex) for ex in dataset]


def apply_chat_template(dataset, tokenizer, chat_template: Optional[str] = None,
                        **kwargs):
    """Format a messages-dataset to text with the tokenizer's template
    (reference: chat_templates.py:2826)."""
    if chat_template is not None:
        tokenizer = get_chat_template(tokenizer, chat_template)

    def fmt(ex):
        return {"text": tokenizer.apply_chat_template(
            ex["messages"], tokenize=False, add_generation_prompt=False)}

    if hasattr(dataset, "map"):
        return dataset.map(fmt)
    return [fmt(ex) for ex in dataset]


def _jinja_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") \
        .replace("\n", "\\n") + "'"


def construct_chat_template(tokenizer=None, chat_template: str = "",
                            default_system_message: Optional[str] = None,
                            name: str = "custom"):
    """Build a jinja chat template + Ollama TEMPLATE from ONE literal
    example containing {SYSTEM} (optional), {INPUT} and {OUTPUT} markers
    (reference: chat_templates.py:2424 construct_chat_template).

    The example `A{SYSTEM}B{INPUT}C{OUTPUT}D` maps to: system turn =
    A + system + (B is the user prefix), user turn = B + content,
    assistant turn = C + content + D; the generation prompt is C.
    Registers the result under `name`, installs it on the tokenizer if
    given, and returns the ChatTemplate."""
    if "{INPUT}" not in chat_template or "{OUTPUT}" not in chat_template:
        raise ValueError("chat_template must contain {INPUT} and {OUTPUT}")
    if chat_template.index("{INPUT}") > chat_template.index("{OUTPUT}"):
        raise ValueError("{INPUT} must come before {OUTPUT}")

    rest = chat_template
    if "{SYSTEM}" in rest:
        sys_prefix, rest = rest.split("{SYSTEM}", 1)
        has_system = True
    else:
        sys_prefix, has_system = "", False
    user_prefix, rest = rest.split("{INPUT}", 1)
    asst_prefix, asst_suffix = rest.split("{OUTPUT}", 1)
    # the assistant suffix is the turn closer (e.g. "<|end|>\n"); when the
    # span between {SYSTEM} and {INPUT} starts with it, that leading piece
    # closes the SYSTEM turn rather than prefixing every user turn
    sys_suffix = ""
    if has_system and asst_suffix and user_prefix.startswith(asst_suffix):
        sys_suffix = asst_suffix
        user_prefix = user_prefix[len(asst_suffix):]

    first_prefix = "" if has_system else sys_prefix
    jinja = (
        "{% for message in messages %}"
        "{% if message['role'] == 'system' %}"
        f"{{{{ {_jinja_str(sys_prefix)} + message['content'] + "
        f"{_jinja_str(sys_suffix)} }}}}"
        "{% elif message['role'] == 'user' %}"
        f"{{{{ {_jinja_str(user_prefix)} + message['content'] }}}}"
        "{% else %}"
        f"{{{{ {_jinja_str(asst_prefix)} + message['content'] + "
        f"{_jinja_str(asst_suffix)} }}}}"
        "{% endif %}{% endfor %}"
        "{% if add_generation_prompt %}"
        f"{{{{ {_jinja_str(asst_prefix)} }}}}{{% endif %}}"
    )
    if has_system and default_system_message:
        jinja = (
            "{% if messages[0]['role'] != 'system' %}"
            f"{{{{ {_jinja_str(sys_prefix + default_system_message
                               + sys_suffix)} }}}}"
            "{% endif %}" + jinja)
    elif first_prefix:
        jinja = f"{{{{ {_jinja_str(first_prefix)} }}}}" + jinja

    ollama = ""
    if has_system:
        ollama += ("{{ if .System }}" + sys_prefix + "{{ .System }}"
                   + sys_suffix + "{{ end }}")
    ollama += ("{{ if .Prompt }}" + user_prefix + "{{ .Prompt }}"
               + "{{ end }}" + asst_prefix + "{{ .Response }}"
               + asst_suffix)

    stop = asst_suffix.strip() or None
    t = ChatTemplate(
        name=name, jinja=jinja,
        eos_token=stop or "", stop_word=stop or "",
        default_system=default_system_message,
        instruction_part=user_prefix or None,
        response_part=asst_prefix or None,
        ollama=ollama)
    register(t)
    if tokenizer is not None:
        tokenizer.chat_template = jinja
        tokenizer._unsloth_template = t
    return t
