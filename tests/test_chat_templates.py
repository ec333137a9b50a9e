"""Chat template tests (reference: chat_templates.py built-in template tests
:2916 — every registered template must render a multi-turn conversation and
carry response markers usable by train_on_responses_only)."""

import pytest

from unsloth_tpu.data.chat_templates import (CHAT_TEMPLATES,
                                             apply_chat_template,
                                             get_chat_template, get_template,
                                             standardize_sharegpt,
                                             to_sharegpt)

MESSAGES = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi there"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
    {"role": "assistant", "content": "Goodbye!"},
]


def _render(t, messages, add_generation_prompt=False):
    import jinja2

    env = jinja2.Environment()
    tmpl = env.from_string(t.jinja)
    return tmpl.render(messages=messages, bos_token="<s>", eos_token="</s>",
                       add_generation_prompt=add_generation_prompt)


@pytest.mark.parametrize("name", sorted(
    {t.name for t in CHAT_TEMPLATES.values()}))
def test_template_renders(name):
    t = get_template(name)
    msgs = MESSAGES if name not in ("mistral", "gemma") else MESSAGES[1:]
    out = _render(t, msgs)
    assert "Hi there" in out
    assert "Hello!" in out
    # all turn content present, in order
    assert out.index("Hi there") < out.index("Hello!") < out.index("Bye")


@pytest.mark.parametrize("name", sorted(
    {t.name for t in CHAT_TEMPLATES.values()}))
def test_generation_prompt_suffix(name):
    t = get_template(name)
    msgs = [{"role": "user", "content": "Q"}]
    without = _render(t, msgs, add_generation_prompt=False)
    with_p = _render(t, msgs, add_generation_prompt=True)
    # [INST]-style formats end in the generation prompt already
    assert len(with_p) >= len(without)
    assert with_p.startswith(without)


@pytest.mark.parametrize("name", sorted(
    {t.name for t in CHAT_TEMPLATES.values()}))
def test_response_markers_present(name):
    """response_part must appear in a rendered conversation exactly once per
    assistant turn, so train_on_responses_only can find spans."""
    t = get_template(name)
    msgs = [{"role": "user", "content": "Q"},
            {"role": "assistant", "content": "A"}]
    out = _render(t, msgs)
    assert t.response_part is not None
    assert t.response_part.strip() in out


def test_unknown_template_errors():
    with pytest.raises(ValueError, match="Unknown chat template"):
        get_template("nope-9000")


def test_llama3_exact_format():
    t = get_template("llama-3.1")
    out = _render(t, [{"role": "user", "content": "Hi"}],
                  add_generation_prompt=True)
    assert out == ("<s><|start_header_id|>user<|end_header_id|>\n\nHi"
                   "<|eot_id|><|start_header_id|>assistant"
                   "<|end_header_id|>\n\n")


def test_chatml_exact_format():
    t = get_template("chatml")
    out = _render(t, [{"role": "user", "content": "Hi"}])
    assert out == "<|im_start|>user\nHi<|im_end|>\n"


def test_gemma_role_mapping():
    t = get_template("gemma")
    out = _render(t, [{"role": "user", "content": "Q"},
                      {"role": "assistant", "content": "A"}])
    assert "<start_of_turn>model" in out
    assert "assistant" not in out


def test_standardize_sharegpt():
    ds = [{"conversations": [
        {"from": "human", "value": "Q"},
        {"from": "gpt", "value": "A"},
    ]}]
    out = standardize_sharegpt(ds)
    assert out[0]["messages"] == [
        {"role": "user", "content": "Q"},
        {"role": "assistant", "content": "A"},
    ]


def test_to_sharegpt_with_optional_sections():
    ds = [
        {"instruction": "Add", "input": "2+2", "output": "4"},
        {"instruction": "Greet", "input": "", "output": "Hi"},
    ]
    out = to_sharegpt(
        ds, merged_prompt="{instruction}[[\nInput: {input}]]",
        output_column_name="output")
    assert out[0]["conversations"][0]["value"] == "Add\nInput: 2+2"
    assert out[1]["conversations"][0]["value"] == "Greet"
    assert out[1]["conversations"][1]["value"] == "Hi"


def test_get_chat_template_with_hf_tokenizer(tmp_path):
    """End-to-end with a real transformers tokenizer object."""
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(c): i for i, c in enumerate(range(32, 127))}
    for tok in ("<|im_start|>", "<|im_end|>", "<unk>"):
        vocab[tok] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>")
    fast = get_chat_template(fast, "chatml")
    text = fast.apply_chat_template(
        [{"role": "user", "content": "Hi"}], tokenize=False,
        add_generation_prompt=True)
    assert text == "<|im_start|>user\nHi<|im_end|>\n<|im_start|>assistant\n"


def test_construct_chat_template_round_trip():
    """construct_chat_template (reference: chat_templates.py:2424): a
    literal example with {SYSTEM}/{INPUT}/{OUTPUT} becomes a jinja
    template that renders multi-turn conversations + an Ollama string."""
    from jinja2 import Template

    from unsloth_tpu.data.chat_templates import construct_chat_template

    t = construct_chat_template(
        chat_template=("<|sys|>{SYSTEM}<|end|>\n<|user|>{INPUT}<|end|>\n"
                       "<|asst|>{OUTPUT}<|end|>\n"),
        default_system_message="be helpful", name="customtest")
    msgs = [{"role": "system", "content": "S"},
            {"role": "user", "content": "U1"},
            {"role": "assistant", "content": "A1"},
            {"role": "user", "content": "U2"}]
    out = Template(t.jinja).render(messages=msgs,
                                   add_generation_prompt=True)
    assert out == ("<|sys|>S<|end|>\n<|user|>U1<|end|>\n"
                   "<|asst|>A1<|end|>\n<|user|>U2<|end|>\n<|asst|>")
    # default system injected when absent
    out2 = Template(t.jinja).render(messages=msgs[1:2],
                                    add_generation_prompt=False)
    assert out2.startswith("<|sys|>be helpful")
    assert "{{ .Response }}" in t.ollama and "{{ .System }}" in t.ollama


def test_top_level_data_api_exports():
    """Reference-parity: the package root exposes the data-layer API
    (reference: unsloth/__init__.py star-imports)."""
    import unsloth_tpu

    for n in ("get_chat_template", "apply_chat_template",
              "standardize_sharegpt", "to_sharegpt",
              "construct_chat_template", "train_on_responses_only",
              "SFTTrainer", "UnslothTrainer", "CHAT_TEMPLATES"):
        assert callable(getattr(unsloth_tpu, n)) or n == "CHAT_TEMPLATES"
