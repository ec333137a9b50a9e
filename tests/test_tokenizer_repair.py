"""Tokenizer auto-repair matrix: deliberately-broken tokenizers, each
repaired (or cleanly reported) by repair_tokenizer / fix_chat_template
(reference: unsloth/tokenizer_utils.py:950-1343 — the repair/validate
cycle the reference runs at load).

Breakage classes covered:
  1. missing pad token
  2. pad == eos with a dedicated pad available
  3. pad_token_id outside the model vocab
  4. eos_token_id outside the model vocab (report, not guess)
  5. jinja chat template that fails to render (syntax error)
  6. template that drops message content
  7. template ignoring add_generation_prompt — trailing-{{expr}} form
  8. template ignoring add_generation_prompt — ends-at-endfor form
  9. broken decode round-trip (reported)
"""

import pytest

transformers = pytest.importorskip("transformers")

from unsloth_tpu.data.tokenizer_utils import (  # noqa: E402
    fix_chat_template,
    repair_tokenizer,
)

CHATML = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def make_tokenizer(pad=None, eos="<|im_end|>", template=CHATML):
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(c): i for i, c in enumerate(range(32, 127))}
    for tok in ("<|im_start|>", "<|im_end|>", "<unk>", "<pad>",
                "<|endoftext|>"):
        vocab[tok] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token=eos,
        pad_token=pad)
    fast.chat_template = template
    return fast


class Cfg:
    def __init__(self, vocab_size):
        self.vocab_size = vocab_size


def test_missing_pad_repaired():
    tok = make_tokenizer(pad=None)
    tok, repairs, problems = repair_tokenizer(tok)
    assert tok.pad_token == "<pad>"
    assert any("was missing" in r for r in repairs)
    assert problems == []


def test_pad_equals_eos_repaired():
    tok = make_tokenizer(pad="<|im_end|>", eos="<|im_end|>")
    tok, repairs, problems = repair_tokenizer(tok)
    assert tok.pad_token == "<pad>"
    assert tok.pad_token != tok.eos_token
    assert any("was eos" in r for r in repairs)
    assert problems == []


def test_pad_id_out_of_model_vocab_reassigned():
    tok = make_tokenizer(pad="<|endoftext|>")
    big_id = tok.pad_token_id
    cfg = Cfg(vocab_size=big_id)  # model head ends right below the pad id
    tok, repairs, problems = repair_tokenizer(tok, model_config=cfg)
    assert tok.pad_token_id < cfg.vocab_size
    assert any("reassigned" in r for r in repairs), repairs


def test_eos_id_out_of_model_vocab_reported():
    tok = make_tokenizer(pad="<pad>")
    cfg = Cfg(vocab_size=tok.eos_token_id)  # eos id sticks out
    tok, repairs, problems = repair_tokenizer(tok, model_config=cfg)
    assert any("eos_token_id" in p for p in problems), problems


def test_jinja_syntax_error_falls_back_to_registry():
    tok = make_tokenizer(pad="<pad>",
                         template="{% for m in messages %}{{ m['content'")
    tok, repairs, problems = repair_tokenizer(
        tok, fallback_template="chatml")
    assert any("registry" in r for r in repairs), (repairs, problems)
    assert problems == []
    out = tok.apply_chat_template(
        [{"role": "user", "content": "Hi"}], tokenize=False,
        add_generation_prompt=True)
    assert out.endswith("<|im_start|>assistant\n")


def test_jinja_syntax_error_reported_without_fallback():
    tok = make_tokenizer(pad="<pad>",
                         template="{% for m in messages %}{{ m['content'")
    tok, repairs, problems = repair_tokenizer(tok)
    assert any("chat_template" in p for p in problems), problems


def test_content_dropping_template_replaced():
    tok = make_tokenizer(pad="<pad>",
                         template="{{ 'static prompt, no messages' }}")
    tok, repairs, problems = repair_tokenizer(
        tok, fallback_template="chatml")
    assert any("registry" in r for r in repairs), (repairs, problems)
    out = tok.apply_chat_template(
        [{"role": "user", "content": "XYZ"}], tokenize=False)
    assert "XYZ" in out


def test_agp_ignored_trailing_expr_repaired():
    """Template always emits the generation prefix — the repaired form
    wraps the trailing {{ expr }} in the add_generation_prompt block
    (reference: tokenizer_utils.py:968 'case 1')."""
    template = (
        "{% for message in messages %}"
        "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
        "+ '<|im_end|>' + '\n' }}"
        "{% endfor %}"
        "{{ '<|im_start|>assistant\n' }}"
    )
    tok = make_tokenizer(pad="<pad>", template=template)
    msgs = [{"role": "user", "content": "hi"}]
    before_no = tok.apply_chat_template(msgs, tokenize=False,
                                        add_generation_prompt=False)
    before_yes = tok.apply_chat_template(msgs, tokenize=False,
                                         add_generation_prompt=True)
    assert before_no == before_yes  # broken: flag ignored
    tok, fixed = fix_chat_template(tok)
    assert fixed
    after_no = tok.apply_chat_template(msgs, tokenize=False,
                                       add_generation_prompt=False)
    after_yes = tok.apply_chat_template(msgs, tokenize=False,
                                        add_generation_prompt=True)
    assert after_yes != after_no
    assert after_yes.startswith(after_no)
    assert after_yes.endswith("<|im_start|>assistant\n")
    assert not after_no.endswith("<|im_start|>assistant\n")


def test_agp_missing_block_injected():
    """Template ends at {% endfor %} with no generation prefix at all —
    repair injects a block whose prefix is derived by render-diff
    (reference: tokenizer_utils.py:982 'case 2', GH#4150)."""
    template = (
        "{% for message in messages %}"
        "{{ '<|im_start|>' + message['role'] + '\n' + message['content'] "
        "+ '<|im_end|>' + '\n' }}"
        "{% endfor %}"
    )
    tok = make_tokenizer(pad="<pad>", template=template)
    tok, fixed = fix_chat_template(tok)
    assert fixed
    msgs = [{"role": "user", "content": "hi"}]
    no = tok.apply_chat_template(msgs, tokenize=False,
                                 add_generation_prompt=False)
    yes = tok.apply_chat_template(msgs, tokenize=False,
                                  add_generation_prompt=True)
    assert yes != no and yes.startswith(no)
    # render-diff derived prefix is the assistant header
    assert yes[len(no):] == "<|im_start|>assistant\n"


def test_healthy_template_untouched():
    tok = make_tokenizer(pad="<pad>")
    before = tok.chat_template
    tok, repairs, problems = repair_tokenizer(tok)
    assert tok.chat_template == before
    assert repairs == [] and problems == []


def test_broken_round_trip_reported():
    class Broken:
        pad_token = "<pad>"
        eos_token = "</s>"
        pad_token_id = 1
        eos_token_id = 2
        chat_template = None

        def get_vocab(self):
            return {"<pad>": 1, "</s>": 2, "hello": 3, "world": 4}

        def __call__(self, text, **kw):
            return {"input_ids": [3, 4]}

        def decode(self, ids, **kw):
            return "garbage"

    tok, repairs, problems = repair_tokenizer(Broken())
    assert any("round-trip" in p for p in problems), problems


def test_repair_is_idempotent():
    """Running the loop twice changes nothing the second time."""
    tok = make_tokenizer(pad=None)
    tok, repairs1, _ = repair_tokenizer(tok)
    tok, repairs2, problems2 = repair_tokenizer(tok)
    assert repairs1 and repairs2 == [] and problems2 == []
