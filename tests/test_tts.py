"""Orpheus TTS pipeline tests (reference: studio trainer.py:1537-1726
SNAC preprocessing semantics) + an end-to-end tiny TTS SFT run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.data.tts import (ORPHEUS_TOKENS, OrpheusTokens,
                                  dedup_frames, format_orpheus_example,
                                  interleave_snac_codes,
                                  prepare_tts_dataset,
                                  split_orpheus_output)


class ToyTok:
    def encode(self, text, add_special_tokens=True):
        return [1] + [ord(c) % 100 + 2 for c in text]


def _layers(n_frames, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 4096, n_frames).tolist(),
            rng.randint(0, 4096, 2 * n_frames).tolist(),
            rng.randint(0, 4096, 4 * n_frames).tolist()]


def test_interleave_offsets_and_order():
    l0 = [10, 20]
    l1 = [1, 2, 3, 4]
    l2 = [100, 101, 102, 103, 104, 105, 106, 107]
    codes = interleave_snac_codes([l0, l1, l2])
    off = ORPHEUS_TOKENS.audio_offset
    # frame 0: l0[0], l1[0]+4096, l2[0]+2*4096, l2[1]+3*4096,
    #          l1[1]+4*4096, l2[2]+5*4096, l2[3]+6*4096
    assert codes[:7] == [10 + off, 1 + off + 4096, 100 + off + 8192,
                         101 + off + 12288, 2 + off + 16384,
                         102 + off + 20480, 103 + off + 24576]
    assert len(codes) == 14


def test_interleave_round_trip():
    layers = _layers(5)
    codes = interleave_snac_codes(layers)
    t = ORPHEUS_TOKENS
    ids = [t.start_of_speech] + codes + [t.end_of_speech]
    l0, l1, l2 = split_orpheus_output(ids)
    assert l0 == layers[0]
    assert l1 == layers[1]
    assert l2 == layers[2]


def test_dedup_drops_repeated_first_code():
    frame_a = list(range(7))
    frame_b = list(range(100, 107))
    codes = frame_a + frame_a + frame_b + frame_b + frame_a
    out = dedup_frames(codes)
    assert out == frame_a + frame_b + frame_a


def test_format_orpheus_example_structure():
    tok = ToyTok()
    codes = interleave_snac_codes(_layers(3))
    ex = format_orpheus_example("hello", codes, tok, speaker="zoe")
    t = ORPHEUS_TOKENS
    ids = ex["input_ids"]
    assert ids[0] == t.start_of_human
    assert t.end_of_text in ids
    eoh = ids.index(t.end_of_human)
    assert ids[eoh + 1] == t.start_of_ai
    assert ids[eoh + 2] == t.start_of_speech
    assert ids[-2] == t.end_of_speech
    assert ids[-1] == t.end_of_ai
    assert ex["labels"] == ids  # full-sequence training, no masking


def test_prepare_tts_dataset_paths():
    tok = ToyTok()
    ds = [
        {"text": "a", "snac_codes": _layers(2)},
        {"text": "b", "audio_codes": interleave_snac_codes(_layers(1))},
        {"text": "", "snac_codes": _layers(2)},     # skipped: no text
        {"text": "c"},                               # skipped: no audio
        {"text": "d", "audio": {"array": np.zeros(10),
                                "sampling_rate": 24000}},
    ]
    out = prepare_tts_dataset(
        ds, tok, encode_fn=lambda arr, sr: _layers(2, seed=7))
    assert len(out) == 3
    for ex in out:
        assert ex["labels"] == ex["input_ids"]


@pytest.mark.slow
def test_tts_sft_end_to_end(rng):
    """A tiny llama-style model overfits Orpheus-formatted examples (the
    driver's Whisper+Orpheus bench family, BASELINE.md:35)."""
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_lora_tree, init_params
    from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer

    # small vocab: rebase the token map into range
    toks = OrpheusTokens(start_of_human=200, end_of_human=201,
                         start_of_ai=202, end_of_ai=203,
                         start_of_speech=204, end_of_speech=205,
                         end_of_text=206, audio_offset=210,
                         codebook_size=4)
    tok = ToyTok()
    rng_np = np.random.RandomState(0)
    ds = [{"text": "hi",
           "snac_codes": [rng_np.randint(0, 4, 2).tolist(),
                          rng_np.randint(0, 4, 4).tolist(),
                          rng_np.randint(0, 4, 8).tolist()]}
          for _ in range(8)]
    examples = prepare_tts_dataset(ds, tok, tokens=toks, dedup=False)
    assert all(max(e["input_ids"]) < 256 for e in examples)

    cfg = ModelConfig(vocab_size=256, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=64)
    model = LanguageModel(cfg=cfg, params=init_params(cfg, rng),
                          max_seq_length=64)
    model.lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    args = SFTConfig(per_device_train_batch_size=4, max_steps=10,
                     max_seq_length=64, packing=False, learning_rate=5e-3,
                     lr_scheduler_type="constant", warmup_steps=0)
    tr = SFTTrainer(model, train_dataset=examples, args=args)
    tr.train()
    losses = [e["loss"] for e in tr.state_log]
    assert losses[-1] < losses[0]
