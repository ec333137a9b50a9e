"""Public API surface lock (reference: tests/test_public_api_surface.py
— the drift alarm for the user-facing names)."""

import pytest


EXPECTED_TOP_LEVEL = {
    # model facades
    "FastLanguageModel", "FastModel", "FastVisionModel",
    "FastSentenceTransformer",
    # trainers (the complete TRL family, native)
    "SFTTrainer", "SFTConfig", "UnslothTrainer",
    "UnslothTrainingArguments",
    "GRPOTrainer", "GRPOConfig", "PatchFastRL",
    "DPOTrainer", "ORPOTrainer", "KTOTrainer", "CPOTrainer",
    "RLOOTrainer", "RLOOConfig",
    "OnlineDPOTrainer", "OnlineDPOConfig",
    "PPOTrainer", "PPOConfig",
    "RewardTrainer", "RewardConfig",
    "GKDTrainer", "GKDConfig",
    "PRMTrainer", "PRMConfig",
    "BCOTrainer", "BCOConfig",
    # data / generation / export
    "SamplingParams", "vLLMSamplingParams",
    "load_gguf", "InferenceServer",
    "enable_pipeline",
    # data-layer / tokenizer utilities (reference package-root exports)
    "standardize_sharegpt", "standardize_data_formats",
    "add_new_tokens", "mean_of_trained_tokens", "fix_untrained_tokens",
    "convert_to_fast_tokenizer", "PatchDPOTrainer", "PatchKTOTrainer",
    "RawTextDataLoader", "SyntheticDataKit", "remove_special_tokens",
    # per-arch facades (reference models/__init__.py)
    "FastLlamaModel", "FastMistralModel", "FastQwen2Model",
    "FastQwen3Model", "FastQwen3MoeModel", "FastGraniteModel",
    "FastFalconH1Model", "FastTextModel", "is_vLLM_available",
}


def test_top_level_names_resolve():
    import unsloth_tpu

    missing = []
    for name in sorted(EXPECTED_TOP_LEVEL):
        try:
            obj = getattr(unsloth_tpu, name)
        except AttributeError:
            missing.append(name)
            continue
        assert obj is not None, name
    assert not missing, f"public API names gone: {missing}"


def test_reference_flow_names():
    """The reference's canonical flow names exist with the same shape:
    from_pretrained -> get_peft_model -> train -> save."""
    import unsloth_tpu

    flm = unsloth_tpu.FastLanguageModel
    assert callable(flm.from_pretrained)
    assert callable(flm.get_peft_model)
    from unsloth_tpu.data.chat_templates import get_chat_template  # noqa
    from unsloth_tpu.trainer import train_on_responses_only  # noqa
    from unsloth_tpu.export import (save_pretrained_gguf,  # noqa
                                    save_pretrained_merged)
