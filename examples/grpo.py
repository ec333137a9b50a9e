"""GRPO reasoning RL — the reference's GRPO notebook flow, native:
on-device rollouts (no vLLM colocation), packed loss, reward functions.
"""

from unsloth_tpu import FastLanguageModel, GRPOConfig, GRPOTrainer

model, tokenizer = FastLanguageModel.from_pretrained(
    "unsloth/Llama-3.2-1B-Instruct", max_seq_length=2048,
    load_in_4bit=True)
model = FastLanguageModel.get_peft_model(model, r=16, lora_alpha=32)


def correctness_reward(prompts=None, completions=None, answer=None, **kw):
    return [1.0 if a in c else 0.0 for c, a in zip(completions, answer)]


dataset = [{"prompt": "What is 6*7? Answer with a number.",
            "answer": "42"}] * 64

trainer = GRPOTrainer(
    model, reward_funcs=[correctness_reward],
    args=GRPOConfig(per_device_train_batch_size=2, num_generations=4,
                    max_prompt_length=256, max_completion_length=256,
                    max_steps=50, beta=0.0,
                    # GSPO: importance_sampling_level="sequence",
                    prefix_grouping=True),   # attend each prompt once
    train_dataset=dataset, processing_class=tokenizer)
trainer.train()
