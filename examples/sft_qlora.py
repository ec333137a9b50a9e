"""QLoRA SFT end to end — the reference's flagship notebook flow
(load 4-bit -> get_peft_model -> SFTTrainer -> save merged + GGUF).

Swap MODEL for any catalogued checkpoint directory (332 reference repo
ids resolve through the mapper); runs as-is against a local HF
checkpoint. See docs/MIGRATING_FROM_UNSLOTH.md for the API mapping.
"""

from unsloth_tpu import FastLanguageModel, SFTConfig, SFTTrainer
from unsloth_tpu.data.chat_templates import get_chat_template

MODEL = "unsloth/Llama-3.2-1B-Instruct"   # or a local checkpoint dir

model, tokenizer = FastLanguageModel.from_pretrained(
    MODEL, max_seq_length=4096, load_in_4bit=True)
model = FastLanguageModel.get_peft_model(
    model, r=16, lora_alpha=16,
    target_modules=["q_proj", "k_proj", "v_proj", "o_proj",
                    "gate_proj", "up_proj", "down_proj"],
    use_gradient_checkpointing="unsloth")
tokenizer = get_chat_template(tokenizer, chat_template="llama-3.1")

dataset = [  # any datasets.Dataset with a "messages"/"text" column works
    {"messages": [{"role": "user", "content": "What is 2+2?"},
                  {"role": "assistant", "content": "4"}]},
] * 64

trainer = SFTTrainer(
    model=model, tokenizer=tokenizer, train_dataset=dataset,
    args=SFTConfig(per_device_train_batch_size=2,
                   gradient_accumulation_steps=4, max_steps=30,
                   learning_rate=2e-4, packing=True, logging_steps=1))
trainer.train()

model.save_pretrained_merged("outputs/merged", tokenizer)
from unsloth_tpu.export.gguf import save_pretrained_gguf

save_pretrained_gguf(model, "outputs/gguf", quantization_method="q5_k_m")
