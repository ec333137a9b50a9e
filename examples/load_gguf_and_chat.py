"""A GGUF export is a runnable artifact: load it straight back and
generate (the reference needs a llama.cpp server sidecar for this)."""

from unsloth_tpu import FastLanguageModel

model, tokenizer = FastLanguageModel.from_pretrained(
    "outputs/gguf/model-Q5_K_M.gguf", load_in_4bit=False)
print(model.generate(["The capital of France is"], max_new_tokens=16,
                     temperature=0.0)[0])
