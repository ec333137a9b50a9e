"""Serving: OpenAI/Anthropic APIs over the on-device decode loop, with
the full serving stack — continuous batching, prefix caching, ngram
speculative decoding, fp8 KV, multi-LoRA. Equivalent CLI:

  unsloth serve --model_name MODEL --continuous_batching \
      --prefix_caching --speculative --kv_cache_dtype fp8_e4m3 \
      --adapter sql=./adapters/sql
"""

from unsloth_tpu import FastLanguageModel, InferenceServer

model, tokenizer = FastLanguageModel.from_pretrained(
    "unsloth/Llama-3.2-1B-Instruct", load_in_4bit=True)
model.for_inference()

server = InferenceServer(
    model, tokenizer, model_name="llama-3.2-1b",
    continuous_batching=True, prefix_caching=True, speculative=True,
    kv_cache_dtype="fp8_e4m3",
    adapters={"sql": "./adapters/sql"})   # requests pick via "model"
server.serve(host="0.0.0.0", port=8000)
