"""Command-line interface.

Parity target: the reference's CLI surface (reference: unsloth-cli.py —
argparse fine-tune script: load -> LoRA -> SFT -> save/GGUF; and cli.py /
unsloth_cli/ `unsloth train/chat/export` subcommands). The Studio webapp
(`unsloth studio`) is out of scope for the CLI; serving comes later.

Usage:
    python -m unsloth_tpu.cli train --model_name <path> --dataset <path> ...
    python -m unsloth_tpu.cli chat  --model_name <path>
    python -m unsloth_tpu.cli export --model_name <path> --adapter <path> ...
    python -m unsloth_tpu.cli models [query]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_train_args(p: argparse.ArgumentParser):
    # model (mirrors unsloth-cli.py's "Model Options")
    p.add_argument("--model_name", required=True)
    p.add_argument("--platform", default=None,
                   help="force the jax platform (e.g. cpu); env vars "
                        "cannot override a site-registered plugin")
    p.add_argument("--max_seq_length", type=int, default=2048)
    p.add_argument("--dtype", default=None)
    p.add_argument("--load_in_4bit", action="store_true", default=True)
    p.add_argument("--no_load_in_4bit", dest="load_in_4bit",
                   action="store_false")
    # lora
    p.add_argument("--r", type=int, default=16)
    p.add_argument("--lora_alpha", type=float, default=16)
    p.add_argument("--lora_dropout", type=float, default=0.0)
    p.add_argument("--use_rslora", action="store_true")
    p.add_argument("--use_dora", action="store_true")
    p.add_argument("--loftq_iter", type=int, default=0,
                   help="LoftQ iterations (requires --no_load_in_4bit)")
    # data
    p.add_argument("--dataset", required=True,
                   help="path to a .json/.jsonl file or HF dataset dir")
    p.add_argument("--dataset_text_field", default="text")
    p.add_argument("--chat_template", default=None)
    # training (mirrors "Training Options")
    p.add_argument("--per_device_train_batch_size", type=int, default=2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--warmup_steps", type=int, default=5)
    p.add_argument("--lr_scheduler_type", default="linear")
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--packing", action="store_true")
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--save_steps", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    # saving (mirrors "Saving & Pushing")
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--save_model", action="store_true")
    p.add_argument("--save_method", default="lora",
                   choices=["lora", "merged_16bit", "merged_4bit"])
    p.add_argument("--save_gguf", action="store_true")
    p.add_argument("--quantization", default="q8_0")


def load_dataset_file(path: str, text_field: str = "text"):
    """Load a .json/.jsonl/.txt file or datasets dir into a list of dicts."""
    if os.path.isdir(path):
        import datasets

        return list(datasets.load_from_disk(path))
    rows = []
    if path.endswith(".jsonl"):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    elif path.endswith(".json"):
        with open(path) as f:
            data = json.load(f)
        rows = data if isinstance(data, list) else data.get("data", [])
    elif path.endswith(".txt"):
        from .data.raw_text import RawTextDataLoader

        return RawTextDataLoader(path).as_examples()
    else:
        raise ValueError(f"Unsupported dataset file: {path}")
    return rows


def cmd_train(args) -> int:
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    from .models.loader import FastLanguageModel
    from .trainer.sft import SFTConfig, SFTTrainer

    model, tokenizer = FastLanguageModel.from_pretrained(
        args.model_name, max_seq_length=args.max_seq_length,
        dtype=args.dtype, load_in_4bit=args.load_in_4bit)
    model = FastLanguageModel.get_peft_model(
        model, r=args.r, lora_alpha=args.lora_alpha,
        lora_dropout=args.lora_dropout, use_rslora=args.use_rslora,
        use_dora=args.use_dora,
        loftq_config=({"loftq_bits": 4, "loftq_iter": args.loftq_iter}
                      if args.loftq_iter else None))

    if args.chat_template and tokenizer is not None:
        from .data.chat_templates import get_chat_template

        tokenizer = get_chat_template(tokenizer, args.chat_template)

    ds = load_dataset_file(args.dataset, args.dataset_text_field)
    cfg = SFTConfig(
        output_dir=args.output_dir,
        per_device_train_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        learning_rate=args.learning_rate,
        max_steps=args.max_steps,
        num_train_epochs=args.num_train_epochs,
        warmup_steps=args.warmup_steps,
        lr_scheduler_type=args.lr_scheduler_type,
        weight_decay=args.weight_decay,
        seed=args.seed,
        packing=args.packing,
        max_seq_length=args.max_seq_length,
        dataset_text_field=args.dataset_text_field,
        logging_steps=args.logging_steps,
        save_steps=args.save_steps,
    )
    trainer = SFTTrainer(model=model, tokenizer=tokenizer,
                         train_dataset=ds, args=cfg)
    out = trainer.train(resume_from_checkpoint=args.resume or None)
    print(f"done: steps={out.global_step} loss={out.training_loss:.4f} "
          f"tokens/s={out.metrics['train_tokens_per_second']:.0f}")

    if args.save_model or args.save_gguf:
        if args.save_gguf:
            from .export.gguf import save_pretrained_gguf

            save_pretrained_gguf(model, args.output_dir,
                                 quantization_method=args.quantization)
        elif args.save_method == "lora":
            model.save_lora(os.path.join(args.output_dir, "adapter"))
        else:
            model.save_pretrained_merged(
                os.path.join(args.output_dir, "merged"),
                tokenizer, save_method=args.save_method)
    return 0


def cmd_chat(args) -> int:
    from .inference.generate import SamplingParams
    from .models.loader import FastLanguageModel

    model, tokenizer = FastLanguageModel.from_pretrained(
        args.model_name, load_in_4bit=args.load_in_4bit)
    model.for_inference()
    print("Interactive chat. Ctrl-D or 'exit' to quit.")
    history = []
    while True:
        try:
            user = input("you> ").strip()
        except EOFError:
            break
        if user in ("exit", "quit", ""):
            break
        history.append({"role": "user", "content": user})
        if getattr(tokenizer, "chat_template", None):
            prompt = tokenizer.apply_chat_template(
                history, tokenize=False, add_generation_prompt=True)
        else:
            prompt = "\n".join(m["content"] for m in history) + "\n"
        out = model.generate(
            [prompt],
            SamplingParams(max_tokens=args.max_new_tokens,
                           temperature=args.temperature),
            tokenizer=tokenizer)[0]
        print(f"model> {out}")
        history.append({"role": "assistant", "content": out})
    return 0


def cmd_inference(args) -> int:
    """One-shot generation (reference: `unsloth inference` subcommand —
    prompt in, completion out, no REPL)."""
    from .inference.generate import SamplingParams
    from .models.loader import FastLanguageModel

    model, tokenizer = FastLanguageModel.from_pretrained(
        args.model_name, load_in_4bit=args.load_in_4bit)
    model.for_inference()
    prompt = args.prompt
    if args.chat and getattr(tokenizer, "chat_template", None):
        prompt = tokenizer.apply_chat_template(
            [{"role": "user", "content": prompt}], tokenize=False,
            add_generation_prompt=True)
    out = model.generate(
        [prompt],
        SamplingParams(max_tokens=args.max_new_tokens,
                       temperature=args.temperature),
        tokenizer=tokenizer)[0]
    print(out)
    return 0


def cmd_export(args) -> int:
    from .export.save import load_lora
    from .models.loader import FastLanguageModel

    model, tokenizer = FastLanguageModel.from_pretrained(
        args.model_name, load_in_4bit=False, dtype="bfloat16")
    if args.adapter:
        load_lora(model, args.adapter)
    if args.format == "gguf":
        from .export.gguf import save_pretrained_gguf

        path = save_pretrained_gguf(model, args.output,
                                    quantization_method=args.quantization)
    elif args.format == "lora":
        # adapter-only export (reference save_method="lora"); the Studio
        # export tab offers this for re-publishing a trained adapter
        path = model.save_lora(args.output)
    else:
        path = model.save_pretrained_merged(args.output, tokenizer,
                                            save_method="merged_16bit")
    print(f"exported: {path}")
    return 0


def cmd_serve(args) -> int:
    from .inference.server import InferenceServer
    from .models.loader import FastLanguageModel

    model, tokenizer = FastLanguageModel.from_pretrained(
        args.model_name, load_in_4bit=args.load_in_4bit)
    model.for_inference()
    adapters = {}
    for spec in getattr(args, "adapter", []) or []:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--adapter expects NAME=PEFT_DIR, got {spec!r}")
        adapters[name] = path
    srv = InferenceServer(
        model, tokenizer,
        model_name=os.path.basename(args.model_name),
        speculative=getattr(args, "speculative", False),
        continuous_batching=getattr(args, "continuous_batching", False),
        adapters=adapters or None,
        kv_cache_dtype=getattr(args, "kv_cache_dtype", "bf16"),
        prefix_caching=getattr(args, "prefix_caching", False))
    print(f"serving OpenAI/Anthropic-compatible APIs on "
          f"http://{args.host}:{args.port} "
          f"(/v1/chat/completions, /v1/messages, /v1/completions)")
    srv.serve(host=args.host, port=args.port)
    return 0


def cmd_studio(args) -> int:
    """Launch the Studio backend (reference: `unsloth studio` — cli.py +
    unsloth_cli studio launch). Serves the dashboard SPA + REST API;
    optionally loads a model for the chat endpoints."""
    if getattr(args, "supervised", False):
        # native C++ shell (reference: the Tauri desktop wrapper owns
        # the backend process — studio/src-tauri/src/process.rs):
        # preflight, crash restart with backoff, clean signal shutdown
        from .studio.supervisor import run_supervised

        extra = []
        if args.model_name:
            extra += ["--model_name", args.model_name]
        if args.no_auth:
            extra += ["--no_auth"]
        run_supervised(args.port, args.workdir, extra)  # execs; no return
        return 0

    from .studio.server import StudioServer

    model = tokenizer = None
    if args.model_name:
        from .models.loader import FastLanguageModel

        model, tokenizer = FastLanguageModel.from_pretrained(
            args.model_name, load_in_4bit=args.load_in_4bit)
        model.for_inference()
    srv = StudioServer(model=model, tokenizer=tokenizer,
                       workdir=args.workdir,
                       require_auth=not args.no_auth)
    print(f"studio on http://{args.host}:{args.port}")
    srv.serve(host=args.host, port=args.port)
    return 0


def cmd_models(args) -> int:
    from .models.mapper import search_models

    for name in search_models(args.query or ""):
        print(name)
    return 0


def cmd_mcp(args) -> int:
    from .mcp_server import MCPServer
    from .models.loader import FastLanguageModel

    model, tok = FastLanguageModel.from_pretrained(
        args.model_name, load_in_4bit=args.load_in_4bit)
    MCPServer(model, tok).serve()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="unsloth_tpu",
        description="TPU-native fine-tuning (unsloth-compatible CLI)")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="LoRA/QLoRA fine-tune")
    _add_train_args(p_train)

    p_chat = sub.add_parser("chat", help="interactive chat")
    p_chat.add_argument("--model_name", required=True)
    p_chat.add_argument("--load_in_4bit", action="store_true", default=True)
    p_chat.add_argument("--no_load_in_4bit", dest="load_in_4bit",
                  action="store_false")
    p_chat.add_argument("--max_new_tokens", type=int, default=256)
    p_chat.add_argument("--temperature", type=float, default=0.7)

    p_inf = sub.add_parser("inference", help="one-shot generation")
    p_inf.add_argument("--model_name", required=True)
    p_inf.add_argument("--prompt", required=True)
    p_inf.add_argument("--load_in_4bit", action="store_true", default=True)
    p_inf.add_argument("--no_load_in_4bit", dest="load_in_4bit",
                 action="store_false")
    p_inf.add_argument("--max_new_tokens", type=int, default=256)
    p_inf.add_argument("--temperature", type=float, default=0.0)
    p_inf.add_argument("--chat", action="store_true",
                       help="wrap the prompt in the chat template")

    p_export = sub.add_parser("export", help="merge/export a model")
    p_export.add_argument("--model_name", required=True)
    p_export.add_argument("--adapter", default=None)
    p_export.add_argument("--output", required=True)
    p_export.add_argument("--format", default="merged",
                          choices=["merged", "lora", "gguf"])
    p_export.add_argument("--quantization", default="q8_0")

    p_models = sub.add_parser("models", help="search the model catalog")
    p_models.add_argument("query", nargs="?", default="")

    p_serve = sub.add_parser(
        "serve", help="OpenAI/Anthropic-compatible inference server")
    p_serve.add_argument("--model_name", required=True)
    p_serve.add_argument("--load_in_4bit", action="store_true", default=True)
    p_serve.add_argument("--no_load_in_4bit", dest="load_in_4bit",
                   action="store_false")
    p_serve.add_argument("--host", default="127.0.0.1")
    p_serve.add_argument("--port", type=int, default=8000)
    p_serve.add_argument("--speculative", action="store_true",
                         help="ngram speculative decoding for greedy "
                              "requests (exact output, fewer passes)")
    p_serve.add_argument("--continuous_batching", action="store_true",
                         help="share one paged decode loop across "
                              "concurrent requests")
    p_serve.add_argument("--adapter", action="append", default=[],
                         metavar="NAME=PEFT_DIR",
                         help="serve a LoRA adapter under NAME "
                              "(repeatable); requests select via the "
                              "'model' field")
    p_serve.add_argument("--prefix_caching", action="store_true",
                         help="reuse KV pages of shared prompt prefixes "
                              "across requests (continuous batching)")
    p_serve.add_argument("--kv_cache_dtype", default="bf16",
                         choices=["bf16", "fp8_e4m3", "fp8_e5m2"],
                         help="KV-cache storage precision (llama.cpp "
                              "--cache-type-k/v analog)")

    p_studio = sub.add_parser(
        "studio", help="Studio web app (training jobs, datasets, chat)")
    p_studio.add_argument("--model_name", default=None)
    p_studio.add_argument("--load_in_4bit", action="store_true",
                          default=True)
    p_studio.add_argument("--no_load_in_4bit", dest="load_in_4bit",
                    action="store_false")
    p_studio.add_argument("--host", default="127.0.0.1")
    p_studio.add_argument("--port", type=int, default=8800)
    p_studio.add_argument("--workdir", default="studio_jobs")
    p_studio.add_argument("--no_auth", action="store_true")
    p_studio.add_argument("--supervised", action="store_true",
                          help="run under the native C++ supervisor "
                               "(crash restart, preflight, pidfile)")

    from .cli_start import add_start_parser, cmd_start

    add_start_parser(sub)

    p_mcp = sub.add_parser(
        "mcp", help="MCP stdio server exposing the local model as "
                    "unsloth_generate/unsloth_chat tools")
    p_mcp.add_argument("--model_name", required=True)
    p_mcp.add_argument("--load_in_4bit", action="store_true", default=True)
    p_mcp.add_argument("--no_load_in_4bit", dest="load_in_4bit",
                 action="store_false")

    args = parser.parse_args(argv)
    return {
        "train": cmd_train,
        "chat": cmd_chat,
        "inference": cmd_inference,
        "export": cmd_export,
        "models": cmd_models,
        "serve": cmd_serve,
        "studio": cmd_studio,
        "start": cmd_start,
        "mcp": cmd_mcp,
    }[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
