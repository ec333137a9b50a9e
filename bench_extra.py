"""Extra benchmark modes — the remaining driver configs (BASELINE.md:33-36):

  BENCH_MODEL=grpo     GRPO on Llama-3.1-8B-class (rollout + step)
  BENCH_MODEL=vision   Qwen2.5-VL-7B-class vision fine-tune
  BENCH_MODEL=whisper  Whisper-large-v3 ASR fine-tune
  BENCH_MODEL=tts      Orpheus-3B-class TTS (SNAC-token LM) fine-tune
  BENCH_MODEL=decode   Llama-8B NF4 decode/serving throughput vs dense
  BENCH_MODEL=spec     n-gram speculative decode speedup (greedy)

Each prints ONE JSON line with the same {value, vs_baseline, peak/mfu}
tuple as the headline (bench.py). Invoked via bench.py's BENCH_MODEL
dispatch. Sync discipline: float() on updated weights (axon gotcha)."""

import json
import os
import sys
import time

V5E_BF16_PEAK_FLOPS = 197e12


def _env_int(name, default):
    return int(os.environ.get(name, default))


def _sync(tree):
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# GRPO — Llama-3.1-8B class
# ---------------------------------------------------------------------------

def main_grpo(quick: bool):
    """GRPO round throughput: on-device rollout (prefill-once KV fanout)
    + ref logps + policy step. vs_baseline: the same round WITHOUT the
    shared-prefix grouped loss (per-completion prompt replication — the
    layout HF/TRL trains on)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import build_model, llama31_8b_config, flops_per_token
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_lora_tree
    from unsloth_tpu.trainer.grpo import GRPOConfig, GRPOTrainer

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 32)
    n_prompts = _env_int("BENCH_BATCH", 2)
    G = _env_int("BENCH_GENERATIONS", 4)
    p_len = _env_int("BENCH_PROMPT_LEN", 128 if quick else 512)
    c_len = _env_int("BENCH_COMPLETION_LEN", 32 if quick else 128)
    n_rounds = _env_int("BENCH_STEPS", 2)

    cfg = llama31_8b_config(num_layers)
    key = jax.random.PRNGKey(0)
    params = build_model(cfg, key, quantize=True)
    lora = init_lora_tree(cfg, key, r=16, alpha=16, dtype=jnp.float32)

    class _Tok:
        eos_token_id = 1
        pad_token_id = 0

    model = LanguageModel(cfg=cfg, params=params, tokenizer=_Tok(),
                          max_seq_length=p_len + c_len)
    model.lora = lora

    rng = np.random.RandomState(0)
    prompt_ids = [rng.randint(10, cfg.vocab_size - 10, p_len).tolist()
                  for _ in range(n_prompts)]

    def rollout():
        from unsloth_tpu.inference.generate import SamplingParams, generate

        sp = SamplingParams(max_tokens=c_len, temperature=0.9,
                            stop_token_ids=())
        comps = generate(model, prompt_ids, sp, return_token_ids=True,
                         num_return_sequences=G)
        expanded = [p for p in prompt_ids for _ in range(G)]
        return expanded, comps

    def one_round(tr, step_fn, grouped, opt_state):
        t0 = time.perf_counter()
        expanded, comps = rollout()
        adv = rng.randn(len(expanded)).astype(np.float32)
        if grouped:
            batch = tr._build_grouped_batch(expanded, comps, adv)
        else:
            batch = tr._build_batch(expanded, comps, adv)
        model.lora, opt_state, loss = step_fn(
            model.lora, opt_state, model.params, batch, None, None)
        _sync(model.lora)
        return time.perf_counter() - t0, opt_state

    results = {}
    step_hbm = {}
    for grouped in (True, False):
        args = GRPOConfig(num_generations=G, max_prompt_length=p_len,
                          max_completion_length=c_len, beta=0.0,
                          prefix_grouping=grouped, report_to="none")
        tr = GRPOTrainer(model, reward_funcs=[lambda **kw: [0.0]],
                         args=args, train_dataset=[])
        tx = optax.adamw(1e-5)
        opt_state = tx.init(model.lora)
        step_fn = tr._make_step(tx)
        # warm-up compiles; opt_state is donated so keep the new one
        _, opt_state = one_round(tr, step_fn, grouped, opt_state)
        times = []
        for _ in range(n_rounds):
            dt, opt_state = one_round(tr, step_fn, grouped, opt_state)
            times.append(dt)
        results[grouped] = sum(times) / len(times)

    # ---- TRL-practice baseline (VERDICT r4 #4): the round as a TRL
    # user runs it — per-completion replicated prompts in padded [N, T]
    # rows, FULL-logits log-softmax (TRL materializes [N, T, V] logits in
    # _get_per_token_logps), bnb-style dequantize-per-use NF4 — against
    # the reference's own comparison basis (README.md:61,220: 2x faster,
    # 80% less VRAM than TRL+FA2). Rollout is IDENTICAL on both sides
    # (shared on-device generate — conservative: TRL without vLLM is far
    # slower here). Peak HBM comes from compiled-program memory analysis
    # of each step.
    from unsloth_tpu.models.decoder import logits_fn as _logits_fn
    from unsloth_tpu.trainer.grpo import grpo_loss

    args = GRPOConfig(num_generations=G, max_prompt_length=p_len,
                      max_completion_length=c_len, beta=0.0,
                      prefix_grouping=False, report_to="none")
    tr_trl = GRPOTrainer(model, reward_funcs=[lambda **kw: [0.0]],
                         args=args, train_dataset=[])

    def trl_loss(lora, params, batch):
        logits = _logits_fn(params, lora, batch.input_ids, cfg)
        logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = jnp.maximum(batch.logp_targets, 0)
        logps = jnp.take_along_axis(logz, tgt[..., None],
                                    axis=-1)[..., 0]
        logps = jnp.where(batch.logp_targets >= 0, logps, 0.0)
        old = jax.lax.stop_gradient(logps)
        return grpo_loss(logps, old, None, batch.advantages,
                         batch.completion_mask, beta=0.0,
                         epsilon=args.epsilon,
                         epsilon_high=args.epsilon_high,
                         loss_type=args.loss_type,
                         max_completion_length=c_len)

    def trl_step(lora, opt_state, params, batch, _old, _ref):
        tx = optax.adamw(1e-5)
        loss, grads = jax.value_and_grad(trl_loss)(lora, params, batch)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    trl_time = None
    try:
        os.environ["UNSLOTH_DISABLE_FUSED_NF4"] = "1"
        jax.clear_caches()
        tx = optax.adamw(1e-5)
        opt_state = tx.init(model.lora)
        jstep = jax.jit(trl_step, donate_argnums=(0, 1))
        # peak HBM of the baseline step program
        expanded, comps = rollout()
        adv = rng.randn(len(expanded)).astype(np.float32)
        batch0 = tr_trl._build_batch(expanded, comps, adv)
        try:
            comp = jstep.lower(model.lora, opt_state, model.params,
                               batch0, None, None).compile()
            ma = comp.memory_analysis()
            step_hbm["trl_practice"] = round(
                (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                 + ma.output_size_in_bytes) / 1e9, 2)
        except Exception as e:  # noqa: BLE001
            print(f"trl step memory_analysis failed: {str(e)[:200]}",
                  file=sys.stderr)
        _, opt_state = one_round(tr_trl, jstep, False, opt_state)
        times = []
        for _ in range(n_rounds):
            dt, opt_state = one_round(tr_trl, jstep, False, opt_state)
            times.append(dt)
        trl_time = sum(times) / len(times)
    except Exception as e:  # noqa: BLE001
        print(f"TRL-practice baseline failed: {str(e)[:400]}",
              file=sys.stderr)
    finally:
        os.environ.pop("UNSLOTH_DISABLE_FUSED_NF4", None)
        jax.clear_caches()

    # ours: peak HBM of the grouped step program
    try:
        args_g = GRPOConfig(num_generations=G, max_prompt_length=p_len,
                            max_completion_length=c_len, beta=0.0,
                            prefix_grouping=True, report_to="none")
        tr_g = GRPOTrainer(model, reward_funcs=[lambda **kw: [0.0]],
                           args=args_g, train_dataset=[])
        tx = optax.adamw(1e-5)
        opt_state_g = tx.init(model.lora)
        step_g = tr_g._make_step(tx)
        expanded, comps = rollout()
        adv = rng.randn(len(expanded)).astype(np.float32)
        batch_g = tr_g._build_grouped_batch(expanded, comps, adv)
        comp = step_g.lower(model.lora, opt_state_g, model.params,
                            batch_g, None, None).compile()
        ma = comp.memory_analysis()
        step_hbm["ours"] = round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes
             + ma.output_size_in_bytes) / 1e9, 2)
    except Exception as e:  # noqa: BLE001
        print(f"ours step memory_analysis failed: {str(e)[:200]}",
              file=sys.stderr)

    # Rollout dispatch comparison (r5): the conservative baseline above
    # grants TRL our on-device lax.while_loop rollout. A straight JAX
    # port of TRL-without-vLLM inherits transformers.generate's dispatch
    # shape instead: a HOST python loop issuing ONE jitted cached
    # forward per generated token (reference basis: TRL's GRPOTrainer
    # calls model.generate when use_vllm=False). Measure both rollouts
    # at identical shapes so the artifact can carry the full TRL-
    # practice round (host-loop rollout + unfused full-logits step)
    # against ours.
    N = n_prompts * G
    roll_times = {}

    def time_ours_rollout():
        t0 = time.perf_counter()
        rollout()  # returns host token lists — synced on return
        return time.perf_counter() - t0

    def time_host_loop_rollout():
        from unsloth_tpu.inference.decode import (forward_with_cache,
                                                  init_cache,
                                                  logits_from_hidden)

        prompt = jnp.asarray(np.array(
            [p for p in prompt_ids for _ in range(G)], np.int32))

        def prefill(params, lora, cache, prompt):
            pos = jnp.broadcast_to(
                jnp.arange(p_len, dtype=jnp.int32)[None], (N, p_len))
            h, cache = forward_with_cache(params, lora, prompt, cfg,
                                          cache, positions=pos)
            logits = logits_from_hidden(params, h[:, -1:], cfg, lora)
            return logits, cache

        def step(params, lora, cache, tok, pos, key):
            h, cache = forward_with_cache(
                params, lora, tok, cfg, cache,
                positions=jnp.broadcast_to(pos[None, None], (N, 1)))
            logits = logits_from_hidden(params, h, cfg, lora)
            nxt = jax.random.categorical(
                key, logits[:, -1, :].astype(jnp.float32) / 0.9)
            return nxt[:, None].astype(jnp.int32), cache

        jprefill = jax.jit(prefill, donate_argnums=(2,))
        jstep = jax.jit(step, donate_argnums=(2,))
        root = jax.random.PRNGKey(0)

        def one_gen():
            cache = init_cache(cfg, N, p_len + c_len)
            t0 = time.perf_counter()
            logits, cache = jprefill(params, model.lora, cache, prompt)
            tok = jnp.argmax(logits[:, -1, :], axis=-1)[
                :, None].astype(jnp.int32)
            for t in range(c_len - 1):
                tok, cache = jstep(params, model.lora, cache, tok,
                                   jnp.int32(p_len + t),
                                   jax.random.fold_in(root, t))
            np.asarray(tok)  # sync the host-loop chain
            return time.perf_counter() - t0

        one_gen()  # compile prefill + step
        return min(one_gen() for _ in range(2))

    try:
        roll_times["ours_on_device_s"] = round(
            min(time_ours_rollout() for _ in range(2)), 3)
        roll_times["hf_generate_host_loop_s"] = round(
            time_host_loop_rollout(), 3)
    except Exception as e:  # noqa: BLE001
        print(f"host-loop rollout measurement failed: {str(e)[:300]}",
              file=sys.stderr)
        roll_times = {}

    gen_tokens = n_prompts * G * c_len
    dt = results[True]
    from bench import weight_gb

    ours_w_gb = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(model.params)
        if hasattr(x, "dtype")) / 1e9
    bf16_replica_gb = weight_gb(cfg, 2)
    trl_w_gb = ours_w_gb + bf16_replica_gb
    print(json.dumps({
        "metric": "grpo_llama8b_completion_tokens_per_sec_per_chip"
                  + ("" if num_layers == 32 else f"_layers{num_layers}"),
        "value": round(gen_tokens / dt, 2),
        "unit": "completion tokens/s/chip (rollout + step)",
        "vs_baseline": (round(trl_time / dt, 3) if trl_time
                        else round(results[False] / dt, 3)),
        "detail": {
            "layers": num_layers, "prompts": n_prompts, "generations": G,
            "prompt_len": p_len, "completion_len": c_len,
            "round_time_s": round(dt, 3),
            "trl_practice_baseline": {
                "definition": "the round as a TRL user runs it "
                              "(reference comparison basis, README.md:"
                              "61,220): per-completion replicated "
                              "prompts in padded [N,T] rows, FULL-"
                              "logits [N,T,V] log-softmax logps, NF4 "
                              "dequantize-per-use; identical on-device "
                              "rollout on both sides (conservative — "
                              "TRL without vLLM generates far slower)",
                "round_time_s": (round(trl_time, 3) if trl_time
                                 else None),
                "vs_baseline_trl_practice": (round(trl_time / dt, 3)
                                             if trl_time else None),
                "step_peak_hbm_gb": step_hbm or None},
            "rollout_dispatch": (lambda rt: {
                "definition": "rollout wall time at identical shapes: "
                              "ours = on-device lax.while_loop generate "
                              "(zero host round-trips per token); "
                              "hf_generate = host python loop, one "
                              "jitted cached forward per token — the "
                              "dispatch shape a JAX port of TRL-"
                              "without-vLLM inherits from transformers."
                              "generate; per-call tunnel dispatch is "
                              "~2-4 ms (CLAUDE.md)",
                **rt,
                "rollout_speedup": (round(
                    rt["hf_generate_host_loop_s"]
                    / rt["ours_on_device_s"], 2)
                    if rt else None),
                "vs_baseline_trl_hf_generate": (round(
                    (trl_time - rt["ours_on_device_s"]
                     + rt["hf_generate_host_loop_s"]) / dt, 3)
                    if rt and trl_time else None),
            })(roll_times) if roll_times else None,
            "prefix_grouping_ablation": {
                "definition": "identical round without the shared-prefix "
                              "grouped loss pass (prompt replicated per "
                              "completion) but WITH our fused selective "
                              "logps — isolates PrefixGrouper",
                "round_time_s": round(results[False], 3)},
            "memory": {
                "definition": "rollout and training share ONE quantized "
                              "policy copy on-chip (the reference's GRPO "
                              "memory story, README.md:61 '80% less "
                              "VRAM': TRL+vLLM keeps the bnb-4bit "
                              "training copy PLUS vLLM's bf16 serving "
                              "copy; ours_weights_gb is measured from "
                              "the live pytree, the TRL figure models "
                              "that same measured copy + a bf16 replica)",
                "ours_weights_gb": round(ours_w_gb, 2),
                "trl_vllm_weights_gb": round(trl_w_gb, 2),
                "weights_saving_frac": round(1 - ours_w_gb / trl_w_gb,
                                             3)},
            "backend": jax.default_backend(),
        }}))


# ---------------------------------------------------------------------------
# Vision — Qwen2.5-VL-7B class
# ---------------------------------------------------------------------------

def qwen25_vl_7b_text_config(num_layers):
    from unsloth_tpu.models.config import ModelConfig

    return ModelConfig(
        model_type="qwen2", name="qwen2.5-vl-7b-bench",
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_layers=num_layers, num_heads=28, num_kv_heads=4,
        rope_theta=1000000.0, rms_norm_eps=1e-6, attention_bias=True,
        max_position_embeddings=128000, mrope_section=(16, 24, 24),
    )


def _init_qwen_vision(vcfg, key):
    import jax
    import jax.numpy as jnp

    keys = iter(jax.random.split(key, 16 * vcfg.depth + 16))

    def rand(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, jnp.bfloat16) * scale

    def lin(o, i):
        return {"kernel": rand((i, o)), "bias": jnp.zeros((o,),
                                                          jnp.bfloat16)}

    d, f = vcfg.hidden_size, vcfg.intermediate_size
    pdim = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    vision = {
        "patch_embed": {"kernel": rand((pdim, d)), "bias": None},
        "merger": {
            "ln_q": jnp.ones((d,), jnp.bfloat16),
            "fc1": lin(d * vcfg.merge_unit, d * vcfg.merge_unit),
            "fc2": lin(vcfg.out_hidden_size, d * vcfg.merge_unit),
        },
        "layers": [],
    }
    for _ in range(vcfg.depth):
        vision["layers"].append({
            "norm1": jnp.ones((d,), jnp.bfloat16),
            "norm2": jnp.ones((d,), jnp.bfloat16),
            "qkv": lin(3 * d, d),
            "out": lin(d, d),
            "gate": lin(f, d), "up": lin(f, d), "down": lin(d, f),
        })
    return vision


def main_vision(quick: bool):
    """Qwen2.5-VL-class step: windowed ViT forward + M-RoPE text decoder
    with NF4 base + LoRA, image tokens spliced into the sequence."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import build_model
    from unsloth_tpu.models.params import init_lora_tree
    from unsloth_tpu.models.qwen_vl import (QwenVisionConfig,
                                            mrope_positions_for,
                                            qwen_vision_forward)
    from unsloth_tpu.models.decoder import forward as text_forward

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 28)
    seq = _env_int("BENCH_SEQ", 512 if quick else 2048)
    n_steps = _env_int("BENCH_STEPS", 2 if quick else 4)
    vdepth = _env_int("BENCH_VIT_LAYERS", 2 if quick else 32)

    cfg = qwen25_vl_7b_text_config(num_layers)
    vcfg = QwenVisionConfig(depth=vdepth, out_hidden_size=cfg.hidden_size)
    key = jax.random.PRNGKey(0)
    params = build_model(cfg, key, quantize=True)
    vision = _init_qwen_vision(vcfg, key)
    lora = init_lora_tree(cfg, key, r=16, alpha=16, dtype=jnp.float32)

    # one image: grid (1, 32, 32) -> 1024 patches -> 256 merged tokens
    g = 16 if quick else 32
    grid = ((1, g, g),)
    n_patches = g * g
    n_img_tokens = n_patches // vcfg.merge_unit
    pdim = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    pixels = jax.random.normal(key, (n_patches, pdim), jnp.bfloat16)

    image_token = 5
    rng = np.random.RandomState(0)
    ids = rng.randint(10, cfg.vocab_size - 10, (1, seq)).astype(np.int32)
    ids[0, 4:4 + n_img_tokens] = image_token
    labels = ids.copy()
    labels[0, :4 + n_img_tokens] = -100
    mpos = np.stack([mrope_positions_for(ids[0], image_token, grid,
                                         vcfg.spatial_merge_size)])
    ids_j = jnp.asarray(ids)
    labels_j = jnp.asarray(labels)
    mpos_j = jnp.asarray(mpos)

    def make_loss_fn(mode):
        """mode 'auto' = the library's real dispatch (resolve_nf4_mode +
        the fused-CE HBM gate, exactly what sft_loss gives a user);
        'hf_equiv' = the baseline arm (unfused NF4 via env flag set by
        the caller + manual full-logits CE)."""
        from unsloth_tpu.models.decoder import (_loss_from_hidden,
                                                resolve_nf4_mode)
        from unsloth_tpu.ops.qlora_matmul import nf4_dispatch_mode

        def embed_with_image(params, vision, ids, pixels):
            x = jnp.take(params["embed"], ids, axis=0)
            feats = qwen_vision_forward(vision, pixels, grid, vcfg)
            feats = feats.astype(x.dtype)
            is_img = ids == image_token
            flat = feats.reshape(-1, feats.shape[-1])
            order = jnp.clip(
                jnp.cumsum(is_img.reshape(-1).astype(jnp.int32)) - 1, 0,
                flat.shape[0] - 1)
            gathered = jnp.take(flat, order,
                                axis=0).reshape(*ids.shape, -1)
            return jnp.where(is_img[..., None], gathered, x)

        def loss_fn(lora, params, vision, ids, labels, pixels, mpos):
            x = embed_with_image(params, vision, ids, pixels)
            if mode == "auto":
                nf4_mode = resolve_nf4_mode(params, cfg, ids.size,
                                            fused_ce="auto")
                with nf4_dispatch_mode(nf4_mode):
                    h = text_forward(params, lora, ids, cfg,
                                     inputs_embeds=x,
                                     mrope_positions=mpos, remat=True)
                    return _loss_from_hidden(params, lora, h, labels,
                                             cfg)
            h = text_forward(params, lora, ids, cfg, inputs_embeds=x,
                             mrope_positions=mpos, remat=True)
            hN = h[:, :-1].reshape(-1, h.shape[-1])
            lab = labels[:, 1:].reshape(-1)
            wd = params["lm_head"].T.astype(h.dtype)
            logits = (hN @ wd).astype(jnp.float32)
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(
                logits, jnp.clip(lab, 0)[:, None], axis=-1)[:, 0]
            valid = lab != -100
            return jnp.sum(jnp.where(valid, logz - gold, 0.0)) \
                / jnp.maximum(jnp.sum(valid), 1)
        return loss_fn

    tx = optax.adamw(1e-4)

    def run_variant(mode):
        # fresh caches per variant: the NF4-dispatch env flag is read at
        # trace time inside remat'd code (CLAUDE.md remat-cache gotcha)
        jax.clear_caches()
        lora_v = init_lora_tree(cfg, key, r=16, alpha=16,
                                dtype=jnp.float32)
        opt_v = tx.init(lora_v)
        loss_fn = make_loss_fn(mode)

        def step(lora, opt_state, params, vision, ids, labels, pixels,
                 mpos):
            loss, grads = jax.value_and_grad(loss_fn)(
                lora, params, vision, ids, labels, pixels, mpos)
            updates, opt_state = tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        jstep = jax.jit(step, donate_argnums=(0, 1))
        for _ in range(2):
            lora_v, opt_v, loss = jstep(lora_v, opt_v, params, vision,
                                        ids_j, labels_j, pixels, mpos_j)
        _sync(lora_v)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            lora_v, opt_v, loss = jstep(lora_v, opt_v, params, vision,
                                        ids_j, labels_j, pixels, mpos_j)
        _sync(lora_v)
        return (time.perf_counter() - t0) / n_steps, float(loss)

    dt, loss = run_variant("auto")

    # What did auto pick? (pure function of params/cfg/token count —
    # recorded so the artifact explains itself; r4's 0.947 came from
    # forcing fused CE + fused NF4 where the auto gate would not)
    from unsloth_tpu.models.decoder import resolve_nf4_mode
    auto_nf4 = resolve_nf4_mode(params, cfg, ids.size, fused_ce="auto")
    logits_bytes = (seq - 1) * cfg.vocab_size * 4
    auto_full_ce = logits_bytes <= 1536 * 1024 * 1024

    # HF-equivalent baseline: NF4 dequantize-per-use (unfused) +
    # full-logits CE, same batch/model — the vision analog of the llama
    # mode's equal-token baseline (reference claim: 1.5x faster vision,
    # /root/reference/README.md:188).
    base_dt = vs_baseline = None
    prev = os.environ.get("UNSLOTH_DISABLE_FUSED_NF4")
    os.environ["UNSLOTH_DISABLE_FUSED_NF4"] = "1"
    try:
        base_dt, _ = run_variant("hf_equiv")
        vs_baseline = base_dt / dt
    except Exception as e:  # noqa: BLE001
        print(f"vision baseline failed: {str(e)[:300]}", file=sys.stderr)
    finally:
        if prev is None:
            os.environ.pop("UNSLOTH_DISABLE_FUSED_NF4", None)
        else:
            os.environ["UNSLOTH_DISABLE_FUSED_NF4"] = prev

    print(json.dumps({
        "metric": "qwen25_vl_7b_vision_sft_tokens_per_sec_per_chip"
                  + ("" if num_layers == 28 else f"_layers{num_layers}"),
        "value": round(seq / dt, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {"seq": seq, "layers": num_layers,
                   "vit_layers": vdepth, "image_tokens": n_img_tokens,
                   "step_time_s": round(dt, 4),
                   "loss": round(loss, 3),
                   "ours_dispatch": {
                       "definition": "ours = the library's auto "
                                     "dispatch (resolve_nf4_mode + the "
                                     "fused-CE HBM gate), i.e. what "
                                     "sft_loss actually gives a user "
                                     "at this shape",
                       "nf4_mode": auto_nf4,
                       "full_logits_ce": bool(auto_full_ce)},
                   "baseline": {
                       "definition": "HF-equivalent on the same batch: "
                                     "NF4 dequantize-per-use (unfused) "
                                     "+ full-logits CE; equal real "
                                     "tokens (no padding differences "
                                     "at this fixed-shape config)",
                       "baseline_step_time_s": (round(base_dt, 4)
                                                if base_dt else None)},
                   "backend": jax.default_backend()}}))


# ---------------------------------------------------------------------------
# Whisper — large-v3 class
# ---------------------------------------------------------------------------

def _init_whisper(cfg, key):
    import jax
    import jax.numpy as jnp

    n = 20 * (cfg.encoder_layers + cfg.decoder_layers) + 32
    keys = iter(jax.random.split(key, n))

    def rand(shape, scale=0.02):
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    def lin(o, i):
        return {"kernel": rand((i, o)), "bias": jnp.zeros((o,),
                                                          jnp.float32)}

    def ln(d):
        return {"w": jnp.ones((d,), jnp.float32),
                "b": jnp.zeros((d,), jnp.float32)}

    def attn(d):
        return {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                "out": lin(d, d)}

    d, f = cfg.d_model, cfg.ffn_dim
    encoder = {
        "conv1": {"kernel": rand((d, cfg.num_mel_bins, 3)),
                  "bias": jnp.zeros((d,), jnp.float32)},
        "conv2": {"kernel": rand((d, d, 3)),
                  "bias": jnp.zeros((d,), jnp.float32)},
        "pos_embed": rand((cfg.max_source_positions, d)),
        "ln_post": ln(d),
        "layers": [{"ln1": ln(d), "ln2": ln(d), "self_attn": attn(d),
                    "fc1": lin(f, d), "fc2": lin(d, f)}
                   for _ in range(cfg.encoder_layers)],
    }
    decoder = {
        "embed": rand((cfg.vocab_size, d)),
        "pos_embed": rand((cfg.max_target_positions, d)),
        "ln_post": ln(d),
        "layers": [{"ln1": ln(d), "ln_x": ln(d), "ln2": ln(d),
                    "self_attn": attn(d), "cross_attn": attn(d),
                    "fc1": lin(f, d), "fc2": lin(d, f)}
                   for _ in range(cfg.decoder_layers)],
    }
    return {"encoder": encoder, "decoder": decoder}


def main_whisper(quick: bool):
    """Whisper-large-v3-class ASR LoRA fine-tune step (bf16 frozen base,
    fp32 q/v adapters — the reference's Whisper notebook trains LoRA via
    get_peft_model on q_proj/v_proj; full-FT fp32 of the 1.5B model needs
    ~25 GB of param+adam state and cannot fit one 16 GB chip)."""
    import jax
    import jax.numpy as jnp
    import optax

    from unsloth_tpu.models.whisper import (WhisperConfig,
                                            init_whisper_lora,
                                            whisper_loss)

    enc_layers = _env_int("BENCH_LAYERS", 2 if quick else 32)
    bsz = _env_int("BENCH_BATCH", 1 if quick else 2)
    label_len = _env_int("BENCH_SEQ", 64 if quick else 224)
    n_steps = _env_int("BENCH_STEPS", 2 if quick else 4)
    frames = 300 if quick else 3000

    cfg = WhisperConfig(encoder_layers=enc_layers,
                        decoder_layers=enc_layers,
                        max_source_positions=frames // 2)
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          _init_whisper(cfg, key))
    lora = init_whisper_lora(cfg, key, r=32, alpha=64)
    feats = jax.random.normal(key, (bsz, cfg.num_mel_bins, frames),
                              jnp.bfloat16)
    dec_in = jax.random.randint(key, (bsz, label_len), 0, cfg.vocab_size)
    labels = jnp.roll(dec_in, -1, axis=1)

    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)

    def step(lora, opt_state, params, feats, dec_in, labels):
        loss, grads = jax.value_and_grad(
            lambda l: whisper_loss(params, feats, dec_in, labels, cfg,
                                   lora=l))(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    def run_steps():
        nonlocal lora, opt_state
        jstep = jax.jit(step, donate_argnums=(0, 1))
        loss = None
        for _ in range(2):
            lora, opt_state, loss = jstep(lora, opt_state, params, feats,
                                          dec_in, labels)
        _sync(lora)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            lora, opt_state, loss = jstep(lora, opt_state, params, feats,
                                          dec_in, labels)
        _sync(lora)
        return (time.perf_counter() - t0) / n_steps, loss

    dt, loss = run_steps()

    # HF-equivalent same-device baseline (VERDICT r4 #3): the same step
    # through the pure-jnp reference ops (XLA SDPA attention, jnp
    # layernorm — what a straight JAX port of HF whisper would run).
    base_dt = vs_baseline = None
    try:
        os.environ["UNSLOTH_DISABLE_PALLAS"] = "1"
        jax.clear_caches()  # remat trace cache keys on avals, not env
        base_dt, _ = run_steps()
        vs_baseline = base_dt / dt
    except Exception as e:  # noqa: BLE001
        print(f"whisper baseline failed: {str(e)[:300]}", file=sys.stderr)
    finally:
        os.environ.pop("UNSLOTH_DISABLE_PALLAS", None)
        jax.clear_caches()

    print(json.dumps({
        "metric": "whisper_large_v3_asr_lora_decoder_tokens_per_sec_per_chip"
                  + ("" if enc_layers == 32 else f"_layers{enc_layers}"),
        "value": round(bsz * label_len / dt, 2),
        "unit": "decoder tokens/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {"batch": bsz, "label_len": label_len,
                   "mel_frames": frames, "enc_dec_layers": enc_layers,
                   "step_time_s": round(dt, 4),
                   "loss": round(float(loss), 3),
                   "baseline": {
                       "definition": "same LoRA step through the pure-"
                                     "jnp reference ops (UNSLOTH_DISABLE"
                                     "_PALLAS=1: XLA SDPA attention, jnp "
                                     "layernorm) — the straight-JAX-port-"
                                     "of-HF-whisper equivalent; the "
                                     "reference publishes no Whisper "
                                     "multiple (BASELINE.md has no "
                                     "Whisper row)",
                       "baseline_step_time_s": (round(base_dt, 4)
                                                if base_dt else None)},
                   "backend": jax.default_backend()}}))


# ---------------------------------------------------------------------------
# TTS — Orpheus-3B class (SNAC-token LM)
# ---------------------------------------------------------------------------

def orpheus_3b_config(num_layers):
    from unsloth_tpu.models.config import ModelConfig, RopeScaling

    # llama-3.2-3B backbone with the SNAC-extended vocab (orpheus-3b)
    return ModelConfig(
        model_type="llama", name="orpheus-3b-bench",
        vocab_size=156940, hidden_size=3072, intermediate_size=8192,
        num_layers=num_layers, num_heads=24, num_kv_heads=8,
        head_dim=128, rope_theta=500000.0, rms_norm_eps=1e-5,
        max_position_embeddings=131072,
        rope_scaling=RopeScaling(
            rope_type="llama3", factor=32.0, low_freq_factor=1.0,
            high_freq_factor=4.0, original_max_position_embeddings=8192),
    )


def main_tts(quick: bool):
    """Orpheus-3B-class TTS fine-tune: a llama backbone generating SNAC
    audio tokens — QLoRA SFT over interleaved text+audio-token rows
    (reference: Orpheus notebook semantics; data/tts.py builds the
    interleave)."""
    import jax

    from bench import (flops_per_token, make_packed_batch, run_path)

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 28)
    seq = _env_int("BENCH_SEQ", 512 if quick else 2048)
    bsz = _env_int("BENCH_BATCH", 1)
    n_steps = _env_int("BENCH_STEPS", 2 if quick else 4)

    cfg = orpheus_3b_config(num_layers)
    key = jax.random.PRNGKey(0)
    batch = make_packed_batch(cfg, key, bsz, seq, packed=True)
    tps, dt, _, loss = run_path(cfg, key, batch, n_steps, quantize=True,
                                fused_ce="auto")
    tokens = batch["input_ids"].size
    mfu = 3 * flops_per_token(cfg, seq) * tokens / dt / V5E_BF16_PEAK_FLOPS

    # HF-equivalent baseline on the same rows: unfused NF4 + full-logits
    # CE (reference claim: Orpheus-TTS 1.5x faster,
    # /root/reference/README.md:197). run_path clears trace caches per
    # variant so the NF4-dispatch flag is honored.
    base_tps = vs_baseline = None
    try:
        base_tps, _, _, _ = run_path(cfg, key, batch,
                                     max(2, n_steps // 2),
                                     quantize=True, fused_ce=False,
                                     disable_fused_nf4=True, warmup=1)
        vs_baseline = tps / base_tps
    except Exception as e:  # noqa: BLE001
        print(f"tts baseline failed: {str(e)[:300]}", file=sys.stderr)

    print(json.dumps({
        "metric": "orpheus_3b_tts_qlora_sft_tokens_per_sec_per_chip"
                  + ("" if num_layers == 28 else f"_layers{num_layers}"),
        "value": round(tokens / dt, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {"seq": seq, "batch": bsz, "layers": num_layers,
                   "step_time_s": round(dt, 4), "mfu": round(mfu, 4),
                   "loss": round(loss, 3),
                   "backend": jax.default_backend(),
                   "baseline": {
                       "definition": "HF-equivalent on the same rows: "
                                     "NF4 dequantize-per-use (unfused) "
                                     "+ full-logits CE",
                       "baseline_tokens_per_sec": (round(base_tps, 2)
                                                   if base_tps else None)},
                   "note": "SNAC-token LM over the llama backbone; "
                           "codec interleave in data/tts.py"}}))


# ---------------------------------------------------------------------------
# Long context — max trainable context on one chip
# ---------------------------------------------------------------------------

def main_longctx(quick: bool):
    """BENCH_MODEL=longctx: the reference's long-context claims (README
    3x faster / 30% less VRAM via packing+kernels, GRPO '7x longer
    context', README.md:61-62,221-222) measured as MAX TRAINABLE CONTEXT
    at FULL depth on one 16 GB v5e: descend a seq ladder until the 8B
    QLoRA step fits, for (a) ours (fused NF4 + fused CE + remat) and
    (b) the HF-equivalent baseline (unfused NF4 + full-logits CE — its
    8K step already needs 17.45 GB, bench_artifacts/r4/llama.json).
    vs_baseline = ours_max_ctx / baseline_max_ctx."""
    import jax

    from bench import llama31_8b_config, make_packed_batch, run_path

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 32)
    n_steps = _env_int("BENCH_STEPS", 2)
    ours_ladder = [int(x) for x in os.environ.get(
        "BENCH_LADDER", "12288,10240,8192" if not quick
        else "1024,512").split(",")]
    base_ladder = [int(x) for x in os.environ.get(
        "BENCH_BASE_LADDER", "6144,4096,2048" if not quick
        else "1024,512").split(",")]

    cfg = llama31_8b_config(num_layers)
    key = jax.random.PRNGKey(0)

    def ladder(seqs, label, **kw):
        for seq in seqs:
            batch = make_packed_batch(cfg, key, 1, seq, packed=True)
            try:
                tps, dt, gb, _ = run_path(cfg, key, batch, n_steps,
                                          warmup=1, want_memory=True,
                                          **kw)
            except Exception as e:  # noqa: BLE001
                print(f"{label} seq {seq} failed: {str(e)[:200]}",
                      file=sys.stderr)
                continue
            return {"max_context": seq,
                    "tokens_per_sec": round(tps, 2),
                    "step_time_s": round(dt, 4),
                    "peak_hbm_gb": gb}
        return {"max_context": 0}

    ours = ladder(ours_ladder, "ours", quantize=True, fused_ce="auto",
                  flash_block=1024)
    base = ladder(base_ladder, "baseline", quantize=True, fused_ce=False,
                  disable_fused_nf4=True)
    ratio = (ours["max_context"] / base["max_context"]
             if base["max_context"] else None)
    print(json.dumps({
        "metric": "llama31_8b_qlora_max_context_one_chip"
                  + ("" if num_layers == 32 else f"_layers{num_layers}"),
        "value": ours["max_context"],
        "unit": "tokens of trainable context (b1, full depth)",
        "vs_baseline": round(ratio, 2) if ratio else None,
        "detail": {"layers": num_layers, "ours": ours,
                   "baseline": dict(
                       definition="HF-QLoRA equivalent: NF4 "
                                  "dequantize-per-use + full-logits CE, "
                                  "same ladder method",
                       **base),
                   "ladders": {"ours": ours_ladder,
                               "baseline": base_ladder},
                   "backend": jax.default_backend()}}))


# ---------------------------------------------------------------------------
# Decode / serving — Llama-3.1-8B class
# ---------------------------------------------------------------------------

def main_decode(quick: bool):
    """Decode (serving) throughput: NF4 8B on one chip, dense ratio.

    The decode win for NF4 on a v5e is CAPACITY, not bandwidth: dense
    bf16 8B weights alone exceed one chip's 16 GB HBM, so the full-depth
    value below is a throughput dense cannot post at all. At a common
    reduced depth where both fit, dense decode is FASTER (measured
    per-projection at m=8: dense 701 us, NF4 dequant+matmul 868 us, of
    which the NF4 decode alone is 820 us) — the VPU select-chain decode
    of 16.7M nibbles costs more than the 24 MB of HBM reads it saves,
    the mirror of the training roofline in BASELINE_notes.md. The
    emitted vs_baseline is that honest common-depth NF4/dense ratio
    (< 1); `value` is the full-depth 8B NF4 number.
    """
    import jax
    import jax.numpy as jnp

    from bench import build_model, llama31_8b_config, weight_gb
    from unsloth_tpu.inference.generate import SamplingParams, _generate_jit

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 32)
    base_layers = _env_int("BENCH_BASE_LAYERS",
                           min(num_layers, 2 if quick else 8))
    bsz = _env_int("BENCH_BATCH", 8)
    p_len = _env_int("BENCH_PROMPT_LEN", 64 if quick else 128)
    new_toks = _env_int("BENCH_NEW_TOKENS", 16 if quick else 128)

    key = jax.random.PRNGKey(0)
    sp = SamplingParams(max_tokens=new_toks, temperature=0.0)
    eos_ids = jnp.asarray([], jnp.int32)  # never stop early

    def run(cfg, quantize, decode_cache=None):
        params = build_model(cfg, key, quantize=quantize)
        cache_stats = None
        if decode_cache is not None:
            from unsloth_tpu.inference.decode_cache import \
                apply_decode_cache

            params, cache_stats = apply_decode_cache(
                params, hbm_budget_gb=decode_cache)
        pid = jax.random.randint(key, (bsz, p_len), 10,
                                 cfg.vocab_size - 10)
        pmask = jnp.ones((bsz, p_len), jnp.int32)

        def once():
            return _generate_jit(params, None, pid, pmask, cfg,
                                 jax.random.PRNGKey(0), new_toks,
                                 eos_ids, sp)

        float(jnp.sum(once()))          # compile + sync (axon gotcha)
        t0 = time.perf_counter()
        float(jnp.sum(once()))
        dt = time.perf_counter() - t0
        return (bsz * new_toks / dt, dt) + (
            (cache_stats,) if decode_cache is not None else ())

    cfg_full = llama31_8b_config(num_layers)
    tps_full, dt_full = run(cfg_full, True)
    # decode-cache arm (inference/decode_cache.py — the fast_gemv-analog
    # lever): spare HBM spent on persistent dense copies; at full depth
    # only some layers fit, at common depth all do (== dense speed).
    try:
        tps_cache_full, _, cache_stats = run(cfg_full, True,
                                             decode_cache="auto")
    except Exception as e:  # noqa: BLE001
        print(f"decode-cache full-depth arm failed: {str(e)[:300]}",
              file=sys.stderr)
        tps_cache_full, cache_stats = None, None

    cfg_c = llama31_8b_config(base_layers)
    tps_nf4_c, _ = run(cfg_c, True)
    tps_dense_c, _ = run(cfg_c, False)
    try:
        tps_cache_c, _, _ = run(cfg_c, True, decode_cache="auto")
    except Exception as e:  # noqa: BLE001
        print(f"decode-cache common-depth arm failed: {str(e)[:300]}",
              file=sys.stderr)
        tps_cache_c = None

    # Achieved weight-stream bandwidth at full depth (all rows of a batch
    # share one weight read per step; prefill amortized into dt).
    w_bytes = weight_gb(cfg_full, 0.55) * 1e9
    bw_util = w_bytes * new_toks / dt_full / 819e9

    import json as _json
    print(_json.dumps({
        "metric": "llama31_8b_nf4_decode_tokens_per_sec_per_chip"
                  + ("" if num_layers == 32 else f"_layers{num_layers}"),
        "value": round(tps_full, 2),
        "unit": "generated tokens/s/chip",
        "vs_baseline": (round(tps_cache_c / tps_dense_c, 3)
                        if tps_cache_c else
                        round(tps_nf4_c / tps_dense_c, 3)),
        "detail": {
            "layers": num_layers, "batch": bsz, "prompt_len": p_len,
            "new_tokens": new_toks,
            "generate_time_s": round(dt_full, 3),
            "hbm_weight_bw_utilization": round(bw_util, 3),
            "decode_cache": {
                "definition": "for_inference(decode_cache='auto'): NF4 "
                              "weights dequantized ONCE to persistent "
                              "dense bf16 under the spare-HBM budget "
                              "(inference/decode_cache.py, the "
                              "fast_gemv-analog); vs_baseline is the "
                              "cached NF4 model vs dense at common "
                              "depth",
                "full_depth_tokens_per_sec": (round(tps_cache_full, 2)
                                              if tps_cache_full else None),
                "full_depth_speedup_vs_plain_nf4": (
                    round(tps_cache_full / tps_full, 3)
                    if tps_cache_full else None),
                "weights_converted": (cache_stats or {}).get("converted"),
                "weights_kept_nf4": (cache_stats or {}).get("skipped"),
                "cache_extra_gb": (round(
                    cache_stats["extra_bytes"] / 1e9, 2)
                    if cache_stats else None),
                "common_depth_tokens_per_sec": (round(tps_cache_c, 2)
                                                if tps_cache_c else None),
            },
            "baseline": {
                "definition": "dense bf16 decode at a reduced depth both"
                              " paths fit (full-depth dense 8B weights "
                              "exceed one v5e chip's HBM); same batch, "
                              "same greedy loop. vs_baseline uses the "
                              "decode-cache arm when it ran (at common "
                              "depth the whole model fits the budget so "
                              "it should approach 1.0); the kernel-only "
                              "plain-NF4 ratio stays < 1 — on v5e the "
                              "VPU nibble decode costs more than the "
                              "bytes it saves (roofline: "
                              "scripts/decode_roofline.py)",
                "common_depth_layers": base_layers,
                "nf4_tokens_per_sec": round(tps_nf4_c, 2),
                "plain_nf4_vs_dense": round(tps_nf4_c / tps_dense_c, 3),
                "dense_tokens_per_sec": round(tps_dense_c, 2)},
            "backend": jax.default_backend(),
        }}))


# ---------------------------------------------------------------------------
# Speculative decoding — Llama-8B-class, self-similar context
# ---------------------------------------------------------------------------

def main_spec(quick: bool):
    """N-gram speculative decoding speedup at 8B-class shapes.

    The workload is a repeated-phrase context (the regime prompt-lookup
    targets: extraction, code edits, multi-turn chat with quoting).
    vs_baseline = plain-decode time / speculative time on the SAME
    greedy workload — both paths produce the same tokens (exact in f32;
    bf16 argmax ties can flip on random-init weights, reported as
    `agreement`)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_model, llama31_8b_config
    from unsloth_tpu.inference.generate import (SamplingParams,
                                                _generate_jit)
    from unsloth_tpu.inference.speculative import _generate_ngram_spec_jit

    # quick keeps 8 layers/64 tokens: acceptance needs enough decode
    # steps for the lookup to pay (2L/16tok measures mostly overhead)
    num_layers = _env_int("BENCH_LAYERS", 8 if quick else 32)
    new_toks = _env_int("BENCH_NEW_TOKENS", 64)
    draft_len = _env_int("BENCH_DRAFT_LEN", 6)

    cfg = llama31_8b_config(num_layers)
    params = build_model(cfg, jax.random.PRNGKey(0), quantize=True)
    phrase = list(range(100, 116))
    prompt = np.asarray([phrase * 8], np.int32)
    mask = np.ones_like(prompt)
    eos = jnp.asarray([], jnp.int32)
    sp = SamplingParams(max_tokens=new_toks, temperature=0.0)

    def run_plain():
        o = _generate_jit(params, None, jnp.asarray(prompt),
                          jnp.asarray(mask), cfg, jax.random.PRNGKey(0),
                          new_toks, eos, sp)
        float(jnp.sum(o))
        return o

    def run_spec():
        o, it = _generate_ngram_spec_jit(
            params, None, jnp.asarray(prompt), jnp.asarray(mask), cfg,
            new_toks, eos, draft_len=draft_len)
        float(jnp.sum(o))
        return o, it

    ref = run_plain()
    t0 = time.perf_counter()
    ref = run_plain()
    dt_plain = time.perf_counter() - t0
    out, iters = run_spec()
    t0 = time.perf_counter()
    out, iters = run_spec()
    dt_spec = time.perf_counter() - t0
    agree = float((np.asarray(out) == np.asarray(ref)).mean())

    print(json.dumps({
        "metric": "llama31_8b_ngram_speculative_decode_speedup"
                  + ("" if num_layers == 32 else f"_layers{num_layers}"),
        "value": round(dt_plain / dt_spec, 3),
        "unit": "x plain greedy decode (same tokens)",
        "vs_baseline": round(dt_plain / dt_spec, 3),
        "detail": {
            "layers": num_layers, "new_tokens": new_toks,
            "draft_len": draft_len,
            "plain_time_s": round(dt_plain, 3),
            "spec_time_s": round(dt_spec, 3),
            "weight_passes": int(iters),
            "tokens_per_weight_pass": round(new_toks / int(iters), 2),
            "token_agreement": agree,
            "note": "self-similar context (prompt-lookup's target "
                    "regime); bf16 argmax ties explain agreement < 1 on "
                    "random-init weights (f32 verified bit-exact)",
            "backend": jax.default_backend()},
    }))


# ---------------------------------------------------------------------------
# CPU LoRA — Qwen2.5-0.5B class, measured HF+PEFT torch baseline
# ---------------------------------------------------------------------------

def main_cpu_lora(quick: bool):
    """Driver config 1 (BASELINE.md:33): Qwen2.5-0.5B LoRA SFT, fp32, on
    the CPU backend. Unlike the TPU modes, the HF+PEFT baseline here is
    MEASURED, not modeled: torch (CPU) + transformers Qwen2ForCausalLM
    (eager) + peft LoRA run the identical [B, T] fp32 workload on the
    same host, so vs_baseline is a true same-hardware HF-vs-us ratio
    (the reference's published "2x vs HF+PEFT" methodology,
    /root/reference/README.md:58, measured rather than claimed).

    Dims are Qwen2.5-0.5B (hidden 896, inter 4864, 14h/2kv, qkv bias,
    vocab 151936) at BENCH_LAYERS depth — both paths depth-reduced
    identically, so the ratio carries."""
    import time as _time

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import measure
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.params import init_lora_tree, init_params

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 4)
    seq = _env_int("BENCH_SEQ", 128 if quick else 1024)
    bsz = _env_int("BENCH_BATCH", 1)
    n_steps = _env_int("BENCH_STEPS", 2)
    vocab = _env_int("BENCH_VOCAB", 8192 if quick else 151936)

    cfg = ModelConfig(
        model_type="qwen2", name="qwen2.5-0.5b-bench",
        vocab_size=vocab, hidden_size=896, intermediate_size=4864,
        num_layers=num_layers, num_heads=14, num_kv_heads=2, head_dim=64,
        rope_theta=1000000.0, max_position_embeddings=32768,
        attention_bias=True, o_proj_bias=False,
    )
    key = jax.random.PRNGKey(0)
    ids = np.asarray(jax.random.randint(key, (bsz, seq), 0, vocab))
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids)}

    params = init_params(cfg, key, dtype=jnp.float32)
    lora = init_lora_tree(cfg, key, r=16, alpha=16, dtype=jnp.float32)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)

    # TPU memory levers are pure overhead here: remat recomputes every
    # layer forward in the backward (+1/3 FLOPs torch eager doesn't pay)
    # and the chunked fused-CE scan serializes the lm_head. Host RAM
    # holds the full [B,T,V] logits, so run without both.
    from unsloth_tpu.models.decoder import loss_fn

    def _step(lora, opt_state, params, batch):
        loss, grads = jax.value_and_grad(
            lambda l: loss_fn(params, l, batch, cfg, fused_ce=False,
                              remat=False))(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    step = jax.jit(_step, donate_argnums=(0, 1))
    dt_ours, loss = measure(step, lora, opt_state, params, batch,
                            n_steps, warmup=1)
    tps_ours = ids.size / dt_ours
    del params, lora, opt_state

    # ---- HF+PEFT torch CPU eager baseline (same dims, same batch) ----
    import torch
    from peft import LoraConfig, get_peft_model
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(
        vocab_size=vocab, hidden_size=896, intermediate_size=4864,
        num_hidden_layers=num_layers, num_attention_heads=14,
        num_key_value_heads=2, max_position_embeddings=32768,
        rope_theta=1000000.0, tie_word_embeddings=False,
        attn_implementation="eager", use_cache=False)
    hf = Qwen2ForCausalLM(hf_cfg).float()
    hf = get_peft_model(hf, LoraConfig(
        r=16, lora_alpha=16, lora_dropout=0.0, bias="none",
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj"]))
    hf.train()
    opt = torch.optim.AdamW(
        [p for p in hf.parameters() if p.requires_grad], lr=1e-4)
    t_ids = torch.from_numpy(ids).long()

    def hf_step():
        opt.zero_grad()
        out = hf(input_ids=t_ids, labels=t_ids)
        out.loss.backward()
        opt.step()
        return float(out.loss.detach())

    hf_loss = hf_step()  # warmup
    t0 = _time.perf_counter()
    for _ in range(n_steps):
        hf_loss = hf_step()
    dt_hf = (_time.perf_counter() - t0) / n_steps
    tps_hf = ids.size / dt_hf

    print(json.dumps({
        "metric": "qwen25_05b_cpu_lora_tokens_per_sec"
                  + ("" if num_layers == 24 else f"_layers{num_layers}"),
        "value": round(tps_ours, 2),
        "unit": "tokens/s (fp32, CPU)",
        "vs_baseline": round(tps_ours / tps_hf, 3),
        "detail": {
            "layers": num_layers, "seq": seq, "batch": bsz,
            "vocab": vocab,
            "step_time_s": round(dt_ours, 4), "loss": round(loss, 3),
            "baseline": {
                "definition": "HF+PEFT LoRA, torch CPU eager, identical "
                              "dims/batch/steps on the same host "
                              "(transformers Qwen2ForCausalLM + peft)",
                "baseline_tokens_per_sec": round(tps_hf, 2),
                "baseline_step_time_s": round(dt_hf, 4),
                "baseline_loss": round(hf_loss, 3)},
            "backend": jax.default_backend()},
    }))


def _embed_problem(cfg, vocab, bsz, seq, dtype):
    """Shared MNRL problem builder for the embed benches: params (given
    dtype), anchor/positive token ids, mask, and the jitted train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from unsloth_tpu.models.bert import bert_forward
    from unsloth_tpu.models.sentence_transformer import (
        mean_pool, multiple_negatives_ranking_loss)

    key = jax.random.PRNGKey(0)

    def rand(*shape, scale=0.02):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape, jnp.float32).astype(dtype) \
            * jnp.asarray(scale, dtype)

    def lin(o, i):
        return {"kernel": rand(i, o), "bias": jnp.zeros((o,), dtype)}

    def ln(d):
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    d, inter = cfg.hidden_size, cfg.intermediate_size
    params = {
        "word_embed": rand(vocab, d),
        "pos_embed": rand(cfg.max_position_embeddings, d),
        "type_embed": rand(cfg.type_vocab_size, d),
        "embed_ln": ln(d),
        "layers": [{
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
            "attn_out": lin(d, d), "attn_ln": ln(d),
            "fc1": lin(inter, d), "fc2": lin(d, inter), "out_ln": ln(d),
        } for _ in range(cfg.num_layers)],
    }

    rng = np.random.RandomState(0)
    a_ids = rng.randint(0, vocab, (bsz, seq)).astype(np.int32)
    p_ids = rng.randint(0, vocab, (bsz, seq)).astype(np.int32)
    mask = np.ones((bsz, seq), np.int32)

    def embed(params, ids, mask):
        h = bert_forward(params, ids, mask, cfg)
        e = mean_pool(h, mask).astype(jnp.float32)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    def loss_fn(params, a, p, m):
        return multiple_negatives_ranking_loss(
            embed(params, a, m), embed(params, p, m), scale=20.0)

    tx = optax.adamw(2e-5)
    opt_state = tx.init(params)

    def _step(params, opt_state, a, p, m):
        loss, grads = jax.value_and_grad(loss_fn)(params, a, p, m)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(_step, donate_argnums=(0, 1))
    return params, opt_state, a_ids, p_ids, mask, step


def main_embed_tpu(quick: bool):
    """BENCH_MODEL=embed_tpu: the same MiniLM-class MNRL fine-tune step
    on the DEFAULT backend (the real chip, bf16 — what this framework
    actually delivers for embedding fine-tunes). No torch baseline can
    run there, so vs_baseline is null; the same-host CPU ratio lives in
    the `embed` artifact (reference claim: 1.8-3.3x embedding
    fine-tunes, /root/reference/README.md:219)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from unsloth_tpu.models.bert import BertConfig

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 6)
    seq = _env_int("BENCH_SEQ", 64 if quick else 128)
    bsz = _env_int("BENCH_BATCH", 4 if quick else 256)
    n_steps = _env_int("BENCH_STEPS", 2 if quick else 8)
    vocab = _env_int("BENCH_VOCAB", 30522)

    cfg = BertConfig(vocab_size=vocab, num_layers=num_layers)

    def run_variant(dtype):
        params, opt_state, a_ids, p_ids, mask, step = _embed_problem(
            cfg, vocab, bsz, seq, dtype)
        ja, jp, jm = (jnp.asarray(a_ids), jnp.asarray(p_ids),
                      jnp.asarray(mask))
        params, opt_state, loss = step(params, opt_state, ja, jp, jm)
        _sync(params)
        t0 = _time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, loss = step(params, opt_state, ja, jp, jm)
        _sync(params)
        return (_time.perf_counter() - t0) / n_steps, loss

    dt, loss = run_variant(jnp.bfloat16)
    tps = 2 * bsz * seq / dt

    # Same-device HF-equivalent baseline (VERDICT r4 #3): transformers /
    # sentence-transformers trains MiniLM in fp32 with SDPA attention —
    # the straight-JAX-port equivalent is the same step in fp32 through
    # the pure-jnp reference ops.
    base_dt = vs_baseline = None
    try:
        os.environ["UNSLOTH_DISABLE_PALLAS"] = "1"
        jax.clear_caches()
        base_dt, _ = run_variant(jnp.float32)
        vs_baseline = base_dt / dt
    except Exception as e:  # noqa: BLE001
        print(f"embed_tpu baseline failed: {str(e)[:300]}",
              file=sys.stderr)
    finally:
        os.environ.pop("UNSLOTH_DISABLE_PALLAS", None)
        jax.clear_caches()

    print(json.dumps({
        "metric": "minilm_l6_mnrl_embed_tpu_tokens_per_sec_per_chip"
                  + ("" if num_layers == 6 else f"_layers{num_layers}"),
        "value": round(tps, 2),
        "unit": "tokens/s/chip (bf16)",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "detail": {
            "layers": num_layers, "seq": seq, "batch_pairs": bsz,
            "vocab": vocab, "step_time_s": round(dt, 4),
            "loss": round(float(loss), 3),
            "baseline": {
                "definition": "same MNRL step, fp32 params + pure-jnp "
                              "reference ops (UNSLOTH_DISABLE_PALLAS=1) "
                              "— the straight-JAX-port of how "
                              "sentence-transformers trains MiniLM "
                              "(fp32, SDPA); same device. The same-host "
                              "torch-CPU ratio is the `embed` artifact",
                "baseline_step_time_s": (round(base_dt, 4)
                                         if base_dt else None)},
            "backend": jax.default_backend()},
    }))


def main_embed(quick: bool):
    """BENCH_MODEL=embed: MiniLM-class sentence-embedding MNRL fine-tune
    with a MEASURED HF baseline (reference claims 1.8-3.3x on embedding
    fine-tunes, /root/reference/README.md:219).

    Same-hardware methodology as main_cpu_lora: both paths run the
    identical all-MiniLM-L6-v2-dim MNRL full-finetune step (mean-pool,
    L2-normalize, in-batch-negatives CE at scale 20 — what
    sentence-transformers' MultipleNegativesRankingLoss computes) on the
    CPU backend of this host; torch eager transformers BertModel is the
    baseline. vs_baseline is a true HF-vs-us ratio, not a model."""
    import time as _time

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from unsloth_tpu.models.bert import BertConfig

    num_layers = _env_int("BENCH_LAYERS", 2 if quick else 6)
    seq = _env_int("BENCH_SEQ", 64 if quick else 128)
    bsz = _env_int("BENCH_BATCH", 4 if quick else 16)
    n_steps = _env_int("BENCH_STEPS", 2)
    vocab = _env_int("BENCH_VOCAB", 30522)

    cfg = BertConfig(vocab_size=vocab, num_layers=num_layers)
    d, inter = cfg.hidden_size, cfg.intermediate_size
    params, opt_state, a_ids, p_ids, mask, step = _embed_problem(
        cfg, vocab, bsz, seq, jnp.float32)
    ja, jp, jm = jnp.asarray(a_ids), jnp.asarray(p_ids), jnp.asarray(mask)
    params, opt_state, loss = step(params, opt_state, ja, jp, jm)  # compile
    _sync(params)
    # min over timing rounds: this single-core host also serves the TPU
    # tunnel, so any avg can absorb a contention burst (the r4a artifact
    # measured 18.5 s/step for a 4.6 s step that way); the fastest round
    # is the least-contended estimate on BOTH sides symmetrically
    rounds = _env_int("BENCH_ROUNDS", 3)
    dt_ours = float("inf")
    for _ in range(rounds):
        t0 = _time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, loss = step(params, opt_state, ja, jp, jm)
        _sync(params)
        dt_ours = min(dt_ours, (_time.perf_counter() - t0) / n_steps)
    loss_ours = float(loss)
    # 2 towers x bsz rows x seq tokens per step
    tps_ours = 2 * bsz * seq / dt_ours
    del params, opt_state

    # ---- HF torch CPU eager baseline (same dims, same batch) ----
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    torch.manual_seed(0)
    hf = BertModel(HFBertConfig(
        vocab_size=vocab, hidden_size=d, num_hidden_layers=num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=inter,
        max_position_embeddings=cfg.max_position_embeddings,
        attn_implementation="eager")).float()
    hf.train()
    opt = torch.optim.AdamW(hf.parameters(), lr=2e-5)
    t_a = torch.from_numpy(a_ids).long()
    t_p = torch.from_numpy(p_ids).long()
    t_m = torch.from_numpy(mask).long()

    def hf_embed(ids):
        h = hf(input_ids=ids, attention_mask=t_m).last_hidden_state
        m = t_m.unsqueeze(-1).float()
        e = (h * m).sum(1) / m.sum(1)
        return torch.nn.functional.normalize(e, dim=-1)

    def hf_step():
        opt.zero_grad()
        ea, ep = hf_embed(t_a), hf_embed(t_p)
        logits = 20.0 * ea @ ep.T
        loss = torch.nn.functional.cross_entropy(
            logits, torch.arange(bsz))
        loss.backward()
        opt.step()
        return float(loss.detach())

    hf_loss = hf_step()  # warmup
    dt_hf = float("inf")
    for _ in range(rounds):
        t0 = _time.perf_counter()
        for _ in range(n_steps):
            hf_loss = hf_step()
        dt_hf = min(dt_hf, (_time.perf_counter() - t0) / n_steps)
    tps_hf = 2 * bsz * seq / dt_hf

    print(json.dumps({
        "metric": "minilm_l6_mnrl_embed_tokens_per_sec"
                  + ("" if num_layers == 6 else f"_layers{num_layers}"),
        "value": round(tps_ours, 2),
        "unit": "tokens/s (fp32, CPU)",
        "vs_baseline": round(tps_ours / tps_hf, 3),
        "detail": {
            "layers": num_layers, "seq": seq, "batch_pairs": bsz,
            "vocab": vocab, "step_time_s": round(dt_ours, 4),
            "timing": f"min over {rounds} rounds of {n_steps} steps "
                      f"(contention-robust; host has {os.cpu_count()} "
                      "CPU core(s))",
            "loss": round(loss_ours, 3),
            "baseline": {
                "definition": "HF transformers BertModel, torch CPU "
                              "eager, identical MNRL full-FT step "
                              "(mean-pool + normalize + in-batch-"
                              "negatives CE) on the same host",
                "baseline_tokens_per_sec": round(tps_hf, 2),
                "baseline_step_time_s": round(dt_hf, 4),
                "baseline_loss": round(hf_loss, 3)},
            "backend": jax.default_backend()},
    }))
