"""Multi-chip sharding tests on the 8-virtual-device CPU mesh — the
TPU-native answer to the reference's env-var-spoofed DDP tests
(reference: tests/test_grpo_ddp_model_config.py with fake RANK/WORLD_SIZE;
SURVEY §4 notes the rebuild should instead run real sharded programs on
virtual devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.decoder import loss_fn
from unsloth_tpu.models.params import (init_lora_tree, init_params,
                                       quantize_params)
from unsloth_tpu.parallel.mesh import ShardingRules, create_mesh


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _cfg():
    return ModelConfig(vocab_size=512, hidden_size=128,
                       intermediate_size=256, num_layers=2, num_heads=4,
                       num_kv_heads=2, max_position_embeddings=128)


@requires_8
@pytest.mark.parametrize("dp,fsdp,tp", [(2, 2, 2), (1, 8, 1), (8, 1, 1),
                                        (1, 1, 8)])
@pytest.mark.slow
def test_sharded_loss_matches_single_device(dp, fsdp, tp, rng):
    """The same loss must come out regardless of mesh factorization."""
    cfg = _cfg()
    params = init_params(cfg, rng, dtype=jnp.float32)
    lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    ids = jax.random.randint(rng, (8, 64), 0, cfg.vocab_size)
    batch = {"input_ids": ids, "labels": ids}

    ref_loss = float(loss_fn(params, lora, batch, cfg, remat=False))

    mesh = create_mesh(dp=dp, fsdp=fsdp, tp=tp)
    batch_sharding = NamedSharding(mesh, P(("dp", "fsdp"), None))
    sharded_batch = jax.device_put(batch, batch_sharding)
    # shard embed/lm_head rows over tp, replicate the rest
    rules = {"embed": P("tp"), "lm_head": P("tp")}

    def place(path, x):
        name = getattr(path[0], "key", None) if path else None
        spec = rules.get(name, P())
        return jax.device_put(x, NamedSharding(mesh, spec))

    sharded_params = jax.tree_util.tree_map_with_path(place, params)
    sharded_lora = jax.device_put(lora, NamedSharding(mesh, P()))

    with mesh:
        loss = jax.jit(lambda p, l, b: loss_fn(p, l, b, cfg, remat=False))(
            sharded_params, sharded_lora, sharded_batch)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-5)


@pytest.mark.slow
@requires_8
def test_sharded_grads_match_single_device(rng):
    cfg = _cfg()
    params = init_params(cfg, rng, dtype=jnp.float32)
    lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    ids = jax.random.randint(rng, (8, 32), 0, cfg.vocab_size)
    batch = {"input_ids": ids, "labels": ids}

    g_ref = jax.grad(lambda l: loss_fn(params, l, batch, cfg,
                                       remat=False))(lora)

    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    sharded_batch = jax.device_put(
        batch, NamedSharding(mesh, P(("dp", "fsdp"), None)))
    sharded_params = jax.device_put(params, NamedSharding(mesh, P()))
    sharded_lora = jax.device_put(lora, NamedSharding(mesh, P()))
    with mesh:
        g = jax.jit(jax.grad(lambda l, p, b: loss_fn(p, l, b, cfg,
                                                     remat=False)))(
            sharded_lora, sharded_params, sharded_batch)
    a1 = np.asarray(g_ref["layers"][0]["q"].b)
    a2 = np.asarray(g["layers"][0]["q"].b)
    np.testing.assert_allclose(a1, a2, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
@requires_8
def test_qlora_sharded_step(rng):
    """NF4 pytrees shard and train under a mesh (packed rows over fsdp)."""
    import optax

    cfg = _cfg()
    params = quantize_params(init_params(cfg, rng, dtype=jnp.float32), cfg,
                             dtype=jnp.float32)
    lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    mesh = create_mesh(dp=1, fsdp=8, tp=1)

    def place(path, x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] % 8 == 0:
            return jax.device_put(x, NamedSharding(mesh, P("fsdp")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    params = jax.tree_util.tree_map_with_path(place, params)
    lora = jax.device_put(lora, NamedSharding(mesh, P()))
    ids = jax.random.randint(rng, (8, 32), 0, cfg.vocab_size)
    batch = jax.device_put({"input_ids": ids, "labels": ids},
                           NamedSharding(mesh, P(("dp", "fsdp"), None)))

    tx = optax.adamw(1e-3)
    opt_state = tx.init(lora)

    @jax.jit
    def step(lora, opt_state, params, batch):
        loss, grads = jax.value_and_grad(
            lambda l: loss_fn(params, l, batch, cfg))(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    with mesh:
        lora, opt_state, l1 = step(lora, opt_state, params, batch)
        lora, opt_state, l2 = step(lora, opt_state, params, batch)
    assert float(l2) < float(l1)


@pytest.mark.slow
@requires_8
def test_dryrun_multichip_entry():
    """The driver-facing dryrun must pass on 8 virtual devices."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
@requires_8
@pytest.mark.parametrize("dp,fsdp,tp", [(2, 4, 1), (1, 8, 1)])
def test_sft_trainer_trains_on_mesh(dp, fsdp, tp, rng):
    """End-to-end SFTTrainer on a mesh: batches are device_put with a
    (dp, fsdp)-sharded batch dim, trainables placed, and the loss matches
    the single-device run step for step (VERDICT r1 weak #3)."""
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer

    def build(mesh):
        cfg = _cfg()
        params = init_params(cfg, rng, dtype=jnp.float32)
        model = LanguageModel(cfg=cfg, params=params, mesh=mesh,
                              max_seq_length=64)
        model.lora = init_lora_tree(cfg, rng, r=4, alpha=8)
        if mesh is not None:
            from unsloth_tpu.models.loader import _make_param_placer

            placer = _make_param_placer(mesh, None)

            def place(path, x):
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                return placer(name, x)

            model.params = jax.tree_util.tree_map_with_path(
                place, model.params)
        return model

    data = np.random.RandomState(0)
    ds = [{"input_ids": data.randint(3, 500, 48).tolist()}
          for _ in range(64)]

    def run(mesh):
        # per-device bs 1 => global bs scales with dp*fsdp; use per-device
        # bs that yields the same global batch either way so losses match.
        n = 1 if mesh is None else int(
            mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1))
        args = SFTConfig(per_device_train_batch_size=8 // n,
                         max_steps=3, max_seq_length=64, packing=True,
                         learning_rate=1e-3, report_to="none",
                         logging_steps=1)
        tr = SFTTrainer(build(mesh), train_dataset=ds, args=args)
        tr.train()
        return [e["loss"] for e in tr.state_log]

    ref = run(None)
    mesh = create_mesh(dp=dp, fsdp=fsdp, tp=tp)
    got = run(mesh)
    np.testing.assert_allclose(got, ref, rtol=2e-4)


@pytest.mark.slow
@requires_8
def test_grpo_trainer_trains_on_mesh(rng):
    """GRPOTrainer places rollout batches on the mesh and steps (smoke)."""
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.trainer.grpo import GRPOConfig, GRPOTrainer
    from test_trainer_grpo import CharTokenizer

    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    params = init_params(cfg, rng, dtype=jnp.float32)
    model = LanguageModel(cfg=cfg, params=params, mesh=mesh,
                          tokenizer=CharTokenizer())
    model.lora = init_lora_tree(cfg, rng, r=4, alpha=8)

    args = GRPOConfig(per_device_train_batch_size=2, num_generations=4,
                      max_prompt_length=16, max_completion_length=8,
                      max_steps=2, beta=0.0, report_to="none")
    tr = GRPOTrainer(model, reward_funcs=[
        lambda prompts, completions, **kw: [float(len(c))
                                            for c in completions]],
        args=args, train_dataset=[{"prompt": "ab"}, {"prompt": "cd"}])
    out = tr.train()
    assert out.global_step == 2
    assert np.isfinite(out.training_loss)


_DRYRUN_LOADER = (
    "import importlib.util\n"
    "spec = importlib.util.spec_from_file_location("
    "'graft_entry', '/root/repo/__graft_entry__.py')\n"
    "m = importlib.util.module_from_spec(spec)\n"
    "spec.loader.exec_module(m)\n"
    "m.dryrun_multichip(8)\n"
)


def _clean_env():
    """Env without conftest's CPU forcing — what the driver actually has."""
    import os

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.slow
def test_dryrun_driver_env_fresh_process():
    """Round-1 regression: the dryrun must work in a process where no jax
    backend is initialized and NO env var forces CPU (the driver's exact
    situation; conftest.py pre-forces CPU, so this must run in a clean
    subprocess). The dryrun must force the CPU fan-out itself, before any
    backend-initializing call."""
    import subprocess
    import sys

    r = subprocess.run([sys.executable, "-c", _DRYRUN_LOADER],
                       env=_clean_env(), cwd="/root/repo",
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "OK" in r.stdout


@pytest.mark.slow
def test_dryrun_after_backend_already_initialized():
    """If a too-small backend is already live (e.g. the single tunneled TPU
    chip after the driver's entry() compile check), the dryrun must still
    pass via its subprocess fallback. Simulated with a 1-device CPU backend
    so the test never touches the TPU tunnel."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) < 8, 'precondition: small backend'\n"
        + _DRYRUN_LOADER
    )
    r = subprocess.run([sys.executable, "-c", code],
                       env=_clean_env(), cwd="/root/repo",
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "OK" in r.stdout


def test_host_local_batch_and_init_distributed():
    """Multi-host helpers: init_distributed is a single-process no-op;
    host_local_batch assembles global batch arrays with ("dp","fsdp")
    sharding (works unchanged single-process)."""
    import numpy as np

    from unsloth_tpu.parallel.mesh import (create_mesh, host_local_batch,
                                           init_distributed)

    assert init_distributed() == jax.process_index() == 0
    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    batch = {"input_ids": np.arange(8 * 16).reshape(8, 16).astype(np.int32),
             "labels": np.ones((8, 16), np.int32)}
    global_batch = host_local_batch(mesh, batch)
    for k, v in global_batch.items():
        assert v.shape == batch[k].shape
        np.testing.assert_array_equal(np.asarray(v), batch[k])
        assert len(v.sharding.device_set) == 8


@requires_8
def test_packed_kernel_under_mesh():
    """The segment-block-sparse packed kernel composes with dp/fsdp/tp
    GSPMD sharding (VERDICT r4 weak #8): batch sharded over (dp, fsdp),
    heads over tp, full T per device (under sp the ring dispatch takes
    precedence — ops/attention.py dispatch rule)."""
    from unsloth_tpu.ops.attention import attention_ref
    from unsloth_tpu.ops.packed_attention import packed_flash_attention

    B, T, Hq, Hkv, D = 4, 256, 4, 2, 128
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, T, Hq, D), jnp.float32) * 0.5
    k = jnp.asarray(r.randn(B, T, Hkv, D), jnp.float32) * 0.5
    v = jnp.asarray(r.randn(B, T, Hkv, D), jnp.float32) * 0.5
    seg = np.zeros((B, T), np.int32)
    for b in range(B):
        pos, sid = 0, 1
        while pos < T - 32:
            L = min(int(r.randint(24, 96)), T - 32 - pos)
            seg[b, pos:pos + L] = sid
            pos += L
            sid += 1
    seg = jnp.asarray(seg)
    ref = attention_ref(q, k, v, causal=True, segment_ids=seg)

    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    qs = jax.device_put(q, NamedSharding(mesh, P(("dp", "fsdp"), None,
                                                 "tp", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P(("dp", "fsdp"), None,
                                                 "tp", None)))
    vs = jax.device_put(v, NamedSharding(mesh, P(("dp", "fsdp"), None,
                                                 "tp", None)))
    ss = jax.device_put(seg, NamedSharding(mesh, P(("dp", "fsdp"), None)))

    @jax.jit
    def run(q, k, v, seg):
        return packed_flash_attention(q, k, v, seg, max_segment_len=96,
                                      block=128, interpret=True)

    with mesh:
        out = run(qs, ks, vs, ss)
    real = np.broadcast_to((np.asarray(seg) != 0)[..., None, None],
                           ref.shape)
    err = np.abs(np.asarray(out) - np.asarray(ref))[real]
    assert err.max() < 2e-5, err.max()
