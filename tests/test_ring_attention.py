"""Ring attention (context parallelism) parity on the 8-device CPU mesh —
beyond-reference capability (SURVEY §2j: the reference has no CP)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.ops.attention import attention_ref
from unsloth_tpu.parallel.mesh import create_mesh
from unsloth_tpu.parallel.ring_attention import ring_attention_sharded

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _qkv(rng, b=2, t=64, h=4, d=16):
    k1, k2, k3 = jax.random.split(rng, 3)
    return (jax.random.normal(k1, (b, t, h, d), jnp.float32),
            jax.random.normal(k2, (b, t, h, d), jnp.float32),
            jax.random.normal(k3, (b, t, h, d), jnp.float32))


@pytest.mark.slow
@requires_8
@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_reference(rng, causal):
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("sp",))
    q, k, v = _qkv(rng)
    fn = ring_attention_sharded(mesh, "sp", causal=causal)
    out = fn(q, k, v)
    ref = attention_ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@requires_8
def test_ring_grads_match_reference(rng):
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("sp",))
    q, k, v = _qkv(rng, b=1, t=32)
    fn = ring_attention_sharded(mesh, "sp", causal=True)

    def f_ring(q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(attention_ref(q, k, v, causal=True)))

    g1 = jax.grad(f_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.slow
@requires_8
def test_ring_packed_segments_matches_reference(rng):
    """Segment ids (packing) + GQA travel the ring correctly."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("sp",))
    b, t, hq, hkv, d = 2, 64, 4, 2, 16
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (b, t, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, hkv, d), jnp.float32)
    seg = jnp.asarray(
        np.repeat(np.arange(1, 5), t // 4)[None, :].repeat(b, 0), jnp.int32)
    fn = ring_attention_sharded(mesh, "sp", causal=True,
                                with_segment_ids=True)
    out = fn(q, k, v, seg)
    ref = attention_ref(q, k, v, causal=True, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@requires_8
def test_attention_dispatch_routes_to_ring(rng):
    """ops/attention.attention uses the ring inside an active
    context_parallel, and the result matches the reference."""
    from unsloth_tpu.ops.attention import attention
    from unsloth_tpu.parallel.context import context_parallel

    mesh = create_mesh(dp=1, fsdp=2, sp=4, tp=1)
    b, t, hq, hkv, d = 2, 64, 4, 2, 16
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, t, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, hkv, d), jnp.float32)
    seg = jnp.asarray(
        np.repeat(np.arange(1, 5), t // 4)[None, :].repeat(b, 0), jnp.int32)

    with context_parallel(mesh):
        out = jax.jit(lambda q, k, v, s: attention(
            q, k, v, causal=True, segment_ids=s))(q, k, v, seg)
    ref = attention_ref(q, k, v, causal=True, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@requires_8
def test_sft_trainer_context_parallel(rng):
    """End-to-end: SFTTrainer on an sp=4 mesh matches single-device loss
    (the decoder+trainer route, not just the op)."""
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_lora_tree, init_params
    from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer

    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      max_position_embeddings=128)
    data = np.random.RandomState(0)
    ds = [{"input_ids": data.randint(3, 250, 40).tolist()}
          for _ in range(32)]

    def run(mesh):
        params = init_params(cfg, rng, dtype=jnp.float32)
        model = LanguageModel(cfg=cfg, params=params, mesh=mesh,
                              max_seq_length=64)
        model.lora = init_lora_tree(cfg, rng, r=4, alpha=8)
        # equal GLOBAL batch: mesh run multiplies by dp*fsdp (=2)
        per_dev = 4 if mesh is None else 2
        args = SFTConfig(per_device_train_batch_size=per_dev, max_steps=3,
                         max_seq_length=64, packing=True,
                         learning_rate=1e-3, logging_steps=1)
        tr = SFTTrainer(model, train_dataset=ds, args=args)
        tr.train()
        return [e["loss"] for e in tr.state_log]

    ref = run(None)
    got = run(create_mesh(dp=1, fsdp=2, sp=4, tp=1))
    np.testing.assert_allclose(got, ref, rtol=2e-4)


@requires_8
@pytest.mark.parametrize("window,softcap", [
    (16, None), (16, 20.0), (None, 20.0)])
@pytest.mark.slow
def test_ring_window_softcap_matches_reference(rng, window, softcap):
    """Sliding-window + softcap under sp-axis context parallelism
    (mistral window / gemma-2 softcap+window class models; r2 VERDICT
    weak #6 — the guard list shrinks)."""
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("sp",))
    q, k, v = _qkv(rng)
    fn = ring_attention_sharded(mesh, "sp", causal=True, window=window,
                                softcap=softcap)
    out = fn(q, k, v)
    ref = attention_ref(q, k, v, causal=True, window=window,
                        softcap=softcap)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@requires_8
def test_ring_windowed_packed_segments(rng):
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("sp",))
    q, k, v = _qkv(rng)
    seg = np.ones((2, 64), np.int32)
    seg[:, 40:] = 2
    seg = jnp.asarray(seg)
    fn = ring_attention_sharded(mesh, "sp", causal=True, window=24,
                                with_segment_ids=True)
    out = fn(q, k, v, seg)
    ref = attention_ref(q, k, v, causal=True, window=24, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@requires_8
def test_attention_dispatch_routes_windowed_to_ring(rng):
    """attention() inside an sp context no longer excludes windowed
    models."""
    import importlib

    attn_mod = importlib.import_module("unsloth_tpu.ops.attention")
    from unsloth_tpu.parallel.context import context_parallel

    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("sp",))
    q, k, v = _qkv(rng)
    with context_parallel(mesh, "sp"):
        out = attn_mod.attention(q, k, v, causal=True, window=16)
    ref = attention_ref(q, k, v, causal=True, window=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@requires_8
def test_ring_sinks_matches_reference(rng):
    """gpt-oss attention sinks under the sp axis: the running (m, l)
    after the full ring give the global lse, so the sink correction is
    exact — parity with attention_ref(sinks=...)."""
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("sp",))
    q, k, v = _qkv(rng)
    sinks = jax.random.normal(jax.random.PRNGKey(9), (4,), jnp.float32)
    fn = ring_attention_sharded(mesh, "sp", causal=True, sinks=sinks)
    out = fn(q, k, v)
    ref = attention_ref(q, k, v, causal=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    # sliding-window + sinks together (the gpt-oss alternating layer)
    fn = ring_attention_sharded(mesh, "sp", causal=True, sinks=sinks,
                                window=16)
    out = fn(q, k, v)
    ref = attention_ref(q, k, v, causal=True, sinks=sinks, window=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@requires_8
def test_attention_dispatch_ring_sinks(rng):
    """The attention dispatcher routes sink models through ring
    attention when context parallelism is active (gpt-oss under sp)."""
    import numpy as np

    from unsloth_tpu.ops.attention import attention
    from unsloth_tpu.parallel.context import context_parallel

    mesh = create_mesh(dp=1, fsdp=2, sp=4, tp=1)
    q, k, v = _qkv(rng)
    sinks = jax.random.normal(jax.random.PRNGKey(3), (4,), jnp.float32)
    with context_parallel(mesh, "sp"):
        got = jax.jit(lambda q, k, v: attention(
            q, k, v, causal=True, sinks=sinks))(q, k, v)
    ref = attention_ref(q, k, v, causal=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
