"""GaLore optimizer tests (reference: optimizers/q_galore_adamw.py — the
low-rank-projected-state optimizer for full fine-tuning)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from unsloth_tpu.optimizers.galore import galore, state_memory_ratio


def test_state_memory_compression():
    params = {"w": jnp.zeros((1024, 1024)), "b": jnp.zeros((1024,))}
    ratio = state_memory_ratio(params, rank=64)
    assert ratio < 0.3  # Adam would be 2.0


def test_quadratic_convergence():
    """GaLore must minimize a simple matrix least-squares problem."""
    key = jax.random.PRNGKey(0)
    target = jax.random.normal(key, (256, 256)) * 0.1
    w = jnp.zeros((256, 256))
    tx = galore(learning_rate=5e-2, rank=32, update_proj_gap=10,
                galore_scale=1.0, min_dim=64)
    state = tx.init({"w": w})

    @jax.jit
    def step(w, state):
        loss, g = jax.value_and_grad(
            lambda w: jnp.mean((w["w"] - target) ** 2))(w)
        updates, state = tx.update(g, state)
        return optax.apply_updates(w, updates), state, loss

    params = {"w": w}
    losses = []
    for _ in range(100):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.15, (losses[0], losses[-1])


def test_small_params_use_plain_adam():
    tx = galore(learning_rate=1e-2, rank=32, min_dim=256)
    params = {"small": jnp.ones((8, 8)), "vec": jnp.ones((16,))}
    state = tx.init(params)
    g = {"small": jnp.ones((8, 8)), "vec": jnp.ones((16,))}
    updates, state = tx.update(g, state)
    # plain adam step of constant grad ~= -lr
    np.testing.assert_allclose(np.asarray(updates["vec"]), -1e-2, rtol=0.2)


def test_full_finetune_tiny_model_with_galore(rng):
    """End-to-end: full-FT a tiny model with GaLore, loss decreases."""
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.decoder import loss_fn
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=2, num_kv_heads=2)
    params = init_params(cfg, rng)
    ids = jax.random.randint(rng, (2, 32), 0, 128)
    batch = {"input_ids": ids, "labels": ids}
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     galore(learning_rate=1e-2, rank=16,
                            update_proj_gap=5, min_dim=64))
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(
            lambda p: loss_fn(p, None, batch, cfg, lm_head_trainable=True,
                              remat=False))(params)
        updates, state = tx.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, (losses[0], losses[-1])


@pytest.mark.slow
def test_q_galore_int8_state_and_convergence(rng):
    """Q-GaLore (int8 moments + int8 projector — the 'Q' from
    q_galore_adamw.py:264-290): state leaves are int8, quantized round
    trip is tight, and it optimizes a matrix factorization problem."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from unsloth_tpu.optimizers.galore import _dq8, _q8, q_galore

    x = jax.random.normal(rng, (300, 280), jnp.float32)
    codes, scales, shape = _q8(x)
    assert codes.dtype == jnp.int8
    back = _dq8(codes, scales, shape)
    assert float(jnp.abs(back - x).max()) < float(jnp.abs(x).max()) / 100

    # optimize || W - T ||^2 for a 2-D param big enough to project
    key1, key2 = jax.random.split(rng)
    target = jax.random.normal(key1, (320, 300), jnp.float32)
    params = {"w": jnp.zeros((320, 300), jnp.float32),
              "b": jnp.zeros((16,), jnp.float32)}
    tx = q_galore(learning_rate=0.1, rank=16, update_proj_gap=10,
                  galore_scale=1.0, min_dim=128)
    state = tx.init(params)
    # int8 state verified on the 2-D entry
    s = state.inner["w"]
    assert s.m_q.dtype == jnp.int8 and s.proj_q.dtype == jnp.int8

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean(p["b"] ** 2)

    @jax.jit
    def step(p, st):
        l, g = jax.value_and_grad(loss)(p)
        upd, st = tx.update(g, st, p)
        return optax.apply_updates(p, upd), st, l

    l0 = float(loss(params))
    for _ in range(60):
        params, state, l = step(params, state)
    assert float(l) < l0 * 0.55, (l0, float(l))


def test_q_galore_memory_smaller_than_adam(rng):
    import jax.numpy as jnp

    from unsloth_tpu.optimizers.galore import q_galore

    params = {"w": jnp.zeros((512, 512), jnp.float32)}
    tx = q_galore(rank=16)
    st = tx.init(params)

    def nbytes(t):
        import jax

        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t)
                   if hasattr(x, "size"))

    adam_bytes = 2 * 512 * 512 * 4
    assert nbytes(st.inner) < adam_bytes / 8
