"""Gated DeltaNet op tests: parity with HF's torch_chunk_gated_delta_rule
(the qwen3-next linear-attention oracle), chunk invariance, grads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.ops.delta_net import chunk_gated_delta_rule

torch = pytest.importorskip("torch")


def _inputs(rng, b=2, t=20, h=3, dk=8, dv=12):
    ks = jax.random.split(rng, 5)
    q = jax.random.normal(ks[0], (b, t, h, dk), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, h, dk), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, h, dv), jnp.float32) * 0.5
    g = -jax.nn.softplus(jax.random.normal(ks[3], (b, t, h)))
    beta = jax.nn.sigmoid(jax.random.normal(ks[4], (b, t, h)))
    return q, k, v, g, beta


@pytest.mark.slow
def test_matches_hf_oracle(rng):
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_chunk_gated_delta_rule)

    q, k, v, g, beta = _inputs(rng)
    want, want_state = torch_chunk_gated_delta_rule(
        *(torch.tensor(np.asarray(x)) for x in (q, k, v, g, beta)),
        chunk_size=8, output_final_state=True,
        use_qk_l2norm_in_kernel=True)
    got, got_state = chunk_gated_delta_rule(q, k, v, g, beta,
                                            chunk_size=8)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_state), want_state.numpy(),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("chunk", [4, 16, 64])
def test_chunk_invariance(rng, chunk):
    q, k, v, g, beta = _inputs(rng, t=24)
    ref, _ = chunk_gated_delta_rule(q, k, v, g, beta, chunk_size=24)
    got, _ = chunk_gated_delta_rule(q, k, v, g, beta, chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_grads_flow(rng):
    q, k, v, g, beta = _inputs(rng, t=16)

    def loss(q, k, v, g, beta):
        out, _ = chunk_gated_delta_rule(q, k, v, g, beta, chunk_size=8)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q, k, v, g, beta)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gr).max()) > 0


@pytest.mark.slow
def test_lightning_attention_chunked_matches_sequential():
    """The chunked lightning attention equals the sequential decayed
    recurrence (HF's decode path) — including with a partial last block."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsloth_tpu.ops.lightning_attention import (
        lightning_attention, lightning_attention_ref, lightning_slopes)

    b, t, h, d = 2, 21, 3, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.nn.silu(jax.random.normal(k1, (b, t, h, d)))
    k = jax.nn.silu(jax.random.normal(k2, (b, t, h, d)))
    v = jax.random.normal(k3, (b, t, h, d))
    s = lightning_slopes(h, layer_idx=1, num_layers=4)
    got, state = lightning_attention(q, k, v, s, block_size=8,
                                     return_state=True)
    want = lightning_attention_ref(q, k, v, s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # the returned state is exact (partial last block): one more decode
    # step from it matches the sequential recurrence over t+1 tokens
    k4 = jax.random.PRNGKey(9)
    qn = jax.nn.silu(jax.random.normal(k4, (b, 1, h, d)))
    kn, vn = qn * 0.7, qn * 1.3
    got2, _ = lightning_attention(qn, kn, vn, s, block_size=8,
                                  initial_state=state, return_state=True)
    want2 = lightning_attention_ref(
        jnp.concatenate([q, qn], 1), jnp.concatenate([k, kn], 1),
        jnp.concatenate([v, vn], 1), s)[:, -1:]
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=1e-5, rtol=1e-5)
