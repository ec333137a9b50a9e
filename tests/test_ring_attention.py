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
