"""Gated-MLP activations: SwiGLU / GEGLU (exact + tanh approx).

Parity with the reference Triton kernels (unsloth/kernels/swiglu.py and
geglu.py): elementwise h = act(e) * g with a fused backward that recomputes
the activation instead of storing intermediates.

TPU design: these are pure VPU elementwise ops that XLA fuses directly into
the surrounding matmuls; a Pallas kernel adds launch overhead without saving
bandwidth. What the Triton fused-backward buys on GPU (not materializing
f = act(e) for the backward) we get with `jax.custom_vjp` recomputation —
the residuals are (e, g) only, exactly like the reference
(swiglu.py:68-125 recomputes se/f in the backward kernel).

gpt-oss uses a clamped glu: act(e) = e * sigmoid(1.702 * e) with e clamped
to [-7, 7]-ish limits; implemented as `gpt_oss_glu`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SQRT_2_OVER_PI = 0.7978845608028654


def _silu(e):
    return e * jax.nn.sigmoid(e)


def _gelu_exact(e):
    return jax.nn.gelu(e, approximate=False)


def _gelu_tanh(e):
    return jax.nn.gelu(e, approximate=True)


def _gpt_oss_act(e, g, alpha: float = 1.702, limit: float = 7.0):
    # gpt-oss GLU: clamp then gated swish, with (g + 1) linear term.
    e = jnp.clip(e, max=limit)
    g = jnp.clip(g, min=-limit, max=limit)
    return (e * jax.nn.sigmoid(alpha * e)) * (g + 1.0)


def _make_glu(act_fn):
    @jax.custom_vjp
    def glu(e, g):
        return act_fn(e.astype(jnp.float32)).astype(e.dtype) * g

    def fwd(e, g):
        return glu(e, g), (e, g)

    def bwd(res, dh):
        e, g = res
        ef = e.astype(jnp.float32)
        f, dfde = jax.vjp(act_fn, ef)
        dhf = dh.astype(jnp.float32)
        gf = g.astype(jnp.float32)
        de = dfde(dhf * gf)[0].astype(e.dtype)
        dg = (dhf * f).astype(g.dtype)
        return de, dg

    glu.defvjp(fwd, bwd)
    return glu


swiglu = _make_glu(_silu)
geglu_exact = _make_glu(_gelu_exact)
geglu_approx = _make_glu(_gelu_tanh)


def gpt_oss_glu(e, g):
    ef = e.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    return _gpt_oss_act(ef, gf).astype(e.dtype)


ACT2GLU = {
    "silu": swiglu,
    "swish": swiglu,
    "gelu": geglu_exact,
    "gelu_new": geglu_approx,
    "gelu_tanh": geglu_approx,
    "gelu_pytorch_tanh": geglu_approx,
    "gpt_oss_glu": gpt_oss_glu,
}


def glu_for(act_name: str):
    try:
        return ACT2GLU[act_name]
    except KeyError:
        raise ValueError(f"Unsupported gated activation: {act_name!r}") from None


def act_for(act_name: str):
    """Plain (non-gated) activation — starcoder2's gelu c_fc->c_proj MLP
    and nemotron's relu^2 up->down MLP (no gate projection)."""
    import jax

    def relu2(x):
        r = jax.nn.relu(x.astype(jnp.float32))
        return (r * r).astype(x.dtype)

    table = {
        "silu": lambda x: jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype),
        "gelu": lambda x: jax.nn.gelu(
            x.astype(jnp.float32), approximate=False).astype(x.dtype),
        "gelu_tanh": lambda x: jax.nn.gelu(
            x.astype(jnp.float32), approximate=True).astype(x.dtype),
        "relu": lambda x: jax.nn.relu(x),
        "relu2": relu2,
    }
    try:
        return table[act_name]
    except KeyError:
        raise ValueError(f"Unsupported activation: {act_name!r}") from None
