"""GaLore: low-rank gradient projection optimizer (optax transform).

Parity target: reference unsloth/optimizers/ — `QGaLoreAdamW8bit`
(q_galore_adamw.py:48) + quantized projector (q_galore_projector.py):
full-parameter training whose optimizer state lives in a rank-r projected
space. The reference quantizes projection matrices and weights to int8 to
save GPU RAM; on TPU the win is the same state compression (optimizer
state is 2x params in Adam — GaLore makes it 2 * r/min(m,n)), expressed
as a pure optax transformation:

  for each 2-D param with min(shape) >= min_dim:
    every `update_proj_gap` steps: P = top-r singular vectors of G
    R = project(G)          (rank-r)
    R' = Adam(R)            (moments live in rank-r space)
    update = scale * unproject(R')

Non-matrix params fall through to plain Adam.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class _GaloreParamState(NamedTuple):
    proj: Any            # [m, r] or [r, n] projection (or None sentinel)
    m: Any               # first moment (projected space)
    v: Any               # second moment (projected space)


class GaloreState(NamedTuple):
    count: jnp.ndarray
    inner: Any           # tree of _GaloreParamState


def _is_matrix(p, min_dim):
    return hasattr(p, "ndim") and p.ndim == 2 and min(p.shape) >= min_dim


def _make_proj(g, rank):
    """Top-rank singular subspace of g; projects the SHORTER side."""
    m, n = g.shape
    u, s, vt = jnp.linalg.svd(g.astype(jnp.float32), full_matrices=False)
    if m <= n:
        return u[:, :rank]          # [m, r]; R = P^T @ G  -> [r, n]
    return vt[:rank, :]             # [r, n]; R = G @ P^T  -> [m, r]


def _project(g, proj):
    m, n = g.shape
    if proj.shape[0] == m:          # left projection [m, r]
        return proj.T @ g
    return g @ proj.T               # right projection [r, n]


def _unproject(r, proj, shape):
    m, n = shape
    if proj.shape[0] == m:
        return proj @ r
    return r @ proj


def galore(
    learning_rate: float | optax.Schedule = 1e-4,
    rank: int = 128,
    update_proj_gap: int = 200,
    galore_scale: float = 0.25,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_dim: int = 256,
) -> optax.GradientTransformation:
    """GaLore AdamW-style transform. Chain with weight decay/clipping as
    desired: optax.chain(optax.clip_by_global_norm(1.0), galore(...))."""

    def init(params):
        def init_one(p):
            if _is_matrix(p, min_dim):
                m, n = p.shape
                r = min(rank, min(m, n))
                proj = (jnp.zeros((m, r), jnp.float32) if m <= n
                        else jnp.zeros((r, n), jnp.float32))
                rshape = (r, n) if m <= n else (m, r)
                return _GaloreParamState(
                    proj=proj,
                    m=jnp.zeros(rshape, jnp.float32),
                    v=jnp.zeros(rshape, jnp.float32))
            return _GaloreParamState(
                proj=None,
                m=jnp.zeros_like(p, dtype=jnp.float32),
                v=jnp.zeros_like(p, dtype=jnp.float32))

        return GaloreState(
            count=jnp.zeros((), jnp.int32),
            inner=jax.tree_util.tree_map(init_one, params))

    def update(grads, state, params=None):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) \
            else learning_rate
        refresh = (count - 1) % update_proj_gap == 0

        def upd_one(g, s):
            gf = g.astype(jnp.float32)
            if s.proj is not None:
                new_proj = jax.lax.cond(
                    refresh, lambda: _make_proj(gf, s.proj.shape[-1]
                                                if s.proj.shape[0] ==
                                                g.shape[0]
                                                else s.proj.shape[0]),
                    lambda: s.proj)
                # reset moments when the subspace changes
                m0 = jax.lax.cond(refresh, lambda: jnp.zeros_like(s.m),
                                  lambda: s.m)
                v0 = jax.lax.cond(refresh, lambda: jnp.zeros_like(s.v),
                                  lambda: s.v)
                r = _project(gf, new_proj)
                m = b1 * m0 + (1 - b1) * r
                v = b2 * v0 + (1 - b2) * r * r
                mh = m / (1 - b1 ** count)
                vh = v / (1 - b2 ** count)
                step_r = mh / (jnp.sqrt(vh) + eps)
                upd = -lr * galore_scale * _unproject(step_r, new_proj,
                                                      g.shape)
                return upd.astype(g.dtype), _GaloreParamState(new_proj, m, v)
            m = b1 * s.m + (1 - b1) * gf
            v = b2 * s.v + (1 - b2) * gf * gf
            mh = m / (1 - b1 ** count)
            vh = v / (1 - b2 ** count)
            upd = (-lr * mh / (jnp.sqrt(vh) + eps)).astype(g.dtype)
            return upd, _GaloreParamState(None, m, v)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state.inner)
        outs = [upd_one(g, s) for g, s in zip(flat_g, flat_s)]
        updates = treedef.unflatten([o[0] for o in outs])
        inner = treedef.unflatten([o[1] for o in outs])
        return updates, GaloreState(count=count, inner=inner)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Q-GaLore: int8-quantized optimizer state + projector
# ---------------------------------------------------------------------------

_QBLOCK = 256


def _q8(x: jnp.ndarray):
    """Blockwise symmetric int8 quantization (block 256 over the flattened
    tensor — the same shape of scheme the reference's 8-bit AdamW state
    uses, q_galore_adamw.py:264-290). Returns (codes int8, scales f32,
    orig_shape)."""
    shape = x.shape
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % _QBLOCK
    fp = jnp.pad(flat, (0, pad)).reshape(-1, _QBLOCK)
    s = jnp.max(jnp.abs(fp), axis=-1)
    s = jnp.where(s == 0, 1.0, s) / 127.0
    codes = jnp.round(fp / s[:, None]).astype(jnp.int8)
    return codes, s.astype(jnp.float32), shape


def _dq8(codes, scales, shape):
    flat = (codes.astype(jnp.float32) * scales[:, None]).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return flat[:n].reshape(shape)


def _q8_log(x: jnp.ndarray):
    """Blockwise int8 quantization of a NON-NEGATIVE tensor in the log
    domain (per-block affine). Linear int8 cannot span the second
    moment's dynamic range (the reason bitsandbytes' 8-bit optimizers use
    a dynamic map); log-domain coding gives ~constant RELATIVE error.
    Returns (codes int8, scale f32, offset f32, orig_shape)."""
    shape = x.shape
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % _QBLOCK
    fp = jnp.pad(flat, (0, pad)).reshape(-1, _QBLOCK)
    lv = jnp.log(fp + 1e-20)
    lo = jnp.min(lv, axis=-1)
    hi = jnp.max(lv, axis=-1)
    scale = jnp.maximum(hi - lo, 1e-6) / 254.0
    codes = jnp.round((lv - lo[:, None]) / scale[:, None] - 127.0)
    codes = jnp.clip(codes, -127, 127).astype(jnp.int8)
    return codes, scale.astype(jnp.float32), lo.astype(jnp.float32), shape


def _dq8_log(codes, scale, lo, shape):
    lv = (codes.astype(jnp.float32) + 127.0) * scale[:, None] \
        + lo[:, None]
    flat = jnp.exp(lv).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    v = flat[:n].reshape(shape)
    return jnp.where(v <= 2e-20, 0.0, v)


class _QGaloreParamState(NamedTuple):
    proj_q: Any          # int8 projector codes (or None)
    proj_s: Any          # projector scales
    m_q: Any             # int8 first-moment codes (linear symmetric)
    m_s: Any
    v_q: Any             # int8 second-moment codes (log-domain affine)
    v_s: Any
    v_o: Any             # log-domain per-block offsets


def q_galore(
    learning_rate: float | optax.Schedule = 1e-4,
    rank: int = 128,
    update_proj_gap: int = 200,
    galore_scale: float = 0.25,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_dim: int = 256,
) -> optax.GradientTransformation:
    """Q-GaLore: GaLore with int8 moments AND an int8 projection matrix
    (the "Q" the round-1 review flagged as missing; reference:
    optimizers/q_galore_adamw.py + q_galore_projector.py). State cost is
    ~0.25 bytes/param-dim instead of Adam's 8."""

    def shapes_for(p):
        m, n = p.shape
        r = min(rank, min(m, n))
        pshape = (m, r) if m <= n else (r, n)
        rshape = (r, n) if m <= n else (m, r)
        return pshape, rshape

    def init(params):
        def init_one(p):
            if _is_matrix(p, min_dim):
                pshape, rshape = shapes_for(p)
                pq, ps, _ = _q8(jnp.zeros(pshape, jnp.float32))
                mq, ms, _ = _q8(jnp.zeros(rshape, jnp.float32))
                vq, vs, vo, _ = _q8_log(jnp.zeros(rshape, jnp.float32))
                return _QGaloreParamState(pq, ps, mq, ms, vq, vs, vo)
            mq, ms, _ = _q8(jnp.zeros_like(p, dtype=jnp.float32))
            vq, vs, vo, _ = _q8_log(jnp.zeros_like(p, dtype=jnp.float32))
            return _QGaloreParamState(None, None, mq, ms, vq, vs, vo)

        return GaloreState(
            count=jnp.zeros((), jnp.int32),
            inner=jax.tree_util.tree_map(init_one, params))

    def update(grads, state, params=None):
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) \
            else learning_rate
        refresh = (count - 1) % update_proj_gap == 0

        def upd_one(g, s):
            gf = g.astype(jnp.float32)
            if s.proj_q is not None:
                pshape, rshape = shapes_for(g)
                proj = _dq8(s.proj_q, s.proj_s, pshape)
                new_proj = jax.lax.cond(
                    refresh,
                    lambda: _make_proj(gf, min(rank, min(g.shape))),
                    lambda: proj)
                m0 = jax.lax.cond(
                    refresh, lambda: jnp.zeros(rshape, jnp.float32),
                    lambda: _dq8(s.m_q, s.m_s, rshape))
                v0 = jax.lax.cond(
                    refresh, lambda: jnp.zeros(rshape, jnp.float32),
                    lambda: _dq8_log(s.v_q, s.v_s, s.v_o, rshape))
                r = _project(gf, new_proj)
                m = b1 * m0 + (1 - b1) * r
                v = b2 * v0 + (1 - b2) * r * r
                mh = m / (1 - b1 ** count)
                vh = v / (1 - b2 ** count)
                step_r = mh / (jnp.sqrt(vh) + eps)
                upd = -lr * galore_scale * _unproject(step_r, new_proj,
                                                      g.shape)
                pq, ps, _ = _q8(new_proj)
                mq, ms, _ = _q8(m)
                vq, vs, vo, _ = _q8_log(v)
                return upd.astype(g.dtype), _QGaloreParamState(
                    pq, ps, mq, ms, vq, vs, vo)
            m = b1 * _dq8(s.m_q, s.m_s, g.shape) + (1 - b1) * gf
            v = b2 * _dq8_log(s.v_q, s.v_s, s.v_o, g.shape) \
                + (1 - b2) * gf * gf
            mh = m / (1 - b1 ** count)
            vh = v / (1 - b2 ** count)
            upd = (-lr * mh / (jnp.sqrt(vh) + eps)).astype(g.dtype)
            mq, ms, _ = _q8(m)
            vq, vs, vo, _ = _q8_log(v)
            return upd, _QGaloreParamState(None, None, mq, ms, vq, vs, vo)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_s = treedef.flatten_up_to(state.inner)
        outs = [upd_one(g, s) for g, s in zip(flat_g, flat_s)]
        updates = treedef.unflatten([o[0] for o in outs])
        inner = treedef.unflatten([o[1] for o in outs])
        return updates, GaloreState(count=count, inner=inner)

    return optax.GradientTransformation(init, update)


def state_memory_ratio(params, rank=128, min_dim=256) -> float:
    """Optimizer-state floats per parameter (Adam = 2.0)."""
    total = 0
    state = 0
    for p in jax.tree_util.tree_leaves(params):
        if not hasattr(p, "size"):
            continue
        total += p.size
        if _is_matrix(p, min_dim):
            m, n = p.shape
            r = min(rank, min(m, n))
            state += 2 * r * max(m, n) + r * min(m, n)
        else:
            state += 2 * p.size
    return state / max(total, 1)
