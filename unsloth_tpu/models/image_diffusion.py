"""Image diffusion — a TPU-native DiT (diffusion transformer).

Parity target: the reference serves image generation through a
stable-diffusion.cpp sidecar (reference: studio/backend/core/inference/
sd_cpp_server.py, sd_cpp_engine.py) and trains diffusion LoRA/DiT in the
studio (studio/backend/core/training/diffusion_*_trainer.py). A C++
sidecar makes no sense on TPU — here the denoiser is a jitted JAX
program: patchify -> transformer blocks with adaLN-zero timestep
conditioning (DiT) -> unpatchify, trained with the standard DDPM
epsilon-prediction objective and sampled with DDIM inside one
`lax.fori_loop`.

This is the image-generation subsystem in native form: small by design
(the reference ships binaries, not modeling code), but complete —
noising schedule, training loss, sampler, and a trainer — and it runs
under jit on the MXU.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    image_size: int = 32
    patch_size: int = 4
    in_channels: int = 3
    hidden_size: int = 256
    num_layers: int = 6
    num_heads: int = 4
    num_classes: int = 0          # 0 = unconditional
    timesteps: int = 1000

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size ** 2


def cosine_betas(t_max: int) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule."""
    s = 0.008
    steps = np.arange(t_max + 1, dtype=np.float64)
    f = np.cos((steps / t_max + s) / (1 + s) * math.pi / 2) ** 2
    betas = 1.0 - f[1:] / f[:-1]
    return np.clip(betas, 0, 0.999).astype(np.float32)


def init_dit(cfg: DiTConfig, key) -> Dict[str, Any]:
    d = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 16))

    def rand(shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[0]))
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    params = {
        "patch_embed": {"kernel": rand((cfg.patch_dim, d)),
                        "bias": jnp.zeros((d,))},
        "pos_embed": rand((cfg.n_patches, d), 0.02),
        "t_mlp1": {"kernel": rand((256, d)), "bias": jnp.zeros((d,))},
        "t_mlp2": {"kernel": rand((d, d)), "bias": jnp.zeros((d,))},
        "final_mod": {"kernel": jnp.zeros((d, 2 * d)),
                      "bias": jnp.zeros((2 * d,))},
        "head": {"kernel": jnp.zeros((d, cfg.patch_dim)),
                 "bias": jnp.zeros((cfg.patch_dim,))},
        "layers": [],
    }
    if cfg.num_classes:
        params["label_embed"] = rand((cfg.num_classes + 1, d), 0.02)
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "qkv": {"kernel": rand((d, 3 * d)), "bias": jnp.zeros((3 * d,))},
            "proj": {"kernel": rand((d, d)), "bias": jnp.zeros((d,))},
            "fc1": {"kernel": rand((d, 4 * d)), "bias": jnp.zeros((4 * d,))},
            "fc2": {"kernel": rand((4 * d, d)), "bias": jnp.zeros((d,))},
            # adaLN-zero: 6 modulation vectors, zero-init so each block
            # starts as identity (DiT's key trick)
            "mod": {"kernel": jnp.zeros((d, 6 * d)),
                    "bias": jnp.zeros((6 * d,))},
        })
    return params


def _lin(p, x):
    return jnp.dot(x, p["kernel"]) + p["bias"]


def _ln(x, eps=1e-6):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps)


def timestep_embedding(t, dim=256):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def patchify(x, cfg: DiTConfig):
    """[B, H, W, C] -> [B, N, patch_dim]."""
    b, h, w, c = x.shape
    p = cfg.patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, cfg.n_patches, cfg.patch_dim)


def unpatchify(x, cfg: DiTConfig):
    b = x.shape[0]
    p = cfg.patch_size
    g = cfg.image_size // p
    x = x.reshape(b, g, g, p, p, cfg.in_channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, cfg.image_size, cfg.image_size, cfg.in_channels)


def dit_forward(params, x_img, t, cfg: DiTConfig, labels=None):
    """epsilon prediction: x_img [B, H, W, C], t [B] int -> eps_hat."""
    x = _lin(params["patch_embed"], patchify(x_img, cfg))
    x = x + params["pos_embed"][None]
    c = _lin(params["t_mlp1"], timestep_embedding(t))
    c = _lin(params["t_mlp2"], jax.nn.silu(c))
    if labels is not None and "label_embed" in params:
        c = c + jnp.take(params["label_embed"], labels, axis=0)
    c = jax.nn.silu(c)

    b, n, d = x.shape
    heads = cfg.num_heads
    dh = d // heads
    for layer in params["layers"]:
        mod = _lin(layer["mod"], c)[:, None, :]           # [B, 1, 6D]
        (sh1, sc1, g1, sh2, sc2, g2) = jnp.split(mod, 6, axis=-1)
        h = _ln(x) * (1 + sc1) + sh1
        qkv = _lin(layer["qkv"], h).reshape(b, n, 3, heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(dh)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, n, d)
        x = x + g1 * _lin(layer["proj"], o)
        h = _ln(x) * (1 + sc2) + sh2
        x = x + g2 * _lin(layer["fc2"], jax.nn.gelu(_lin(layer["fc1"], h)))

    mod = _lin(params["final_mod"], c)[:, None, :]
    sh, sc = jnp.split(mod, 2, axis=-1)
    x = _ln(x) * (1 + sc) + sh
    return unpatchify(_lin(params["head"], x), cfg)


def diffusion_loss(params, images, key, cfg: DiTConfig, alphas_bar,
                   labels=None):
    """DDPM epsilon-prediction MSE."""
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    t = jax.random.randint(k1, (b,), 0, cfg.timesteps)
    eps = jax.random.normal(k2, images.shape, images.dtype)
    ab = jnp.take(jnp.asarray(alphas_bar), t)[:, None, None, None]
    x_t = jnp.sqrt(ab) * images + jnp.sqrt(1 - ab) * eps
    eps_hat = dit_forward(params, x_t, t, cfg, labels=labels)
    return jnp.mean((eps_hat - eps) ** 2)


def ddim_sample(params, cfg: DiTConfig, key, num_images: int = 1,
                steps: int = 50, labels=None, eta: float = 0.0):
    """DDIM sampler as one jitted fori_loop over the step schedule."""
    betas = cosine_betas(cfg.timesteps)
    alphas_bar = jnp.asarray(np.cumprod(1.0 - betas))
    ts = jnp.asarray(
        np.linspace(cfg.timesteps - 1, 0, steps).round().astype(np.int32))

    shape = (num_images, cfg.image_size, cfg.image_size, cfg.in_channels)
    x = jax.random.normal(key, shape, jnp.float32)

    def body(i, x):
        t = ts[i]
        t_prev = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)],
                           -1)
        ab_t = alphas_bar[t]
        ab_prev = jnp.where(t_prev >= 0,
                            alphas_bar[jnp.maximum(t_prev, 0)], 1.0)
        tb = jnp.full((num_images,), t, jnp.int32)
        eps = dit_forward(params, x, tb, cfg, labels=labels)
        x0 = (x - jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(ab_t)
        x0 = jnp.clip(x0, -1.5, 1.5)
        return jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1 - ab_prev) * eps

    return jax.lax.fori_loop(0, steps, body, x)


@dataclasses.dataclass
class ImageDiffusionConfig:
    learning_rate: float = 1e-3
    max_steps: int = 100
    per_device_train_batch_size: int = 16
    logging_steps: int = 10
    seed: int = 0


class ImageDiffusionTrainer:
    """DDPM training loop over [B, H, W, C] images in [-1, 1]
    (reference: the studio's diffusion DiT trainer,
    studio/backend/core/training/diffusion_*_trainer.py)."""

    def __init__(self, params, cfg: DiTConfig, train_images,
                 labels=None, args: Optional[ImageDiffusionConfig] = None):
        self.params = params
        self.cfg = cfg
        self.images = np.asarray(train_images, np.float32)
        self.labels = (np.asarray(labels, np.int32)
                       if labels is not None else None)
        self.args = args or ImageDiffusionConfig()
        self.state_log: List[Dict[str, Any]] = []
        betas = cosine_betas(cfg.timesteps)
        self.alphas_bar = np.cumprod(1.0 - betas)

    def train(self):
        import optax

        args = self.args
        cfg = self.cfg
        tx = optax.adamw(args.learning_rate)
        opt = tx.init(self.params)
        ab = jnp.asarray(self.alphas_bar)

        @jax.jit
        def step(params, opt, images, key, labels):
            loss, g = jax.value_and_grad(
                lambda p: diffusion_loss(p, images, key, cfg, ab,
                                         labels=labels))(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, loss

        key = jax.random.PRNGKey(args.seed)
        n = len(self.images)
        bsz = min(args.per_device_train_batch_size, n)
        images_dev = jnp.asarray(self.images)
        labels_dev = (jnp.asarray(self.labels)
                      if self.labels is not None else None)
        for s in range(args.max_steps):
            key, k1, k2 = jax.random.split(key, 3)
            idx = jax.random.randint(k1, (bsz,), 0, n)
            batch = images_dev[idx]
            lab = labels_dev[idx] if labels_dev is not None else None
            self.params, opt, loss = step(self.params, opt, batch, k2, lab)
            if (s + 1) % args.logging_steps == 0 or s == 0:
                self.state_log.append({"loss": float(loss), "step": s + 1})
        return self.state_log

    def sample(self, num_images=1, steps=50, labels=None, seed=1):
        return ddim_sample(self.params, self.cfg, jax.random.PRNGKey(seed),
                           num_images=num_images, steps=steps,
                           labels=labels)


# ---------------------------------------------------------------------------
# Checkpoint IO (safetensors + config.json; serves /v1/images/generations)
# ---------------------------------------------------------------------------

def save_dit(params, cfg: DiTConfig, path: str) -> None:
    """Write the DiT as flat safetensors + config.json (the studio's
    image-generation route loads this; reference serves images through
    stable-diffusion.cpp sidecars — studio/backend/core/inference/
    sd_cpp_server.py — here the same JAX model that trains also
    serves)."""
    import json
    import os

    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(f"{prefix}.{i}", v)
        else:
            # device_get returns Fortran-order views on the TPU tunnel;
            # safetensors serializes raw bytes, so force C order
            flat[prefix] = np.ascontiguousarray(
                np.asarray(jax.device_get(node), np.float32))

    walk("", params)
    save_file(flat, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"model_type": "unsloth_tpu_dit",
                   **dataclasses.asdict(cfg)}, f)


def load_dit(path: str):
    """Inverse of save_dit -> (params, DiTConfig)."""
    import json
    import os

    from safetensors.numpy import load_file

    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    raw.pop("model_type", None)
    cfg = DiTConfig(**raw)
    flat = load_file(os.path.join(path, "model.safetensors"))

    params: Dict[str, Any] = {}
    for name, arr in flat.items():
        parts = name.split(".")
        node = params
        for i, p in enumerate(parts[:-1]):
            key = int(p) if p.isdigit() else p
            if isinstance(key, int):
                while len(node) <= key:
                    node.append({})
                nxt_is_int = parts[i + 1].isdigit()
                if not isinstance(node[key], (dict, list)) or not node[key]:
                    node[key] = [] if nxt_is_int else {}
                node = node[key]
            else:
                nxt_is_int = parts[i + 1].isdigit()
                if key not in node:
                    node[key] = [] if nxt_is_int else {}
                node = node[key]
        leaf = parts[-1]
        key = int(leaf) if leaf.isdigit() else leaf
        if isinstance(key, int):
            while len(node) <= key:
                node.append(None)
            node[key] = jnp.asarray(arr)
        else:
            node[leaf] = jnp.asarray(arr)
    return params, cfg
