"""A compact functional ViT — the downstream consumer for the batched
decode pipeline (BASELINE.json config 5: decoded tensors batch directly
into JAX models, replacing libjpeg/PIL dataloaders).

Pure-jax (no flax dependency) with explicit (data, model) mesh
shardings: batch over ``data``; attention heads and MLP hidden dim
tensor-parallel over ``model`` (Megatron-style column/row split — XLA
inserts the psum for the row-parallel projections).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class ViTConfig(NamedTuple):
    image_size: int = 224
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    n_classes: int = 1000

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch) ** 2


VIT_B16 = ViTConfig()
VIT_TINY = ViTConfig(image_size=64, patch=16, dim=128, depth=2, heads=4,
                     mlp_dim=256, n_classes=10)


def init_params(cfg: ViTConfig, key) -> dict:
    ks = jax.random.split(key, 6 + 4 * cfg.depth)
    scale = cfg.dim ** -0.5
    p = {
        "patch_w": jax.random.normal(ks[0], (cfg.patch * cfg.patch * 3,
                                             cfg.dim)) * scale,
        "patch_b": jnp.zeros((cfg.dim,)),
        "pos": jax.random.normal(ks[1], (cfg.n_patches + 1, cfg.dim)) * 0.02,
        "cls": jnp.zeros((cfg.dim,)),
        "head_w": jax.random.normal(ks[2], (cfg.dim, cfg.n_classes)) * scale,
        "head_b": jnp.zeros((cfg.n_classes,)),
        "ln_f": (jnp.ones((cfg.dim,)), jnp.zeros((cfg.dim,))),
        "blocks": [],
    }
    for i in range(cfg.depth):
        k1, k2, k3, k4 = jax.random.split(ks[6 + i], 4)
        p["blocks"].append({
            "ln1": (jnp.ones((cfg.dim,)), jnp.zeros((cfg.dim,))),
            "qkv_w": jax.random.normal(k1, (cfg.dim, 3 * cfg.dim)) * scale,
            "qkv_b": jnp.zeros((3 * cfg.dim,)),
            "proj_w": jax.random.normal(k2, (cfg.dim, cfg.dim)) * scale,
            "proj_b": jnp.zeros((cfg.dim,)),
            "ln2": (jnp.ones((cfg.dim,)), jnp.zeros((cfg.dim,))),
            "fc1_w": jax.random.normal(k3, (cfg.dim, cfg.mlp_dim)) * scale,
            "fc1_b": jnp.zeros((cfg.mlp_dim,)),
            "fc2_w": jax.random.normal(k4, (cfg.mlp_dim, cfg.dim)) * scale,
            "fc2_b": jnp.zeros((cfg.dim,)),
        })
    return p


def param_shardings(cfg: ViTConfig, mesh: Mesh) -> dict:
    """Megatron TP: qkv/fc1 column-split, proj/fc2 row-split over
    ``model``; everything else replicated."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))
    blk = {
        "ln1": (ns(), ns()),
        "qkv_w": ns(None, "model"), "qkv_b": ns("model"),
        "proj_w": ns("model", None), "proj_b": ns(),
        "ln2": (ns(), ns()),
        "fc1_w": ns(None, "model"), "fc1_b": ns("model"),
        "fc2_w": ns("model", None), "fc2_b": ns(),
    }
    return {
        "patch_w": ns(), "patch_b": ns(), "pos": ns(), "cls": ns(),
        "head_w": ns(), "head_b": ns(), "ln_f": (ns(), ns()),
        "blocks": [dict(blk) for _ in range(cfg.depth)],
    }


def _ln(x, g_b):
    g, b = g_b
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + b


def forward(cfg: ViTConfig, params: dict, images: jnp.ndarray) -> jnp.ndarray:
    """images: (N, H, W, 3) float32 (normalized). Returns logits."""
    N = images.shape[0]
    ps = cfg.patch
    x = images.reshape(N, cfg.image_size // ps, ps,
                       cfg.image_size // ps, ps, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(N, cfg.n_patches, -1)
    x = x.astype(jnp.bfloat16) @ params["patch_w"].astype(jnp.bfloat16)
    x = x + params["patch_b"]
    cls = jnp.broadcast_to(params["cls"], (N, 1, cfg.dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos"].astype(x.dtype)

    hd = cfg.dim // cfg.heads
    for blk in params["blocks"]:
        h = _ln(x.astype(jnp.float32), blk["ln1"]).astype(jnp.bfloat16)
        qkv = h @ blk["qkv_w"].astype(jnp.bfloat16) + blk["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        T = q.shape[1]

        def heads_split(t):
            return t.reshape(N, T, cfg.heads, hd).transpose(0, 2, 1, 3)
        q, k, v = map(heads_split, (q, k, v))
        att = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                         preferred_element_type=jnp.float32) * (hd ** -0.5)
        att = jax.nn.softmax(att, axis=-1).astype(jnp.bfloat16)
        out = jnp.einsum("nhqk,nhkd->nhqd", att, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(N, T, cfg.dim)
        out = out.astype(jnp.bfloat16) @ blk["proj_w"].astype(jnp.bfloat16)
        x = x + out + blk["proj_b"]

        h = _ln(x.astype(jnp.float32), blk["ln2"]).astype(jnp.bfloat16)
        h = jax.nn.gelu(h @ blk["fc1_w"].astype(jnp.bfloat16) + blk["fc1_b"])
        h = h @ blk["fc2_w"].astype(jnp.bfloat16) + blk["fc2_b"]
        x = x + h

    x = _ln(x[:, 0].astype(jnp.float32), params["ln_f"])
    return x @ params["head_w"] + params["head_b"]


def loss_fn(cfg: ViTConfig, params, images, labels):
    logits = forward(cfg, params, images)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def make_train_step(cfg: ViTConfig, lr: float = 1e-3):
    """SGD train step (optimizer state kept minimal for the decode-
    pipeline integration test; swap in optax for real training)."""

    def step(params, images, labels):
        loss, grads = jax.value_and_grad(
            functools.partial(loss_fn, cfg))(params, images, labels)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    return step
