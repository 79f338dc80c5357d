"""On-device resize/normalize for model-facing batches (the replacement
for a CPU PIL/libjpeg dataloader resize stage; BASELINE.json config 5)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size", "method"))
def resize_rgba(img, size, method="bilinear"):
    """(H, W, 4) uint8 -> (h, w, 4) uint8 on device."""
    out = jax.image.resize(img.astype(jnp.float32), (*size, img.shape[-1]),
                           method=method)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def resize_batch_rgba(imgs, size, method="bilinear"):
    """List of (H_i, W_i, 4) arrays -> (N, h, w, 4) device batch."""
    out = [resize_rgba(jnp.asarray(im), tuple(size), method) for im in imgs]
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=("size",))
def normalize_for_model(batch, size=None, mean=(0.5, 0.5, 0.5),
                        std=(0.5, 0.5, 0.5)):
    """uint8 RGBA batch -> float32 RGB normalized (N, H, W, 3)."""
    x = batch[..., :3].astype(jnp.float32) / 255.0
    if size is not None:
        x = jax.image.resize(x, (x.shape[0], *size, 3), method="bilinear")
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std
