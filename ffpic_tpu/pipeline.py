"""Batched decode pipeline (placeholder wiring; fleshed out with the
JPEG device pipeline). ``decode_batch`` is the model-facing entry:
decode a list of images to one on-device uint8 tensor."""

from __future__ import annotations

from typing import Sequence

import numpy as np


def decode_batch(srcs: Sequence, size: tuple[int, int] | None = None,
                 dtype="uint8"):
    """Decode a batch of images to a single (N, H, W, 4) device array.

    Images are decoded via the codec registry; if ``size`` is given, all
    are resized on device to (H, W). Implemented fully once the JPEG
    device pipeline lands; see ffpic_tpu/ops/jpeg_kernels.py.
    """
    from ffpic_tpu.formats import load
    from ffpic_tpu.ops.resize import resize_batch_rgba
    import jax.numpy as jnp

    pics = [load(s) for s in srcs]
    if size is None:
        hs = {p.np_pixels().shape[:2] for p in pics}
        if len(hs) != 1:
            raise ValueError("mixed sizes: pass size=(H, W) to resize on device")
        return jnp.stack([jnp.asarray(p.to_rgba32()) for p in pics])
    return resize_batch_rgba([p.pixels if p.format == "RGBA32" else p.to_rgba32()
                              for p in pics], size)
