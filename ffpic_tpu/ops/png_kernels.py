"""Device-side PNG pixel-format conversion kernels.

After host inflate + unfilter (byte-serial, ffpic_tpu/native/host_png.c),
everything dense runs on device in one jitted program per geometry:
sub-byte sample expansion (the reference strips padding on the host
per-scanline, png.c:171-198 — here it is a vectorized shift/mask over
the whole image), palette gather (the reference leaves palette images
indexed, png.c:625-637 — we expand), 16-bit narrowing, grayscale
scaling, tRNS alpha, and RGBA assembly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("bitdepth", "width"))
def unpack_samples(rows, bitdepth: int, width: int):
    """(H, stride) uint8 packed rows -> (H, width) int32 samples
    (per-row bit padding dropped, MSB-first packing per PNG spec)."""
    if bitdepth == 8:
        return rows[:, :width].astype(jnp.int32)
    if bitdepth == 16:
        hi = rows[:, 0:2 * width:2].astype(jnp.int32)
        lo = rows[:, 1:2 * width:2].astype(jnp.int32)
        return (hi << 8) | lo
    per = 8 // bitdepth
    mask = (1 << bitdepth) - 1
    shifts = jnp.arange(per - 1, -1, -1, dtype=jnp.int32) * bitdepth
    vals = (rows[:, :, None].astype(jnp.int32) >> shifts) & mask
    return vals.reshape(rows.shape[0], -1)[:, :width]


@functools.partial(
    jax.jit,
    static_argnames=("color_type", "bitdepth", "width", "height"))
def assemble_rgba(recon, palette, trns, color_type: int, bitdepth: int,
                  width: int, height: int):
    """(H, stride) uint8 reconstructed scanline bytes -> (H, W, 4) uint8
    RGBA. palette: (256, 4) uint8 (junk if unused); trns: (256,) int32
    per-index alpha or packed colorkey (-1 if absent)."""
    H, W = height, width

    def scale_to_8(v):
        if bitdepth == 16:
            return (v >> 8).astype(jnp.uint8)
        if bitdepth == 8:
            return v.astype(jnp.uint8)
        maxv = (1 << bitdepth) - 1
        return ((v * 255) // maxv).astype(jnp.uint8)

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if color_type == 3:
        idx = unpack_samples(recon, bitdepth, W)
        rgba = palette[idx.clip(0, 255)]
        alpha = trns[idx.clip(0, 255)].astype(jnp.int32)
        a = jnp.where(alpha >= 0, alpha, 255).astype(jnp.uint8)
        return rgba.at[..., 3].set(a)

    # channel-interleaved: unpack all samples then de-interleave
    samples = unpack_samples(recon, bitdepth, W * nch).reshape(H, W, nch)
    if color_type == 0:
        g16 = samples[..., 0]
        g = scale_to_8(g16)
        a = jnp.where((trns[0] >= 0) & (g16 == trns[0]), 0, 255) \
            .astype(jnp.uint8)
        return jnp.stack([g, g, g, a], axis=-1)
    if color_type == 4:
        g = scale_to_8(samples[..., 0])
        a = scale_to_8(samples[..., 1])
        return jnp.stack([g, g, g, a], axis=-1)
    if color_type == 2:
        r16, g16, b16 = samples[..., 0], samples[..., 1], samples[..., 2]
        key = (trns[0] >= 0) & (r16 == trns[0]) & (g16 == trns[1]) & \
            (b16 == trns[2])
        a = jnp.where(key, 0, 255).astype(jnp.uint8)
        return jnp.stack([scale_to_8(r16), scale_to_8(g16),
                          scale_to_8(b16), a], axis=-1)
    if color_type == 6:
        return jnp.stack([scale_to_8(samples[..., c]) for c in range(3)] +
                         [scale_to_8(samples[..., 3])], axis=-1)
    raise ValueError(f"bad color type {color_type}")


@functools.partial(jax.jit, static_argnames=("bpp",))
def unfilter_device_subup(raw_rows, filters, bpp: int):
    """Pure-device scanline reconstruction for the associative filter
    subset {None, Sub, Up} (BASELINE.json config 2's "filter
    reconstruction as scan kernels").

    Sub rows are a cumulative sum along x over bpp-strided lanes; Up
    rows are a segmented cumulative sum along y whose segments reset at
    every None/Sub row. Average/Paeth are nonlinear byte-serial
    recurrences and run on the host (native/host_png.c) — the codec
    dispatches here only when no Avg/Paeth rows are present.

    raw_rows: (H, stride) uint8 filtered bytes (no filter tags);
    filters: (H,) int32 in {0, 1, 2}. Returns (H, stride) uint8.
    """
    H, stride = raw_rows.shape
    x = raw_rows.astype(jnp.int32)

    # --- Sub pass (within-row, mod 256): cumsum over bpp lanes -------
    pad = (-stride) % bpp
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    lanes = xp.reshape(H, -1, bpp)                 # (H, n, bpp)
    sub = (jnp.cumsum(lanes, axis=1) & 255).reshape(H, -1)[:, :stride]
    subbed = jnp.where((filters == 1)[:, None], sub, x)

    # --- Up pass (along columns, mod 256, segmented) -----------------
    # recon[y] = sum_{k=lr(y)}^{y} subbed[k]  where lr(y) is the last
    # row at-or-before y with filter != Up (that row resets the chain).
    resets = filters != 2
    idx = jnp.arange(H, dtype=jnp.int32)
    lr = jax.lax.cummax(jnp.where(resets, idx, -1))        # (H,)
    lr = jnp.maximum(lr, 0)
    total = jnp.cumsum(subbed, axis=0)                     # inclusive
    out = (total - total[lr] + subbed[lr]) & 255
    return out.astype(jnp.uint8)
