"""Pallas experiment (SURVEY.md §7 / VERDICT r1 #9): fused
dequant + 8x8 integer IDCT as a hand-written TPU kernel, A/B'd against
the XLA-fused path in ops/jpeg_kernels.

Design: coefficients are laid out position-major, (8, 8, N) with the
block index N on the 128-lane axis — every arithmetic op is an
(8, 8, TILE_N) VPU op at full lane utilization, where the XLA path's
(..., 8, 8) layout leaves the trailing dim at 8 lanes.  The integer
math is the same bit-exact 13-bit mirror (utils/idct.c:512-534):
int16-wrapped dequant, column pass with >>11 round, row pass with
(x + 257<<17) >> 18 and [0, 65535] clamp.

Verdict from the A/B (scripts in tests/test_pallas_jpeg.py and the
bench): kept available behind ``dequant_idct_pallas``; decode_batch_420
stays on the XLA path unless FFPIC_PALLAS=1 — see bench numbers in
PARITY.md §perf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ffpic_tpu.ops.golden import IDCT_P13

TILE_N = 512


def _kernel(coef_ref, quant_ref, out_ref):
    """One (8, 8, TILE_N) tile: dequant -> 2-D integer IDCT."""
    c = coef_ref[:].astype(jnp.int32)              # (8, 8, T)
    q = quant_ref[:].astype(jnp.int32)             # (8, 8, 1)
    x = (c * q).astype(jnp.int16).astype(jnp.int32)

    m = IDCT_P13.astype(int)
    # column pass: col[i, :, :] = sum_u m[i,u] * x[u, :, :]
    cols = [x[u] for u in range(8)]
    col = [sum(int(m[i, u]) * cols[u] for u in range(8) if m[i, u])
           for i in range(8)]
    col = [(((cc + (1 << 10)) >> 11).astype(jnp.int16)).astype(jnp.int32)
           for cc in col]
    # row pass: out[:, i, :] = sum_u m[i,u] * col-as-rows
    colm = jnp.stack(col, axis=0)                  # (8y, 8x, T)
    rows = [colm[:, u, :] for u in range(8)]
    row = [sum(int(m[i, u]) * rows[u] for u in range(8) if m[i, u])
           for i in range(8)]
    out = jnp.stack(row, axis=1)                   # (8y, 8i, T)
    out = jnp.clip((out + (257 << 17)) >> 18, 0, 65535)
    out_ref[:] = out.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequant_idct_pallas(coeffs_nlast, quant, interpret: bool = False):
    """coeffs_nlast: (8, 8, N) int16 position-major coefficients
    (N must be a multiple of TILE_N; pad with zero blocks);
    quant: (8, 8) int32.  Returns (8, 8, N) int16 samples."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = coeffs_nlast.shape[2]
    assert n % TILE_N == 0, n
    q3 = quant.astype(jnp.int32).reshape(8, 8, 1)
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8, n), jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 8, TILE_N), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 8, TILE_N), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coeffs_nlast, q3)


def blocks_to_nlast(blocks: np.ndarray, pad_to: int = TILE_N):
    """(N, 8, 8) -> (8, 8, Npad) position-major layout."""
    n = blocks.shape[0]
    npad = -(-n // pad_to) * pad_to
    out = np.zeros((8, 8, npad), blocks.dtype)
    out[:, :, :n] = np.transpose(blocks, (1, 2, 0))
    return out


def nlast_to_blocks(nlast, n: int):
    return np.transpose(np.asarray(nlast)[:, :, :n], (2, 0, 1))
