"""Pallas fused dequant+IDCT kernel (VERDICT r1 #9): bit-exact vs the
XLA path; runs in interpreter mode on CPU (real-TPU A/B measured
1.31x over the XLA path at 253 GP/s — see PARITY.md)."""

import numpy as np
import pytest


def test_pallas_dequant_idct_matches_xla(rng):
    import jax.numpy as jnp
    from ffpic_tpu.ops.jpeg_kernels import dequant_idct_blocks
    from ffpic_tpu.ops.pallas_jpeg import (blocks_to_nlast,
                                           dequant_idct_pallas,
                                           nlast_to_blocks)
    N = 600
    blocks = rng.integers(-512, 512, (N, 8, 8)).astype(np.int16)
    q = rng.integers(1, 64, (8, 8)).astype(np.int32)
    ref = np.asarray(dequant_idct_blocks(jnp.asarray(blocks),
                                         jnp.asarray(q)))
    out = nlast_to_blocks(
        dequant_idct_pallas(blocks_to_nlast(blocks), jnp.asarray(q),
                            interpret=True), N)
    np.testing.assert_array_equal(out, ref)
