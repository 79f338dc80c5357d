"""CABAC encoder tests: round-trip vs our decoder and differential vs
the reference C *decoder* (the reference has no encoder)."""

import os
import random
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

IVS = (153, 200, 139, 141, 157, 154, 63, 79, 111, 141, 94, 138)


def _schedule(seed, n):
    rng = random.Random(seed)
    ops = []
    for _ in range(n):
        t = rng.random()
        if t < 0.5:
            ops.append(("d", rng.randrange(len(IVS)), rng.randrange(2)))
        elif t < 0.7:
            ops.append(("b", rng.randrange(2)))
        elif t < 0.8:
            n_ = rng.randrange(1, 17)
            ops.append(("bn", rng.randrange(1 << n_), n_))
        elif t < 0.9:
            rice = rng.randrange(4)
            cmax = rng.randrange(1, 7) << rice
            ops.append(("tr", rng.randrange(cmax + 1), cmax, rice))
        else:
            k = rng.randrange(5)
            ops.append(("eg", rng.randrange(1000), k))
    return ops


def _encode(ops, qp=30):
    from ffpic_tpu.coding.cabac import ContextModel
    from ffpic_tpu.coding.cabac_enc import CabacEncoder
    enc = CabacEncoder()
    ctx = [ContextModel(iv, qp) for iv in IVS]
    for op in ops:
        if op[0] == "d":
            enc.decision(ctx[op[1]], op[2])
        elif op[0] == "b":
            enc.bypass(op[1])
        elif op[0] == "bn":
            enc.bypass_n(op[1], op[2])
        elif op[0] == "tr":
            enc.truncated_rice(op[1], op[2], op[3], bypass_prefix=True)
        else:
            enc.egk(op[1], op[2])
    enc.terminate(1)
    enc.sink.byte_align()
    return enc.sink.bytes()


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("qp", [0, 26, 51])
def test_roundtrip_our_decoder(seed, qp):
    from ffpic_tpu.coding.cabac import CabacDecoder, ContextModel
    from ffpic_tpu.utils.bitstream import BitReader, MSB
    ops = _schedule(seed, 4000)
    data = _encode(ops, qp)
    dec = CabacDecoder(BitReader(data, MSB))
    ctx = [ContextModel(iv, qp) for iv in IVS]
    for i, op in enumerate(ops):
        if op[0] == "d":
            got, want = dec.decision(ctx[op[1]]), op[2]
        elif op[0] == "b":
            got, want = dec.bypass(), op[1]
        elif op[0] == "bn":
            got, want = dec.bypass_n(op[2]), op[1]
        elif op[0] == "tr":
            got = dec.truncated_rice(op[2], op[3], bypass_prefix=True)
            want = op[1]
        else:
            got, want = dec.exp_golomb_k(op[2]), op[1]
        assert got == want, f"op {i}: {op} -> {got}"
    assert dec.terminate() == 1


DEC_HARNESS = r"""
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include "bitstream.h"
#include "cabac.h"
/* decode a fixed decision/bypass schedule from a stream on stdin-file */
int main(int argc, char **argv) {
    FILE *f = fopen(argv[1], "rb");
    static uint8_t data[65536];
    int n = (int)fread(data, 1, sizeof(data), f);
    fclose(f);
    struct bits_vec *v = bits_vec_alloc(data, n, BITS_MSB);
    cabac_dec *dec = cabac_dec_init(v);
    cabac_init_models(30, 0);
    unsigned r = 31337u;
    for (int i = 0; i < 3000; i++) {
        r = r*1103515245u+12345u; unsigned t = (r>>16)&0xFF;
        if (t < 160) printf("%d\n", cabac_dec_decision(dec, 1 + (int)(t % 6)));
        else         printf("%d\n", cabac_dec_bypass(dec));
    }
    printf("%d\n", cabac_dec_terminate(dec));
    return 0;
}
"""

# reference ctx ids 1..6 initValues at initType 0 (sao_merge,
# sao_type_idx, split_cu_flag[0..2], cu_transquant_bypass)
REF_IDS_IV = (153, 200, 139, 141, 157, 154)


def test_reference_decoder_reads_our_stream(tmp_path):
    """Encode a known bin schedule; the reference C decoder must
    reproduce every bin."""
    from ffpic_tpu.coding.cabac import ContextModel
    from ffpic_tpu.coding.cabac_enc import CabacEncoder
    lib = os.path.join(REPO, "refbuild", "libffpic.a")
    if not os.path.exists(lib):
        pytest.skip("C reference not built")
    src, exe = "/tmp/ffpic_encdiff.c", "/tmp/ffpic_encdiff"
    with open(src, "w") as f:
        f.write(DEC_HARNESS)
    subprocess.run(
        ["gcc", "-I/root/reference/coding", "-I/root/reference/utils",
         src, lib, "-o", exe], check=True, capture_output=True)

    # deterministic bin schedule mirroring the harness's LCG
    enc = CabacEncoder()
    ctx = [ContextModel(iv, 30) for iv in REF_IDS_IV]
    rng = random.Random(99)
    bins = []
    r = 31337
    for i in range(3000):
        r = (r * 1103515245 + 12345) & 0xFFFFFFFF
        t = (r >> 16) & 0xFF
        b = rng.randrange(2)
        bins.append(b)
        if t < 160:
            enc.decision(ctx[t % 6], b)
        else:
            enc.bypass(b)
    enc.terminate(1)
    enc.sink.byte_align()
    p = tmp_path / "enc.bin"
    p.write_bytes(enc.sink.bytes())
    out = subprocess.run([exe, str(p)], capture_output=True, check=True)
    got = [int(x) for x in out.stdout.split()]
    assert got[:-1] == bins
    assert got[-1] == 1   # terminate
