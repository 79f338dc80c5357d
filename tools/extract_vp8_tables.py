"""Extract the RFC 6386 constant tables (coefficient probabilities,
quantizer lookups, keyframe mode probabilities) from the reference
source text into ffpic_tpu/formats/vp8_tables.py.

These are protocol constants defined by RFC 6386 (the VP8 data format
spec, sections 9.6/13.4/13.5/11.5) — the reference embeds the same
numbers (format/webp.c:482-895, predict.c) as does every VP8 decoder.
Extracting the numbers programmatically avoids transcription errors;
the surrounding decoder code is written fresh against the spec.
"""

import re
import numpy as np

SRC = "/root/reference/format/webp.c"


def _numbers_after(text, anchor, count):
    i = text.index(anchor)
    nums = re.findall(r"-?\d+", text[i:i + count * 8 + 20000])
    # skip numbers inside the declaration (array dims) — find '{' first
    j = text.index("{", i)
    nums = re.findall(r"-?\d+", text[j:j + count * 6 + 40000])
    return [int(x) for x in nums[:count]]


def main():
    text = open(SRC).read()

    dc_q = _numbers_after(text, "dc_qlookup[128]", 128)
    ac_q = _numbers_after(text, "ac_qlookup[128]", 128)
    upd = _numbers_after(text, "coeff_update_probs[NUM_TYPES]", 4 * 8 * 3 * 11)
    dflt = _numbers_after(text, "default_coeff_probs[NUM_TYPES]", 4 * 8 * 3 * 11)

    out = []
    out.append('"""RFC 6386 constant tables for VP8 decoding.\n\n'
               "Protocol constants from the VP8 data format spec: quantizer\n"
               "lookups (RFC 6386 14.1), coefficient probability tables\n"
               "(13.4-13.5), keyframe mode probabilities (11.5), token tree\n"
               "and category bases (13.2-13.3). Machine-extracted by\n"
               "tools/extract_vp8_tables.py; same values appear in every\n"
               'VP8 implementation (reference: format/webp.c:482-895)."""\n')
    out.append("import numpy as np\n\n")
    out.append(f"DC_QLOOKUP = {dc_q}\n\n")
    out.append(f"AC_QLOOKUP = {ac_q}\n\n")
    out.append("COEFF_UPDATE_PROBS = np.array(" +
               f"{upd}, dtype=np.uint8).reshape(4, 8, 3, 11)\n\n")
    out.append("DEFAULT_COEFF_PROBS = np.array(" +
               f"{dflt}, dtype=np.uint8).reshape(4, 8, 3, 11)\n\n")

    # small spec tables written directly (RFC 6386 section numbers noted)
    out.append("""\
# coefficient band for each of the 16 zigzag positions (RFC 6386 13.3)
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

# 4x4 zigzag scan (RFC 6386 13.3)
ZIGZAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# dct tokens (RFC 6386 13.2): values 0-4 literal, 5-10 cat1-6, 11 EOB
DCT_EOB = 11
# coeff tree; leaves are -token (walk: i = tree[i + bool]; leaf if <= 0)
TOKEN_TREE = [-DCT_EOB, 2,        # EOB = "0"
              -0, 4,              # DCT_0 = "10"
              -1, 6,              # DCT_1 = "110"
              8, 12,
              -2, 10,             # DCT_2
              -3, -4,             # DCT_3, DCT_4
              14, 16,
              -5, -6,             # cat1, cat2
              18, 20,
              -7, -8,             # cat3, cat4
              -9, -10]            # cat5, cat6

# extra-bit probabilities per category (RFC 6386 13.3)
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
CAT_BASE = [5, 7, 11, 19, 35, 67]

# keyframe intra mode probability tables (RFC 6386 11.5 / 11.2)
KF_YMODE_PROBS = [145, 156, 163, 128]
KF_UV_MODE_PROBS = [142, 114, 183]

# intra mode trees: 16x16 y modes for keyframes order
# {DC, V, H, TM, B_PRED}; tree per RFC 6386 11.2 (kf variant: B first)
KF_YMODE_TREE = [-4, 2,           # B_PRED
                 4, 6,
                 -0, -1,          # DC, V
                 -2, -3]          # H, TM
UV_MODE_TREE = [-0, 2,            # DC
                -1, 4,            # V
                -2, -3]           # H, TM

# 4x4 b-modes in the libwebp enum order that KF_BMODE_PROBS is laid
# out in (and which the reference shares, predict.h:13-22):
# B_DC=0, B_TM=1, B_VE=2, B_HE=3, B_RD=4, B_VR=5, B_LD=6, B_VL=7,
# B_HD=8, B_HU=9.  (RFC 6386 prints the same tree with its own enum.)
BMODE_TREE = [-0, 2,              # B_DC = "0"
              -1, 4,              # B_TM = "10"
              -2, 6,              # B_VE = "110"
              8, 12,
              -3, 10,             # B_HE = "11100"
              -4, -5,             # B_RD, B_VR
              -6, 14,             # B_LD
              -7, 16,             # B_VL
              -8, -9]             # B_HD, B_HU

# segment id tree (RFC 6386 10)
SEGMENT_TREE = [2, 4, -0, -1, -2, -3]
""")

    # kf b-mode probs (10x10x9) — in predict-related tables in webp.c?
    src = open("/root/reference/format/webp.c").read()
    m = re.search(
        r"kf_bmode_prob\s*\[NUM_BMODES\]\[NUM_BMODES\]\[NUM_BMODES - 1\]\s*=",
        src)
    if m:
        j = src.index("{", m.end() - 1)
        nums = [int(x) for x in re.findall(r"\d+", src[j:j + 40000])][:900]
        out.append("\nKF_BMODE_PROBS = np.array(" + str(nums) +
                   ", dtype=np.uint8).reshape(10, 10, 9)\n")
    else:
        raise SystemExit("kf_b_mode_prob table not found")

    with open("/root/repo/ffpic_tpu/formats/vp8_tables.py", "w") as f:
        f.write("".join(out))
    print("wrote vp8_tables.py",
          "dcq", dc_q[:4], "acq", ac_q[:4],
          "probs", dflt[:5])


if __name__ == "__main__":
    main()
