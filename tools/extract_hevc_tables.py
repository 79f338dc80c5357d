"""Extract the HEVC CABAC context initValue tables (ITU-T H.265 Tables
9-5..9-31, spec constants) from the reference source text into
ffpic_tpu/coding/cabac_tables.py — groundwork for the round-2 slice
decoder. Same approach as tools/extract_vp8_tables.py: the numbers are
protocol constants; the decoder code around them is written fresh."""

import re

SRC = "/root/reference/coding/cabac.c"


def main():
    text = open(SRC).read()
    pat = re.compile(
        r"static\s+int\s+(initValue_\w+)\s*((?:\[\d+\])+)\s*=\s*\{(.*?)\};",
        re.S)
    out = ['"""HEVC CABAC context initialization values (ITU-T H.265\n'
           "Tables 9-5 through 9-31) — protocol constants, machine-\n"
           "extracted by tools/extract_hevc_tables.py. Keys are the\n"
           'syntax-element names; values are nested lists indexed by\n'
           '[initType][ctxIdx] where multi-dimensional."""\n\n'
           "INIT_VALUES = {\n"]
    count = 0
    # The reference's identifiers carry typos vs the H.265 syntax
    # element names; normalize so the slice decoder's lookups match
    # the spec (chrome->chroma, flags->flag, indeces->indices).
    renames = {
        "intra_chrome_pred_mode": "intra_chroma_pred_mode",
        "coeff_abs_level_greater2_flags": "coeff_abs_level_greater2_flag",
        "copy_above_indeces_for_final_run_flag":
            "copy_above_indices_for_final_run_flag",
    }
    for m in pat.finditer(text):
        name = m.group(1).replace("initValue_", "")
        name = renames.get(name, name)
        dims = [int(d) for d in re.findall(r"\[(\d+)\]", m.group(2))]
        nums = [int(x) for x in re.findall(r"\d+", m.group(3))]
        total = 1
        for d in dims:
            total *= d
        if len(nums) != total:
            print(f"skip {name}: {len(nums)} values for dims {dims}")
            continue

        def nest(vals, ds):
            if len(ds) == 1:
                return list(vals)
            step = len(vals) // ds[0]
            return [nest(vals[i * step:(i + 1) * step], ds[1:])
                    for i in range(ds[0])]

        out.append(f"    {name!r}: {nest(nums, dims)},\n")
        count += 1
    out.append("}\n")
    with open("/root/repo/ffpic_tpu/coding/cabac_tables.py", "w") as f:
        f.write("".join(out))
    print(f"wrote cabac_tables.py with {count} tables")


if __name__ == "__main__":
    main()
