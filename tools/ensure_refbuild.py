"""Build the C reference decoder oracles on demand.

The vs-C-reference conformance tests (test_jpeg_conformance,
test_cabac, test_cabac_enc, test_hevc_slice) need two gitignored
builds of /root/reference:

  refbuild/       Release static lib + transbmp/picinfo CLIs
  refbuild-asan/  ASAN-recover build + ref_hevc_harness (the
                  reference's HEVC cleanup has benign heap bugs that
                  abort a plain glibc build; see
                  tools/build_ref_asan.sh)

A fresh checkout therefore used to SKIP all 46 conformance tests.
This module makes `pytest tests/` self-sufficient: conftest calls
ensure_refbuild() once per session and builds whatever is missing
(~1-2 min on this 1-vCPU box, cached afterwards).

Opt-outs: set FFPIC_NO_REFBUILD=1 to skip the auto-build (the tests
then skip as before), e.g. for quick iteration loops.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _run(cmd, timeout=900):
    return subprocess.run(cmd, cwd=REPO, capture_output=True,
                          text=True, timeout=timeout)


def _build_release() -> bool:
    out = os.path.join(REPO, "refbuild")
    r = _run(["cmake", "-S", REFERENCE, "-B", out, "-G", "Ninja",
              "-DCMAKE_BUILD_TYPE=Release",
              "-DCMAKE_C_FLAGS=-Wno-error -w"])
    if r.returncode != 0:
        print("refbuild cmake failed:", r.stderr[-500:], file=sys.stderr)
        return False
    r = _run(["ninja", "-C", out])
    if r.returncode != 0:
        print("refbuild ninja failed:", r.stderr[-500:], file=sys.stderr)
        return False
    return True


def _build_asan() -> bool:
    r = _run(["sh", os.path.join(REPO, "tools", "build_ref_asan.sh")])
    if r.returncode != 0:
        print("refbuild-asan failed:", r.stderr[-500:], file=sys.stderr)
        return False
    return True


def ensure_refbuild(asan: bool = True) -> bool:
    """Idempotently build the missing reference oracles.  Returns True
    when refbuild/transbmp exists afterwards."""
    if os.environ.get("FFPIC_NO_REFBUILD"):
        return os.path.exists(os.path.join(REPO, "refbuild", "transbmp"))
    if not os.path.isdir(REFERENCE):
        return False
    ok = True
    if not os.path.exists(os.path.join(REPO, "refbuild", "transbmp")):
        ok = _build_release() and ok
    if asan and not os.path.exists(
            os.path.join(REPO, "refbuild-asan", "ref_hevc_harness")):
        ok = _build_asan() and ok
    return ok and os.path.exists(os.path.join(REPO, "refbuild",
                                              "transbmp"))


if __name__ == "__main__":
    sys.exit(0 if ensure_refbuild() else 1)
