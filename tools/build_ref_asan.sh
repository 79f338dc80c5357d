#!/bin/sh
# Build the C reference with -fsanitize-recover=address into
# refbuild-asan/ — needed because the reference's HEVC path has benign
# heap overflows (e.g. colBd off-by-one, hevc.c:2454-2458) that abort a
# plain glibc build during cleanup; ASAN-recover reports and continues,
# letting the conformance harness capture complete output.
set -e
cd "$(dirname "$0")/.."
cmake -S /root/reference -B refbuild-asan -G Ninja -DCMAKE_BUILD_TYPE=Debug \
  -DCMAKE_C_FLAGS="-Wno-error -w -fsanitize=address -fsanitize-recover=address -g" >/dev/null
ninja -C refbuild-asan >/dev/null
gcc -I/root/reference/coding -I/root/reference/utils -I/root/reference/format \
  -fsanitize=address -fsanitize-recover=address -g \
  tools/ref_hevc_harness.c refbuild-asan/libffpic.a -lm \
  -o refbuild-asan/ref_hevc_harness
echo "built refbuild-asan/ref_hevc_harness"
