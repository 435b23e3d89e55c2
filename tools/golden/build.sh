#!/bin/sh
# Build libqpoases_golden.so: the reference's vendored qpOASES (compiled
# from the read-only tree, never copied into this repo) + the C bridge.
# Usage: tools/golden/build.sh [output_dir]
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="${1:-$HERE}"
QPOASES="${QPM_REFERENCE:-/root/reference}/be2r_cmpc_unitree/src/third_party/qpOASES"

if [ ! -d "$QPOASES/src" ]; then
  echo "qpOASES reference tree not found at $QPOASES" >&2
  exit 2
fi

# Skip the dense-vs-sparse split sources that need LAPACK/BLAS externs
# beyond the bundled replacements; the replacement files cover QProblem.
SRCS="
BLASReplacement.cpp LAPACKReplacement.cpp Bounds.cpp Constraints.cpp
Flipper.cpp Indexlist.cpp Matrices.cpp MessageHandling.cpp Options.cpp
QProblem.cpp QProblemB.cpp SubjectTo.cpp Utils.cpp
"

OBJDIR="$(mktemp -d)"
trap 'rm -rf "$OBJDIR"' EXIT
CXX="${CXX:-g++}"
FLAGS="-O2 -fPIC -D__SUPPRESSANYOUTPUT__ -I$QPOASES/include -w"

for f in $SRCS; do
  "$CXX" $FLAGS -c "$QPOASES/src/$f" -o "$OBJDIR/${f%.cpp}.o" &
done
"$CXX" $FLAGS -c "$HERE/qpoases_bridge.cpp" -o "$OBJDIR/bridge.o" &
wait

"$CXX" -shared -o "$OUT/libqpoases_golden.so" "$OBJDIR"/*.o
echo "built $OUT/libqpoases_golden.so"
