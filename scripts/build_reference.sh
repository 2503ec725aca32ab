#!/bin/sh
# Build the reference library (/root/reference/RSLightFields) UNMODIFIED
# against OpenCV 4, plus our golden-oracle driver (ref_driver.cpp).
# The reference tree is read-only; OpenCV 3 constants are supplied by a
# force-included compat header, and <experimental/filesystem> links via
# stdc++fs.  Output: .refbuild/ref_driver (gitignored).
set -e
REF=${REF:-/root/reference/RSLightFields}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${OUT:-$HERE/../.refbuild}
mkdir -p "$OUT"

CXXFLAGS="-O2 -std=c++17 -fopenmp -w -include $HERE/refbuild/compat.hpp \
  -I$REF/include $(pkg-config --cflags opencv4)"
LDLIBS="$(pkg-config --libs opencv4) -lstdc++fs -fopenmp"

for src in "$REF"/src/*.cpp; do
    obj="$OUT/$(basename "$src" .cpp).o"
    if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
        echo "CXX $(basename "$src")"
        g++ $CXXFLAGS -c "$src" -o "$obj"
    fi
done

echo "CXX ref_driver.cpp"
g++ $CXXFLAGS -c "$HERE/refbuild/ref_driver.cpp" -o "$OUT/ref_driver.o"
g++ "$OUT"/*.o -o "$OUT/ref_driver" $LDLIBS
echo "built $OUT/ref_driver"
