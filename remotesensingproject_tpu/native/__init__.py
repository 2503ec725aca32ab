"""Native (C++) runtime components.

The reference's runtime substrate is C++ (OpenCV imread + OpenMP); the
TPU-native equivalent here is a small C++ shared library providing a
multi-threaded image-stack loader (PNG/PGM/PPM/uncompressed-TIFF decode +
thread-pool prefetch), bound via ctypes.  Python/PIL remains the fallback
for exotic formats.
"""
