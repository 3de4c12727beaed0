// Host-only stub of the CUDA runtime, just enough to compile the
// reference codec's __host__ __device__ functions with g++ as the test
// oracle (VERDICT.md round-1 item 2).  No CUDA semantics are emulated:
// the qualifiers erase, ulonglong2 is a plain 16-byte struct, and
// cudaMemcpyToSymbol degrades to memcpy into the (ordinary) global.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>

#define __host__
#define __device__
#define __global__
#define __constant__
#define __shared__
#define __align__(n) __attribute__((aligned(n)))

struct ulonglong2 {
    unsigned long long x, y;
};

#define cudaMemcpyToSymbol(dst, src, n) std::memcpy(&(dst), (src), (n))
