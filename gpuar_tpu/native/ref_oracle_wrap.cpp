// C ABI wrapper around the REFERENCE codec's host path, used as the test
// oracle that cross-validates this repo's rebuilt codec bit-for-bit
// against the real GPUAR bitstream (VERDICT.md round-1 item 2).
//
// The reference source itself is NOT vendored: the build step
// (reference_oracle.py) trims /root/reference/src/gpuar_kernel.cu at the
// first __global__ kernel (everything above is __host__ __device__ and
// compiles with g++ through the cuda_runtime.h stub in ref_stub/) and
// includes the trimmed copy here.  If the reference tree is absent the
// oracle is simply unavailable and the tests skip.

#include REF_KERNEL_HOST_INC

extern "C" {

// Encode one packet: returns the total packet length (including the
// 4-byte [u16 total][u16 raw] header), exactly arCompress's return
// (reference src/gpuar_kernel.cu:487-531).  `src` must be readable up to
// a 16-byte multiple past `size` (arCompress loads ulonglong2 elements);
// the Python wrapper passes a zero-padded buffer.
int ref_encode_packet(const uint8_t *src, int size, uint8_t *out) {
    AdaptiveProbabilityRange r;
    probability_t cum;
    initializeAdaptiveProbabilityRangeList(&r, cum);
    return arCompress(src, (uint16_t)size, out, r, cum);
}

// Decode one framed packet (header + bitstream): returns the decoded
// byte count (reference arDecompress, src/gpuar_kernel.cu:848-892).
int ref_decode_packet(const uint8_t *packet, uint8_t *out) {
    AdaptiveProbabilityRange r;
    probability_t cum;
    initializeAdaptiveProbabilityRangeList(&r, cum);
    return arDecompress(packet, getCompressedSize(packet), out, r, cum);
}

}  // extern "C"
