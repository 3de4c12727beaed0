"""Fast iteration timing for the production encode/decode kernels.

Usage: python benchmarks/iterbench.py [enc|dec|both] [tile] [n_packets]
Times the jitted device calls only (no container/host pipeline), after a
warm-up compile, and verifies a few lanes against the native golden codec.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_packets = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

    import jax.numpy as jnp
    from gpuar_tpu import native
    from gpuar_tpu.ops import pallas_decode, pallas_encode

    psize = 8192
    og, ow = pallas_encode.out_geometry(psize)
    rng = np.random.default_rng(0xBE7C)
    data = rng.integers(0, 256, (n_packets, psize), np.uint8)
    sizes = np.full(n_packets, psize, np.int32)

    wd = jnp.asarray(np.ascontiguousarray(data).view(np.int32))
    sz = jnp.asarray(sizes.reshape(1, -1))
    total = n_packets * psize

    packets = lens_h = None
    if which in ("enc", "both"):
        pk32, lens, errs = pallas_encode._encode_call(
            wd, sz, tile=tile, packet_size=psize, out_groups=og)
        np.asarray(lens)
        ts = []
        for _ in range(3):
            t0 = time.time()
            pk32, lens, errs = pallas_encode._encode_call(
                wd, sz, tile=tile, packet_size=psize, out_groups=og)
            lens_h = np.asarray(lens)
            ts.append(time.time() - t0)
        t_enc = min(ts)
        print(f"encode: {t_enc*1e3:8.2f} ms  {total/t_enc/1e9:7.3f} GB/s  "
              f"({t_enc*1e9/((n_packets//tile)*psize):6.1f} ns/step)")
        assert not np.asarray(errs).any()
        packets = np.ascontiguousarray(np.asarray(pk32)).view(np.uint8)
        for i in (0, 1, n_packets // 2, n_packets - 1):
            exp = native.encode_packet(data[i].tobytes())
            assert packets[i, : lens_h[0, i]].tobytes() == exp, \
                f"lane {i} diverged"

    if which in ("dec", "both"):
        if packets is None:
            packets = np.empty((n_packets, ow * 4), np.uint8)
            lens_h = np.empty((1, n_packets), np.int32)
            for i in range(n_packets):
                enc = native.encode_packet(data[i].tobytes())
                packets[i, : len(enc)] = np.frombuffer(enc, np.uint8)
                lens_h[0, i] = len(enc)
        bd = jnp.asarray(np.ascontiguousarray(packets).view(np.int32))
        out = pallas_decode._decode_call(
            bd, sz, tile=tile, packet_size=psize, out_groups=og)
        np.asarray(out)
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = pallas_decode._decode_call(
                bd, sz, tile=tile, packet_size=psize, out_groups=og)
            np.asarray(out[0:1, 0:1])  # sync on the kernel, not the transfer
            ts.append(time.time() - t0)
        t_dec = min(ts)
        print(f"decode: {t_dec*1e3:8.2f} ms  {total/t_dec/1e9:7.3f} GB/s  "
              f"({t_dec*1e9/((n_packets//tile)*psize):6.1f} ns/step)")
        raw = np.ascontiguousarray(np.asarray(out)).view(np.uint8)[:, :psize]
        assert np.array_equal(raw, data), "round-trip mismatch"


if __name__ == "__main__":
    main()
