"""gpuar_tpu: a TPU-native block-parallel adaptive arithmetic coding codec.

A from-scratch rebuild of the capabilities of jiahansu/GPUAR for TPU
hardware: files are split into independent 8192-byte packets, thousands of
packets are coded batch-parallel per chip by JAX/Pallas kernels (the serial
coder runs per batch lane on the VPU), and batches shard data-parallel over
a device mesh.  The .gip container is interchangeable with the reference.
"""

__version__ = "0.1.0"

from gpuar_tpu.config import CodecConfig, DEFAULT_CONFIG  # noqa: F401
from gpuar_tpu.container import ContainerError, FileHeader  # noqa: F401
from gpuar_tpu.utils.stats import CompressionInfo, ProgressMonitor  # noqa: F401


def _pick_backend(host: bool, threads: int, debug: bool = False):
    """Same backend policy as the CLI: accelerator by default, host on
    request or as fallback (reference src/main.cpp:142-146); --debug
    semantics require the accelerator decode path."""
    if not host:
        try:
            from gpuar_tpu.parallel.runner import TPUCompressor
            return TPUCompressor(debug=debug)
        except Exception as e:
            if debug:
                raise
            # A library caller must not silently get ~45 MB/s host coding
            # when they asked for the accelerator; mirror the CLI's
            # "Attention: accelerator unavailable" notice (cli.py) as a
            # warning carrying the init error.
            import warnings
            warnings.warn(
                f"accelerator unavailable ({e!r}); falling back to the "
                "host codec — pass host=True to silence this",
                RuntimeWarning, stacklevel=3)
    from gpuar_tpu.pipeline import HostCompressor
    return HostCompressor(threads=threads)


def compress(src, dst, *, host: bool = False, threads: int = 1,
             resume: bool = False, monitor=None) -> "CompressionInfo":
    """Compress file ``src`` into .gip archive ``dst`` (library mirror of
    the CLI ``c`` verb).  ``host=True`` forces the native host codec;
    otherwise the accelerator is used when available."""
    return _pick_backend(host, threads).compress(
        src, dst, monitor=monitor, resume=resume)


def decompress(src, dst, *, host: bool = False, threads: int = 1,
               debug: bool = False, monitor=None) -> "CompressionInfo":
    """Decompress .gip archive ``src`` into file ``dst`` (CLI ``d``).
    ``debug=True`` enables the kernel's corrupt-packet detection and
    requires the accelerator path (raises if it is unavailable)."""
    return _pick_backend(host, threads, debug=debug).decompress(
        src, dst, monitor=monitor)


def verify(path, *, deep: bool = False, threads: int = 1) -> dict:
    """Integrity-check a .gip archive (CLI ``v``); see
    pipeline.verify_archive."""
    from gpuar_tpu.pipeline import verify_archive
    return verify_archive(path, deep=deep, threads=threads)


def __getattr__(name):
    # Lazy heavyweight entry points (importing JAX only when asked for).
    if name == "HostCompressor":
        from gpuar_tpu.pipeline import HostCompressor
        return HostCompressor
    if name == "TPUCompressor":
        from gpuar_tpu.parallel.runner import TPUCompressor
        return TPUCompressor
    if name == "DistributedCompressor":
        from gpuar_tpu.parallel.distributed import DistributedCompressor
        return DistributedCompressor
    if name == "MeshCodec":
        from gpuar_tpu.parallel.mesh import MeshCodec
        return MeshCodec
    raise AttributeError(f"module 'gpuar_tpu' has no attribute {name!r}")
