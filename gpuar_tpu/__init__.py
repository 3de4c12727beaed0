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
