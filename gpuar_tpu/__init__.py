"""gpuar_tpu: a TPU-native block-parallel adaptive arithmetic coding codec.

A from-scratch rebuild of the capabilities of jiahansu/GPUAR for TPU
hardware: files are split into independent 8192-byte packets, thousands of
packets are coded batch-parallel per chip by JAX/Pallas kernels (the serial
coder runs per batch lane on the VPU), and batches shard data-parallel over
a device mesh.  The .gip container is interchangeable with the reference.
"""

__version__ = "0.1.0"

from gpuar_tpu.config import CodecConfig, DEFAULT_CONFIG  # noqa: F401
