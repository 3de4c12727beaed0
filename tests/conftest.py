import os
import sys

# Force JAX onto a virtual 8-device CPU mesh for all tests: multi-chip
# sharding code is validated without TPU hardware (the standard JAX recipe).
# The axon harness prepends its platform to JAX_PLATFORMS, so the env var
# alone is not enough — override the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xA12C0DE)


# The kernel knobs (PAIR_STEP, OFFSET_STATE, STREAMS, ...) are module
# globals, NOT jit cache keys: a knob test whose static args + shapes
# match an earlier trace would silently re-run the CACHED kernel and
# pass vacuously — and its own knob-flipped trace would poison later
# default-knob tests.  Clear both kernel caches around every test of the
# knob-flipping modules (tiny interpret shapes; retrace cost is small).
_KNOB_MODULES = ("test_pair_step", "test_offset_state",
                 "test_stream_paths", "test_probe_harness")


@pytest.fixture(autouse=True)
def _fresh_kernel_caches(request):
    if request.module.__name__ not in _KNOB_MODULES:
        yield
        return
    from gpuar_tpu.ops import pallas_decode, pallas_encode

    pallas_encode._encode_call.clear_cache()
    pallas_decode._decode_call.clear_cache()
    yield
    pallas_encode._encode_call.clear_cache()
    pallas_decode._decode_call.clear_cache()


def fixture_corpora(rng, max_size=None):
    """The fixture classes from SURVEY.md §4: boundary sizes and contents."""
    sizes = [0, 1, 2, 15, 16, 17, 255, 4096, 8191, 8192, 8193, 16384, 20000]
    if max_size is not None:
        sizes = [s for s in sizes if s <= max_size]
    cases = []
    for s in sizes:
        cases.append((f"random_{s}", rng.integers(0, 256, s, np.uint8).tobytes()))
    cases.append(("all_zero", bytes(8192)))
    cases.append(("all_ff", b"\xff" * 8192))
    cases.append(("text", (b"the quick brown fox jumps over the lazy dog. " * 400)[:8192 + 300]))
    cases.append(("skewed", bytes(rng.choice([0, 1, 2, 255], size=9000, p=[0.7, 0.2, 0.05, 0.05]).astype(np.uint8))))
    return cases
