"""The enwik8 stand-in must stay bit-for-bit pinned: every round's ratio
numbers are only comparable if the corpus never drifts."""

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from benchmarks import enwik_proxy


def test_proxy_is_pinned():
    data = enwik_proxy.generate(1 << 20)
    assert hashlib.sha256(data).hexdigest() == enwik_proxy.SHA256_1M


def test_proxy_prefix_stable():
    # generate(size) must be a prefix-stable pure function of size.
    a = enwik_proxy.generate(1 << 16)
    b = enwik_proxy.generate(1 << 17)
    assert b[: 1 << 16] == a


def test_utf8_proxy_is_pinned():
    data = enwik_proxy.generate_utf8(1 << 20)
    assert hashlib.sha256(data).hexdigest() == enwik_proxy.SHA256_UTF8_1M


def test_utf8_proxy_prefix_stable_and_high_byte():
    import numpy as np

    a = enwik_proxy.generate_utf8(1 << 16)
    b = enwik_proxy.generate_utf8(1 << 17)
    assert b[: 1 << 16] == a
    arr = np.frombuffer(a, np.uint8)
    # The point of this corpus: mixed high/low bytes in every chunk, so
    # the hull fast paths can never hold.
    assert (arr >= 128).mean() > 0.6
    assert (arr < 128).mean() > 0.1


def test_proxy_compresses_like_text():
    """The codec should get a text-like ratio out of it (enwik8-class
    workloads compress to roughly 0.6-0.7 with an order-0 adaptive
    coder)."""
    from gpuar_tpu import native

    data = enwik_proxy.generate(1 << 20)
    body = native.encode_stream(data)
    ratio = len(body) / len(data)
    assert 0.45 < ratio < 0.75, ratio
