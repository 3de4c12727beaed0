"""Control-flow smoke of the on-chip probe harness's sweep sections.

The OFFSET_STATE / STACK_SCALAR sweeps in benchmarks/probe_decode_r3.py
are normally only executed on the real TPU (they were authored during a
tunnel outage); a NameError or knob-restore bug there would waste an
unattended measurement window.  This test stubs the kernels and corpus
and drives every sweep entry path (full sweeps, --only chunks, encode
floor), then asserts the module-level knob state is restored.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

_REPO_ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize("argv", [
    ["--offset", "--skip-floor", "--reps", "1"],
    ["--stack", "--skip-floor", "--reps", "1"],
    ["--offset", "--only", "5", "--skip-floor", "--reps", "1"],
    ["--offset", "--only", "2", "--skip-floor", "--reps", "1"],
    ["--stack", "--only", "5", "--skip-floor", "--reps", "1"],
    ["--encode-floor", "--skip-floor", "--reps", "1"],
    ["--r4", "--skip-floor", "--reps", "1"],
    ["--r4", "--only", "7", "--skip-floor", "--reps", "1"],
    ["--enc-r4", "--skip-floor", "--reps", "1"],
    ["--enc-r4", "--only", "6", "--skip-floor", "--reps", "1"],
    ["--hull", "--skip-floor", "--reps", "1"],
    ["--hull", "--only", "1", "--skip-floor", "--reps", "1"],
    ["--chunk", "--skip-floor", "--reps", "1"],
    ["--chunk", "--only", "3", "--skip-floor", "--reps", "1"],
])
def test_probe_sweep_paths_execute(argv, monkeypatch):
    sys.path.insert(0, str(_REPO_ROOT))
    try:
        import benchmarks.probe_decode_r3 as pr
    finally:
        sys.path.pop(0)

    N, PS = 64, 8192
    OW = pr.pallas_encode.out_geometry(PS)[0] * 8
    data = np.zeros((N, PS), np.uint8)
    packets = np.zeros((N, OW * 4), np.uint8)
    sizes = np.full(N, PS, np.int32)

    plens = np.full(N, 16, np.int32)
    perr = np.zeros(N, bool)
    monkeypatch.setattr(pr, "corpus",
                        lambda **kw: (data, packets, sizes, plens, perr))
    monkeypatch.setattr(pr, "run", lambda name, *a, **kw: None)

    class _FakeEncodeCall:
        @staticmethod
        def clear_cache():
            pass

        def __call__(self, wd, sz, **kw):
            pk32 = np.ascontiguousarray(packets).view(np.int32)
            return (pk32, np.full((1, N), 16, np.int32),
                    np.zeros((1, N), np.int32))

    monkeypatch.setattr(pr.pallas_encode, "_encode_call", _FakeEncodeCall())
    monkeypatch.setattr(sys, "argv", ["probe_decode_r3.py"] + argv)

    D, E = pr.pallas_decode, pr.pallas_encode
    before = (D.OFFSET_STATE, D.STACK_SCALAR, D.XDIV, D.STREAMS,
              D.UNROLL_WORDS, E.OFFSET_STATE, E.ABLATE_SCALAR,
              E.DUMP_WORDS, E.UNROLL_WORDS)
    pr.main()
    assert (D.OFFSET_STATE, D.STACK_SCALAR, D.XDIV, D.STREAMS,
            D.UNROLL_WORDS, E.OFFSET_STATE, E.ABLATE_SCALAR,
            E.DUMP_WORDS, E.UNROLL_WORDS) == before, \
        "sweep leaked knob state"
