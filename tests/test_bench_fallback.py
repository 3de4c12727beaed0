"""bench.py's tunnel-down fallback (VERDICT r3 next #3).

Round 3 closed with BENCH_r03.json = 0.0 because the device tunnel was
down at the driver's bench time even though a same-round on-chip capture
existed.  The fallback must now replay the committed snapshot with an
explicit REPLAY label, and only emit 0.0 when no snapshot exists at all.
"""

import json
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent


def _bench(monkeypatch, tmp_path=None):
    sys.path.insert(0, str(_REPO_ROOT))
    try:
        import bench
    finally:
        sys.path.pop(0)
    return bench


def test_replay_uses_committed_snapshot(monkeypatch, capsys):
    bench = _bench(monkeypatch)
    bench._emit_unreachable("tunnel down (test)")
    line = capsys.readouterr().out.strip()
    out = json.loads(line)
    # The repo carries committed snapshots; the replayed value must be a
    # real nonzero measurement, labeled as a replay BOTH at the top level
    # (machine-readable, for consumers that parse only headline fields)
    # and in the detail, naming the round it actually came from.
    assert out["value"] > 0
    assert out["replay"] is True
    assert out["replay_of"].startswith("round-")
    assert "REPLAY" in out["detail"]["source"]
    assert out["replay_of"].split("-")[1].split()[0] in \
        out["detail"]["source"]
    assert "tunnel down (test)" in out["detail"]["source"]


def test_replay_picks_numerically_latest_snapshot(monkeypatch, capsys,
                                                  tmp_path):
    # bench_snapshot_r10.json sorts lexicographically BEFORE r4; the
    # fallback must sort by the numeric round index.
    import json as _json
    bench = _bench(monkeypatch)
    root = tmp_path
    (root / "benchmarks").mkdir()
    for rnd, val in (("4", 0.4), ("10", 0.9)):
        (root / "benchmarks" / f"bench_snapshot_r{rnd}.json").write_text(
            _json.dumps({"metric": "m", "value": val, "unit": "GB/s",
                         "vs_baseline": val}) + "\n")
    fake = root / "bench.py"
    fake.write_text("")
    monkeypatch.setattr(bench, "__file__", str(fake))
    bench._emit_unreachable("tunnel down (test)")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.9
    assert out["replay_of"] == "round-10 committed on-chip capture"


def test_no_snapshot_emits_honest_zero(monkeypatch, capsys, tmp_path):
    bench = _bench(monkeypatch)
    # Point the module at an empty tree: no snapshots to replay.
    fake = tmp_path / "bench.py"
    fake.write_text("")
    monkeypatch.setattr(bench, "__file__", str(fake))
    bench._emit_unreachable("tunnel down (test)")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "unreachable" in out["detail"]["error"]
