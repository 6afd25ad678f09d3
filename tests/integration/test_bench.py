"""The driver contract: bench.py prints ONE parseable JSON line with the
required keys, on any platform."""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]


def test_bench_quick_emits_valid_json():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick", "--seq", "128"],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-500:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["metric"] == "spectral_mix_tokens_per_sec_seq4k"
    assert rec["value"] > 0
    # roofline accounting must be physical: ideal-traffic GB/s below peak
    assert rec["hbm_roofline_fraction"] <= 1.0, rec
