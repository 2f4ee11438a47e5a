"""bench.py harness smoke test (BENCH_SMOKE mode, CPU).

Numbers are meaningless in smoke mode; this guards the harness itself:
the streaming evidence protocol (one cumulative summary JSON line per
finished config, so a kill at any instant leaves a parseable tail --
VERDICT r4 #1), the incrementally rewritten details file, the roofline
-guard plumbing, and that every smoke-mode config runs without error.
"""

import json
import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # multi-minute tier: run via plain `pytest tests/`

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_SMOKE"] = "1"
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       cwd=tmp_path, env=env, capture_output=True,
                       text=True, timeout=2700)
    assert r.returncode == 0, r.stderr[-3000:]
    json_lines = [ln for ln in r.stdout.splitlines()
                  if ln.startswith("{") and ln.endswith("}")]
    # streaming protocol: one cumulative summary line per finished config
    # (3 smoke configs) plus the final line; EVERY line must parse and
    # carry the summary schema, because the driver keeps the LAST line
    # whenever the run is killed
    assert len(json_lines) >= 3, r.stdout
    for ln in json_lines:
        parsed = json.loads(ln)
        assert parsed["metric"] == "train_tokens_per_sec_per_chip"
    # the first line streams out before any decode config has run
    first = json.loads(json_lines[0])
    assert list(first["configs"]) == ["transformer_base_train"]
    line = json.loads(json_lines[-1])
    assert line["value"] and line["value"] > 0
    assert line["unit"] == "tokens/s/chip"
    cfgs = line["configs"]
    for name in ("transformer_base_train", "transformer_base_decode_beam4",
                 "transformer_aan_decode_beam4"):
        assert name in cfgs, cfgs
        assert "error" not in cfgs[name], cfgs[name]
    assert cfgs["transformer_base_decode_beam4"]["sentences_per_sec"] > 0
    details = json.load(open(tmp_path / "BENCH_DETAILS.json"))
    assert details["configs"]["transformer_base_train"][
        "windows_work_per_sec"]
    # CPU run: no roofline, mfu absent; guard fields still present
    assert "dropped_above_roofline" in details["configs"][
        "transformer_base_train"]
