"""Driver-entry regression tests (VERDICT r1 weak #1).

The driver invokes ``python -c "import __graft_entry__;
__graft_entry__.dryrun_multichip(8)"`` in the ambient environment (which
may default to a 1-chip TPU platform), so dryrun_multichip must force the
virtual CPU mesh itself, in process. These tests run that exact import
path in subprocesses with controlled environments.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute tier: run via plain `pytest tests/`

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, env_over):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(env_over)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)


def test_dryrun_multichip_from_bare_import_cpu():
    # No force flag in the env: dryrun must set it before first device use.
    r = _run("import __graft_entry__ as g; g.dryrun_multichip(8)",
             {"JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip ok" in r.stdout


def test_dryrun_multichip_clear_error_when_cpu_client_pinned():
    # If the CPU client was already created with 1 device, growing it is
    # impossible -- the failure must be the explicit RuntimeError, not a
    # bare numpy reshape crash.
    code = (
        "import jax; jax.devices();"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    r = _run(code, {"JAX_PLATFORMS": "cpu"})
    assert r.returncode != 0
    assert "run in a fresh process" in r.stderr
    assert "reshape" not in r.stderr


def test_make_mesh_device_count_error():
    import jax

    from zero_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="make_mesh needs data[*]model"):
        make_mesh(data=4, model=4, devices=jax.devices()[:2])
