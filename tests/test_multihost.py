"""Multi-host smoke: two `jax.distributed` CPU processes (gloo), one DP
train step over a global 8-device mesh (SURVEY.md §5 'distributed
communication backend' — the only piece a single-process suite can't
cover). Both processes must converge to the same loss."""
import os
import re
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "helpers_multihost.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _gloo_available() -> bool:
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "jax.config.update('jax_cpu_collectives_implementation','gloo')"],
        capture_output=True)
    return r.returncode == 0


def _launch_workers():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    return procs, [p.communicate(timeout=900) for p in procs]


@pytest.mark.skipif(not _gloo_available(),
                    reason="gloo CPU collectives unavailable in this build")
def test_two_process_dp_step():
    # gloo's rendezvous KV store has a fixed ~30s handshake timeout; on a
    # loaded single-core host one worker can miss it while the other is
    # still importing, so allow one relaunch before calling it a failure
    for attempt in range(3):
        procs, results = _launch_workers()
        if all(p.returncode == 0 for p in procs):
            break
        transient = any(s in err for _, err in results
                        for s in ("Gloo context initialization failed",
                                  "DEADLINE_EXCEEDED"))
        if attempt == 2 or not transient:
            tails = "\n---\n".join(
                f"worker {i} rc={p.returncode}:\n{out}\n{err[-2000:]}"
                for i, (p, (out, err)) in enumerate(zip(procs, results)))
            raise AssertionError(f"workers failed:\n{tails}")

    losses = []
    for out, _ in results:
        m = re.search(r"MULTIHOST_LOSS=([-\d.]+)", out)
        assert m, f"no loss line in: {out}"
        losses.append(float(m.group(1)))
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
