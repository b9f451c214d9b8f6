"""Two-process multihost dryrun as a subprocess test (VERDICT r2 item 5).

Spawns 2 actual processes that jax.distributed.initialize over a shared
8-device CPU mesh, feed strided host shards through
make_array_from_process_local_data, run 2 train steps, and do one
collective orbax save/restore — the real multi-process path the faked
process-count unit tests in test_train.py cannot cover
(ref DDP analogue: train.py:103-110, NUM_NODES).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "dryrun", "8", "--processes", "2"],
        capture_output=True, text=True, timeout=1500,
        # workers force their own XLA_FLAGS/platform; drop the conftest's
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    assert res.returncode == 0, res.stdout + res.stderr
    assert "dryrun_multihost(8, processes=2): OK" in res.stdout, res.stdout
    # both ranks printed identical losses (checked by the parent too, but
    # assert the marker lines made it out)
    rank_lines = [l for l in res.stdout.splitlines() if l.startswith("RANK")]
    assert len(rank_lines) == 2, res.stdout
