"""Restart/resume harness (SURVEY §5.3, VERDICT r3 'missing' item 4).

The framework's failure-recovery story is restartable idempotent stages
plus the fingerprint-keyed NAM savepoint.  This test exercises it the
way a real failure plays out: a process computes the NAM, persists the
savepoint, and DIES before the association statistics; a fresh process
rerunning the same association must resume from the savepoint (no
diffusion recompute) and produce results identical to a never-crashed
run.
"""

import json
import os
import subprocess
import sys

import numpy as np

_WORKER = os.path.join(os.path.dirname(__file__), "restart_worker.py")


def _run(phase, savepoint, out_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single-device is fine and faster
    return subprocess.run(
        [sys.executable, _WORKER, phase, str(savepoint), str(out_path)],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)


def test_resume_after_killed_process(tmp_path):
    sp = tmp_path / "nam_savepoint.npz"
    out_resume = tmp_path / "resume.json"
    out_clean = tmp_path / "clean.json"

    # phase 1: compute NAM + savepoint, then die hard mid-pipeline
    r = _run("crash", sp, tmp_path / "unused.json")
    assert r.returncode == 17, (r.returncode, r.stderr[-2000:])
    assert sp.exists()
    assert "computing NAM" in r.stdout

    # phase 2: a FRESH process resumes — must hit the savepoint
    r = _run("resume", sp, out_resume)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loading NAM from savepoint" in r.stdout, r.stdout[-2000:]
    assert "computing NAM" not in r.stdout

    # ground truth: a never-crashed run in its own process
    r = _run("clean", sp, out_clean)
    assert r.returncode == 0, r.stderr[-2000:]

    resumed = json.load(open(out_resume))
    clean = json.load(open(out_clean))
    assert resumed["p"] == clean["p"]
    np.testing.assert_allclose(resumed["ncorrs"], clean["ncorrs"],
                               rtol=1e-12, atol=1e-12)


def test_stale_savepoint_misses(tmp_path):
    """A savepoint from a DIFFERENT graph/assignment must miss (recompute
    rather than serve a stale NAM)."""
    from cna_tpu.utils import checkpoint as ckpt

    sp = tmp_path / "sp.npz"
    import pandas as pd

    nam = pd.DataFrame(np.ones((3, 5)), index=list("abc"),
                       columns=[f"c{i}" for i in range(5)])
    ckpt.save_nam(str(sp), nam, "fingerprint-A", nsteps=2)
    assert ckpt.load_nam(str(sp), "fingerprint-A") is not None
    assert ckpt.load_nam(str(sp), "fingerprint-B") is None
