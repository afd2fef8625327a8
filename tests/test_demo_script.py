"""The demo script (the reference's demo.ipynb as code) runs end to end.

SURVEY §4: the reference's only executable validation is its demo
notebook; here that role is a scripted, asserted test.
"""

import os
import subprocess
import sys


def test_demo_script_end_to_end(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "demo_out"
    env = dict(os.environ, MPLBACKEND="Agg")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "demo.py"),
         "--cpu", "--out", str(out), "--cells-per-sample", "60"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "association.png").exists()
    # the demo prints the global p-values it computed
    assert "p" in r.stdout.lower()
