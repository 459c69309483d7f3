"""Kill-and-resume chaos test for the snapshot pipeline (north_rule:
"resumable from checkpoint with per-partition lineage").

The clean-boundary resume path is covered by
tests/test_snapshot_skew.py::test_snapshot_run_resume_invalidate; this
module proves the DIRTY boundary: SIGKILL the whole driver process group
while a stage is mid-parquet-write, then re-run and assert

* the torn stage left data files but NO manifest (the commit point is
  the atomic manifest rename — plans/snapshot.py:257-261),
* the re-run resumes the committed upstream stage and REBUILDS the torn
  one (overwrite clears the wreckage),
* the final output is byte-equal to an uninterrupted run (all stage
  math is integer, so equality is exact).
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

from tests.conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "chaos_pipeline.py")


def _cmd(store: str, slow: bool = False) -> list[str]:
    cmd = [sys.executable, SCRIPT, "--sf-dir", SF_SMOKE, "--store", store]
    if slow:
        cmd.append("--slow")
    return cmd


def _parse_result(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("CHAOS_RESULT "):
            return json.loads(line[len("CHAOS_RESULT "):])
    raise AssertionError(f"no CHAOS_RESULT line in output:\n{stdout}")


def _snap_files(store: str, stage: str) -> list[str]:
    out = []
    for d in glob.glob(os.path.join(store, stage, "snap-*")):
        for dirpath, _dn, fns in os.walk(d):
            out.extend(os.path.join(dirpath, fn) for fn in fns)
    return out


def test_sigkill_mid_stage_write_then_resume(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")

    # 1. uninterrupted reference run in its own store
    clean = subprocess.run(
        _cmd(str(tmp_path / "clean")), env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert clean.returncode == 0, clean.stderr[-2000:]
    want = _parse_result(clean.stdout)
    assert want["resumed"] == [False, False, False]

    # 2. chaos run: SIGKILL the process group the moment stage 2
    # (cscored) starts laying down files, BEFORE its manifest commits
    chaos_store = str(tmp_path / "chaos")
    proc = subprocess.Popen(
        _cmd(chaos_store, slow=True), env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    manifest_glob = os.path.join(chaos_store, "cscored", "snap-*",
                                 "_manifest.json")
    killed = False
    deadline = time.time() + 360
    while time.time() < deadline:
        if glob.glob(manifest_glob):
            break  # too late — the stage committed (kill window missed)
        if proc.poll() is not None:
            break  # died on its own
        if _snap_files(chaos_store, "cscored"):
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            killed = True
            break
        time.sleep(0.05)
    assert killed, "never observed an in-flight cscored write to kill"
    proc.wait(timeout=60)

    # torn state: upstream committed, killed stage has files but NO
    # manifest — the atomic-rename commit point never happened
    assert glob.glob(os.path.join(chaos_store, "cdocs", "snap-*",
                                  "_manifest.json"))
    assert not glob.glob(manifest_glob)
    assert _snap_files(chaos_store, "cscored"), (
        "kill was supposed to land mid-write, leaving wreckage"
    )

    # 3. resume over the torn store: cdocs resumes, cscored/cagg rebuild
    resumed = subprocess.run(
        _cmd(chaos_store), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    got = _parse_result(resumed.stdout)
    assert got["resumed"] == [True, False, False]
    assert got["rows"] == want["rows"]
