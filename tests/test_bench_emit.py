"""bench.py must print ONE parseable JSON line no matter how it dies.

Round-4 postmortem: the driver's BENCH capture was rc=124/parsed=null
because bench.py was SIGTERM'd before its JSON line printed.  These
tests pin the die-loudly contract without paying a full bench run:
the module's _emit machinery is driven directly in a subprocess (so the
signal/atexit handlers it installs can't leak into the pytest process).
"""
import json
import os
import signal
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, **kw) -> subprocess.CompletedProcess:
  env = dict(os.environ, V4L_TPU_PLATFORM="cpu", JAX_PLATFORMS="")
  return subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                        capture_output=True, text=True, timeout=120, **kw)


def test_emit_without_measurement_is_parseable_error():
  r = _run("import bench; bench._emit()")
  line = r.stdout.strip().splitlines()[-1]
  d = json.loads(line)
  assert d["metric"] == "locotransformer_ppo_env_steps_per_sec"
  assert d["value"] is None
  assert "error" in d and "killed_early" in d


def test_sigterm_mid_run_emits_best_so_far():
  # simulate: one measurement recorded, then the driver SIGTERMs us
  code = (
      "import bench, os, signal, time\n"
      "bench._BEST.update({'metric': 'locotransformer_ppo_env_steps_per_sec',"
      " 'value': 12345.6, 'unit': 'env-steps/s (collect+update, thin-goal)',"
      " 'contended': True})\n"
      "os.kill(os.getpid(), signal.SIGTERM)\n"
      "time.sleep(30)\n"  # unreachable if the handler exits as designed
  )
  r = _run(code)
  assert r.returncode == 0  # handler exits 0, not SIGTERM death
  d = json.loads(r.stdout.strip().splitlines()[-1])
  assert d["value"] == 12345.6
  assert d["killed_early"] is True
  assert d["contended"] is True


def test_atexit_emits_exactly_once():
  r = _run("import bench; bench._emit(); bench._emit()")
  lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
  assert len(lines) == 1
