"""Summarize the r2 run matrix for PARITY.md.

Prints, per run: frames, eval max / final, running-average max / final,
episode-length trend, terminal-rate trend, and obs-normalizer drift —
the evidence table for the hill fix, the horizon ablation, and the
eval-collapse diagnosis.

Usage: python tools/analyze_runs_r2.py [runs ...]
"""
import csv
import os
import sys

import numpy as np

DEFAULT_RUNS = [
    "hill_10M_r2", "mount_10M",
    "thin_goal_T16_r2", "thin_goal_T64", "thin_goal_T256",
    "state_T16_r2", "state_T64", "state_T256",
    "mmdr_heightfield_10M",
]


def col(rows, header, name):
  if name not in header:
    return None
  i = header.index(name)
  out = []
  for r in rows:
    if len(r) > i and r[i] not in ("", None):
      try:
        out.append(float(r[i]))
      except ValueError:
        out.append(np.nan)
    else:
      out.append(np.nan)
  return np.asarray(out)


def tail_mean(x, n=30):
  x = x[~np.isnan(x)]
  return float(np.mean(x[-n:])) if x.size else float("nan")


def summarize(run_dir):
  path = os.path.join(run_dir, "A1MoveGround", "0", "log.csv")
  if not os.path.exists(path):
    return f"{os.path.basename(run_dir):<22} NO log.csv"
  rows = list(csv.reader(open(path)))
  header, data = rows[0], rows[1:]
  frames = col(data, header, "Total Frames")
  ev = col(data, header, "Eval_Rewards_Average")
  rar = col(data, header, "Running_Average_Rewards")
  eplen = col(data, header, "Running_Average_Eplen")
  term = col(data, header, "diagnostics/terminal_rate")
  nrm = col(data, header, "diagnostics/obs_norm_mean_l2")

  def mx(x):
    x = x[~np.isnan(x)] if x is not None else np.array([])
    return f"{np.max(x):8.1f}" if x.size else "     n/a"

  def last(x):
    x = x[~np.isnan(x)] if x is not None else np.array([])
    return f"{x[-1]:8.1f}" if x.size else "     n/a"

  out = (f"{os.path.basename(run_dir):<22} ep={len(data):4d} "
         f"frames={0 if frames is None or not len(frames) or np.all(np.isnan(frames)) else int(np.nanmax(frames)):>9} "
         f"eval max={mx(ev)} final={last(ev)} "
         f"RAR max={mx(rar)} final={last(rar)}")
  if eplen is not None:
    out += f" eplen(last30)={tail_mean(eplen):6.0f}"
  if term is not None:
    out += f" term%(last30)={100*tail_mean(term):5.2f}"
  if nrm is not None:
    out += f" |norm.mean|(end)={tail_mean(nrm, 5):7.2f}"
  return out


if __name__ == "__main__":
  base = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "runs")
  names = sys.argv[1:] or DEFAULT_RUNS
  for n in names:
    print(summarize(os.path.join(base, n)))
