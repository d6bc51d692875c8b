"""Tail-stability metrics for the late-training oscillation study
(VERDICT r3 #1): eval max, last-10-evals mean, and the WORST post-epoch-
300 eval per run — the three numbers the clipped-value-loss A/B decides
on (PARITY.md horizon table).

  python tools/tail_metrics.py runs/thin_goal_T64 runs/thin_goal_T64_cvf ...

Prints one markdown table row per run dir (any seed subdirs found).
"""
import csv
import glob
import os.path as osp
import sys


def tail_metrics(log_csv, post=300):
  evals = []
  with open(log_csv) as f:
    for row in csv.DictReader(f):
      v = row.get("Eval_Rewards_Average", "")
      if v not in ("", None):
        try:
          evals.append((int(row["EPOCH"]), float(v)))
        except ValueError:
          continue
  if not evals:
    return None
  vals = [v for _, v in evals]
  tail = [v for e, v in evals if e >= post]
  return {
      "n_evals": len(evals),
      "eval_max": max(vals),
      "last10_mean": sum(vals[-10:]) / len(vals[-10:]),
      "worst_post%d" % post: min(tail) if tail else float("nan"),
      "final": vals[-1],
  }


def main():
  print("| run | evals | eval max | last-10 mean | worst post-300 | final |")
  print("|---|---|---|---|---|---|")
  for run_dir in sys.argv[1:]:
    for log in sorted(glob.glob(osp.join(run_dir, "*", "*", "log.csv"))):
      seed = osp.basename(osp.dirname(log))
      m = tail_metrics(log)
      if m is None:
        print(f"| {osp.basename(run_dir)}/s{seed} | no evals |")
        continue
      print(f"| {osp.basename(run_dir)}/s{seed} | {m['n_evals']} "
            f"| {m['eval_max']:.1f} | {m['last10_mean']:.1f} "
            f"| {m['worst_post300']:.1f} | {m['final']:.1f} |")


if __name__ == "__main__":
  main()
