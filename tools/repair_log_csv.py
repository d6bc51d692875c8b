"""One-off repair for log.csv files written before the logger kept CSV
columns aligned: the header was frozen at epoch 0 while later rows
positionally gained Running_Average_Rewards (+1, inserted before
Train___Time) and the two Eval_* columns (+2, appended), so row lengths
vary by up to 3 against the fixed header.

The original key order is deterministic (agent.train: metric dict ->
Running_Average_Rewards? -> Train___Time -> Eval_Rewards_Average? ->
Eval____Time?), so the row length identifies which optional keys are
present.

Usage: python tools/repair_log_csv.py runs/*/A1MoveGround/*/log.csv
"""
import csv
import sys


def repair(path: str) -> None:
  with open(path, newline="") as f:
    rows = list(csv.reader(f))
  header, data = rows[0], rows[1:]
  assert header[-1] == "Train___Time", header
  has_rar = "Running_Average_Rewards" in header
  # valid extras over the frozen header: headers WITH RAR can only gain
  # the two Eval_* columns (0 or 2); headers WITHOUT it can also gain the
  # positional RAR insert (0..3).  Anything else is malformed — skip
  # instead of mis-assigning columns below.
  allowed = (0, 2) if has_rar else (0, 1, 2, 3)
  if not all(len(r) - len(header) in allowed for r in data):
    print(f"{path}: unexpected row lengths, skipping")
    return
  n = len(header)
  base = header[:-1]  # everything before Train___Time
  full = list(base)
  if not has_rar:
    full.append("Running_Average_Rewards")
  full += ["Train___Time", "Eval_Rewards_Average", "Eval____Time"]
  out_rows = []
  for r in data:
    extra = len(r) - n
    vals = dict(zip(base, r[:len(base)]))
    rest = r[len(base):]
    if not has_rar and extra in (1, 3):   # RAR present in this row
      vals["Running_Average_Rewards"] = rest[0]
      rest = rest[1:]
    vals["Train___Time"] = rest[0]
    if rest[1:]:                          # eval columns present
      vals["Eval_Rewards_Average"] = rest[1]
      vals["Eval____Time"] = rest[2]
    out_rows.append(vals)
  with open(path, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=full)
    w.writeheader()
    for vals in out_rows:
      w.writerow({k: vals.get(k, "") for k in full})
  print(f"{path}: repaired {len(out_rows)} rows")


if __name__ == "__main__":
  for p in sys.argv[1:]:
    repair(p)
