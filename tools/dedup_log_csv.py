"""Deduplicate log.csv epoch rows after a pre-fix crash/retry cycle.

Before commit 191943b / ca5c117, a killed training segment could log
epochs past the checkpoint its retry restored, so the resumed run
appended a second copy of those epochs.  This keeps the LAST occurrence
of each EPOCH (the resumed segment — the one whose trajectory continues
into the rest of the file) and preserves column order.

Usage: python tools/dedup_log_csv.py runs/*/A1MoveGround/*/log.csv
"""
import csv
import sys


def dedup(path: str) -> None:
  with open(path, newline="") as f:
    reader = csv.reader(f)
    header = next(reader, None)
    rows = list(reader)
  if header is None or "EPOCH" not in header:
    print(f"{path}: no EPOCH column, skipping")
    return
  idx = header.index("EPOCH")
  by_epoch = {}
  order = []
  for r in rows:
    try:
      ep = int(float(r[idx]))
    except (ValueError, IndexError):
      continue
    if ep not in by_epoch:
      order.append(ep)
    by_epoch[ep] = r
  if len(by_epoch) == len(rows):
    print(f"{path}: no duplicates")
    return
  with open(path, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(header)
    for ep in sorted(order):
      w.writerow(by_epoch[ep])
  print(f"{path}: {len(rows)} rows -> {len(by_epoch)} unique epochs")


if __name__ == "__main__":
  for p in sys.argv[1:]:
    dedup(p)
