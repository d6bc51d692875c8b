"""Logger CSV semantics: resume truncation + header adoption."""
import csv

from vision4leg_tpu.utils.logger import Logger


def _mk_logger(tmp_path, **kw):
  return Logger("exp", "Env", 0, {"p": 1}, str(tmp_path), **kw)


def test_truncate_epochs_from(tmp_path):
  lg = _mk_logger(tmp_path)
  for ep in range(6):
    lg.add_epoch_info(ep, ep * 10, 0.1, {"m": float(ep)})
  # emulate a crash after epoch 5 + restore from the epoch-2 checkpoint
  lg2 = _mk_logger(tmp_path)
  lg2.truncate_epochs_from(3)
  with open(lg2.csv_file_path, newline="") as f:
    rows = list(csv.DictReader(f))
  assert [r["EPOCH"] for r in rows] == ["0", "1", "2"]
  # resumed writes append from epoch 3 with the adopted header
  lg2.add_epoch_info(3, 30, 0.1, {"m": 3.0})
  with open(lg2.csv_file_path, newline="") as f:
    rows = list(csv.DictReader(f))
  assert [r["EPOCH"] for r in rows] == ["0", "1", "2", "3"]
  assert rows[-1]["m"] == "3.0"


def test_truncate_noop_when_nothing_stale(tmp_path):
  lg = _mk_logger(tmp_path)
  lg.add_epoch_info(0, 0, 0.1, {"m": 0.0})
  lg.truncate_epochs_from(5)
  with open(lg.csv_file_path, newline="") as f:
    rows = list(csv.DictReader(f))
  assert [r["EPOCH"] for r in rows] == ["0"]
