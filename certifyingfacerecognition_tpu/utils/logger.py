"""Dual-handler logger (stdout INFO + file DEBUG).

API mirror of /root/reference/utils/logger.py:11-66, including its refusal
to reuse logger names or clobber existing log files (the reference's
"fresh output dir per run" discipline, logger.py:37-58) — overridable for
programmatic use.
"""

from __future__ import annotations

import logging
import os
import sys


def setup_logger(work_dir: str | None = None, logfile_name: str = "log.txt",
                 logger_name: str = "logger",
                 allow_existing: bool = False) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    # Check the logger's OWN handlers, not hasHandlers(): that walks up to
    # the root logger and would trip on unrelated root handlers (pytest's
    # capture handler, absl, ...).
    if logger.handlers and not allow_existing:
        raise SystemExit(f"Logger name `{logger_name}` has already been set up!")
    if logger.handlers:
        return logger

    logger.setLevel(logging.DEBUG)
    formatter = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")

    sh = logging.StreamHandler(stream=sys.stdout)
    sh.setLevel(logging.INFO)
    sh.setFormatter(formatter)
    logger.addHandler(sh)

    if work_dir is None:
        return logger

    os.makedirs(work_dir, exist_ok=True)
    log_path = os.path.join(work_dir, logfile_name)
    if os.path.isfile(log_path) and not allow_existing:
        raise SystemExit(f"Log file `{log_path}` already exists!")
    fh = logging.FileHandler(log_path)
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(formatter)
    logger.addHandler(fh)
    return logger


def print_to_log(text: str, txt_file_path: str) -> None:
    """Append a line to a results text file (gen_utils.py:58-60)."""
    with open(txt_file_path, "a") as f:
        print(text, file=f)


def args2text(args) -> str:
    d = vars(args)
    return " | ".join(f"{k}: {d[k]}" for k in d)
