"""Logging utilities.

Mirrors the reference logging contract (`MViT/slowfast/utils/logging.py:39-110`):
process-0-only stdout + file logging, and `log_json_stats` JSON-lines records
(the canonical machine-readable training log).
"""

import builtins
import decimal
import json
import logging
import os
import sys


def _suppress_print():
    def print_none(*objects, sep=" ", end="\n", file=sys.stdout, flush=False):
        pass

    builtins.print = print_none


_LOGGER_CONFIGURED = False


def is_master_process():
    import jax

    return jax.process_index() == 0


def setup_logging(output_dir=None):
    """Configure root 'pmv_tpu' logger: master logs to stdout (+file)."""
    global _LOGGER_CONFIGURED
    logger = logging.getLogger("pmv_tpu")
    if _LOGGER_CONFIGURED:
        return logger
    logger.setLevel(logging.INFO)
    logger.propagate = False
    plain_formatter = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(filename)s: %(lineno)3d: %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    try:
        master = is_master_process()
    except Exception:
        master = True
    if master:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.INFO)
        ch.setFormatter(plain_formatter)
        logger.addHandler(ch)
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
            fh.setLevel(logging.INFO)
            fh.setFormatter(plain_formatter)
            logger.addHandler(fh)
    else:
        _suppress_print()
    _LOGGER_CONFIGURED = True
    return logger


def get_logger(name):
    return logging.getLogger("pmv_tpu." + name if name else "pmv_tpu")


def log_json_stats(stats, logger=None):
    """Log a dict as a `json_stats: {...}` line (reference `logging.py:88-110`)."""
    stats = {
        k: float(decimal.Decimal(f"{v:.5f}")) if isinstance(v, float) else v
        for k, v in stats.items()
    }
    json_stats = json.dumps(stats, sort_keys=True, default=str)
    (logger or logging.getLogger("pmv_tpu")).info("json_stats: %s", json_stats)
