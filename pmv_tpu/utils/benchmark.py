"""Data-loading benchmark (`MViT/slowfast/utils/benchmark.py:20-103`).

Iterates the train loader for BENCHMARK.NUM_EPOCHS epochs without touching
the model and logs batches/sec + RAM, isolating input-pipeline throughput
(decode + resize + crop + collate + prefetch).
"""

import resource

from pmv_tpu.data import loader as loader_mod
from pmv_tpu.utils import logging as pmv_logging
from pmv_tpu.utils.meters import ScalarMeter
from pmv_tpu.utils.timer import Timer

logger = pmv_logging.get_logger(__name__)


def cpu_mem_usage():
    """(this-process GB, peak GB)."""
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 ** 2
    return peak, peak


def benchmark_data_loading(cfg):
    pmv_logging.setup_logging(cfg.OUTPUT_DIR)
    logger.info("Benchmarking data loading with config:")
    logger.info(cfg.dump())

    timer = Timer()
    train_loader = loader_mod.construct_loader(cfg, "train")
    logger.info(
        "Constructed loader: %d batches of %d",
        len(train_loader), cfg.TRAIN.BATCH_SIZE,
    )
    batch_times = ScalarMeter(cfg.BENCHMARK.LOG_PERIOD)
    total = 0
    for epoch in range(cfg.BENCHMARK.NUM_EPOCHS):
        if cfg.BENCHMARK.SHUFFLE:
            train_loader.set_epoch(epoch)
        timer.reset()
        for cur_iter, batch in enumerate(train_loader):
            batch_times.add_value(timer.seconds())
            timer.reset()
            total += batch["frames"].shape[0]
            if (cur_iter + 1) % cfg.BENCHMARK.LOG_PERIOD == 0:
                ram = cpu_mem_usage()[0]
                logger.info(
                    "epoch %d iter %d: %.4f s/batch (%.1f clips/s), RAM %.2f GB",
                    epoch, cur_iter + 1, batch_times.get_win_median(),
                    cfg.TRAIN.BATCH_SIZE / max(batch_times.get_win_median(), 1e-9),
                    ram,
                )
    logger.info("Benchmark complete: %d clips loaded", total)
    return batch_times.get_global_avg()
