"""Audio-visual Kinetics dataset (`MViT/slowfast/datasets/kinetics_av.py`).

Extends the Kinetics pipeline with a synchronized log-mel audio clip decoded
by the native library, plus an optional misaligned audio window for the AVS
sync loss (`DATA.GET_MISALIGNED_AUDIO`, gap `DATA.AUDIO_MISALIGNED_GAP`).
"""

import numpy as np

from pmv_tpu.data import audio as audio_lib
from pmv_tpu.data.build import DATASET_REGISTRY
from pmv_tpu.data.kinetics import Kinetics
from pmv_tpu.utils import logging as pmv_logging

logger = pmv_logging.get_logger(__name__)


@DATASET_REGISTRY.register(name="Kinetics_av")
class KineticsAV(Kinetics):
    def __getitem__(self, index):
        sample = super().__getitem__(index)
        cfg = self.cfg
        from pmv_tpu.native import binding

        path = self._path_to_videos[sample["index"]]
        t_frames = cfg.DATA.NUM_FRAMES * cfg.DATA.SAMPLING_RATE
        try:
            with binding.VideoReader(path) as reader:
                fps = reader.fps if reader.fps > 0 else cfg.DATA.TARGET_FPS
                duration = t_frames / fps
                start_sec = sample["time"] * max(
                    reader.duration - duration, 0.0
                )
                wav = reader.read_audio(
                    start_sec, duration, cfg.DATA.AUDIO_SAMPLE_RATE
                )
                if cfg.DATA.GET_MISALIGNED_AUDIO:
                    gap_sec = (
                        cfg.DATA.AUDIO_MISALIGNED_GAP
                        * cfg.DATA.AUDIO_STEP_SZ / 1000.0
                    )
                    mis_start = start_sec + duration + gap_sec
                    if mis_start + duration > reader.duration:
                        mis_start = max(start_sec - duration - gap_sec, 0.0)
                    wav_mis = reader.read_audio(
                        mis_start, duration, cfg.DATA.AUDIO_SAMPLE_RATE
                    )
                else:
                    wav_mis = None
        except Exception as e:
            logger.warning("audio decode failed for %s: %s", path, e)
            wav, wav_mis = np.zeros((0,), np.float32), None

        def logmel(w):
            return audio_lib.gen_logmel(
                w,
                sr=cfg.DATA.AUDIO_SAMPLE_RATE,
                win_sz_ms=cfg.DATA.AUDIO_WIN_SZ,
                step_sz_ms=cfg.DATA.AUDIO_STEP_SZ,
                n_mels=cfg.DATA.AUDIO_MEL_NUM,
                num_frames=cfg.DATA.AUDIO_FRAME_NUM,
            )

        sample["audio"] = logmel(wav)
        if wav_mis is not None:
            sample["audio_mis"] = logmel(wav_mis)
        return sample
