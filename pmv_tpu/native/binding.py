"""ctypes binding for the native FFmpeg decode library.

Replaces the reference's PyAV/decord bindings
(`MViT/slowfast/datasets/video_container.py`). The library is built on first
use (`make` in this directory) and cached; decode calls release the GIL so a
thread pool gives true decode parallelism (the reference used worker
*processes* because of Python-side decoding; here the hot path is pure C++).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libpmv_decoder.so")
_BUILD_LOCK = threading.Lock()
_LIB = None


class NativeDecoderUnavailable(RuntimeError):
    pass


def _build():
    try:
        subprocess.run(
            ["make", "-C", _HERE, "libpmv_decoder.so"],
            check=True, capture_output=True, text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        raise NativeDecoderUnavailable(
            f"failed to build native decoder: {msg}"
        ) from e


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    with _BUILD_LOCK:
        if _LIB is not None:
            return _LIB
        # Rebuild when the source is newer than a prebuilt .so — new
        # symbols (e.g. pmv_resize_bilinear) get argtypes set
        # unconditionally below, so a stale library would raise
        # AttributeError and break every native entry point.
        _src = os.path.join(_HERE, "video_decoder.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_src)
            and os.path.getmtime(_src) > os.path.getmtime(_LIB_PATH)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pmv_open.restype = ctypes.c_void_p
        lib.pmv_open.argtypes = [ctypes.c_char_p]
        lib.pmv_info.restype = ctypes.c_int
        lib.pmv_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.pmv_decode_frames.restype = ctypes.c_int
        lib.pmv_decode_frames.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pmv_close.restype = None
        lib.pmv_close.argtypes = [ctypes.c_void_p]
        lib.pmv_write_test_video.restype = ctypes.c_int
        lib.pmv_write_test_video.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pmv_decode_audio.restype = ctypes.c_longlong
        lib.pmv_decode_audio.argtypes = [
            ctypes.c_void_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        lib.pmv_write_test_video_av.restype = ctypes.c_int
        lib.pmv_write_test_video_av.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_int,
        ]
        lib.pmv_write_video_h264.restype = ctypes.c_int
        lib.pmv_write_video_h264.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.pmv_resize_bilinear.restype = None
        lib.pmv_resize_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def resize_bilinear(frame, dh, dw):
    """Exact torch-protocol bilinear resize of one [H, W, 3] uint8 frame via
    the native kernel (resize_bilinear_exact_u8; AVX2 horizontal pass)."""
    import numpy as np

    lib = get_lib()
    frame = np.ascontiguousarray(frame, dtype=np.uint8)
    sh, sw = frame.shape[:2]
    out = np.empty((dh, dw, 3), np.uint8)
    lib.pmv_resize_bilinear(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        sw,
        sh,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        dw,
        dh,
    )
    return out


class VideoReader:
    """One open container. Not thread-safe; use one per decode thread."""

    def __init__(self, path):
        lib = get_lib()
        self._lib = lib
        self._handle = lib.pmv_open(str(path).encode())
        if not self._handle:
            raise IOError(f"failed to open video: {path}")
        fps = ctypes.c_double()
        nb = ctypes.c_longlong()
        w = ctypes.c_int()
        h = ctypes.c_int()
        dur = ctypes.c_double()
        lib.pmv_info(
            self._handle, ctypes.byref(fps), ctypes.byref(nb),
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(dur),
        )
        self.fps = fps.value
        self.num_frames = int(nb.value)
        self.width = w.value
        self.height = h.value
        self.duration = dur.value

    def read_frames(self, indices, out_w=None, out_h=None):
        """Decode frames at `indices` -> uint8 [N, out_h, out_w, 3].

        Default output geometry is the native frame size.
        """
        out_w = out_w or self.width
        out_h = out_h or self.height
        indices = np.ascontiguousarray(np.sort(np.asarray(indices, np.int64)))
        n = len(indices)
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        got = self._lib.pmv_decode_frames(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out_w,
            out_h,
        )
        if got <= 0:
            raise IOError(f"decode failed (code {got})")
        return out

    def read_audio(self, start_sec, dur_sec, sample_rate=16000):
        """Decode mono float32 audio at sample_rate over the window.

        Returns [N] float32 (empty array when the file has no audio).
        """
        max_samples = int(dur_sec * sample_rate) + sample_rate
        out = np.zeros((max_samples,), np.float32)
        got = self._lib.pmv_decode_audio(
            self._handle, float(start_sec), float(dur_sec), int(sample_rate),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples,
        )
        if got < 0:
            raise IOError(f"audio decode failed (code {got})")
        return out[:got]

    def close(self):
        if self._handle:
            self._lib.pmv_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_test_video(path, frames, fps=30, audio=None, audio_sr=16000):
    """Write uint8 [T, H, W, 3] RGB frames as an uncompressed AVI (tests),
    optionally with a float32 mono PCM audio track."""
    lib = get_lib()
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    if audio is None:
        rc = lib.pmv_write_test_video(
            str(path).encode(),
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            t, w, h, fps,
        )
    else:
        audio = np.ascontiguousarray(audio, np.float32)
        rc = lib.pmv_write_test_video_av(
            str(path).encode(),
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            t, w, h, fps,
            audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(audio), audio_sr,
        )
    if rc != 0:
        raise IOError(f"write_test_video failed (code {rc})")


def write_video_h264(path, frames, fps=30, gop=30, crf=23):
    """Write uint8 [T, H, W, 3] RGB frames as an H.264 yuv420p MP4.

    Realistic inter-coded streams (GOP structure, B-frames): decoding costs
    real codec work and PTS-selective seek must honor keyframes — use for
    decode-throughput corpora and seek tests (the PMV-400 corpus is H.264
    mp4, `DATA.md:6`)."""
    lib = get_lib()
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    rc = lib.pmv_write_video_h264(
        str(path).encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        t, w, h, fps, gop, crf,
    )
    if rc != 0:
        raise IOError(f"write_video_h264 failed (code {rc})")
