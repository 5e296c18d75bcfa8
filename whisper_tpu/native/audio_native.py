"""ctypes binding for the native C++ audio decoder (libwhisper_tpu_audio.so).

The C++ library (audio_decode.cc) uses libavformat/libavcodec — covering the
same codec set as the reference's symphonia stack (wav/flac/mp3/aac/vorbis,
ref Cargo.toml:19, src/main.rs:228-316) — and performs channel-mean downmix
in C++. Build with `make -C whisper_tpu/native`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libwhisper_tpu_audio.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _lib_path() -> str:
    # WHISPER_TPU_AUDIO_LIB overrides the default so `make check` can point
    # the test suite at the ASan/UBSan-instrumented build.
    override = os.environ.get("WHISPER_TPU_AUDIO_LIB")
    if override:
        return override
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), _LIB_NAME)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    path = _lib_path()
    if not os.path.isfile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    # int wt_decode_mono(const char* path, float** out, long* n, int* sr)
    lib.wt_decode_mono.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.wt_decode_mono.restype = ctypes.c_int
    lib.wt_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.wt_free.restype = None
    lib.wt_last_error.argtypes = []
    lib.wt_last_error.restype = ctypes.c_char_p
    # Older builds of the library lack the resampler entry points; the
    # wrappers below gate on hasattr so a stale .so only loses the native
    # resample path, not decoding.
    if hasattr(lib, "wt_resample_linear"):
        lib.wt_resample_len.argtypes = [ctypes.c_long, ctypes.c_int,
                                        ctypes.c_int]
        lib.wt_resample_len.restype = ctypes.c_long
        lib.wt_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.wt_resample_linear.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_mono(path: str) -> Tuple[np.ndarray, int]:
    """Decode any supported container/codec to mono float32 + sample rate."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library not built")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_long(0)
    sr = ctypes.c_int(0)
    rc = lib.wt_decode_mono(path.encode(), ctypes.byref(out),
                            ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        err = lib.wt_last_error()
        raise RuntimeError(
            f"native decode failed ({rc}): {err.decode() if err else path}"
        )
    try:
        data = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.wt_free(out)
    return data, sr.value


def resample_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "wt_resample_linear")


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Reference-exact linear resample in C++ (bit-equal to
    audio.resample.resample_linear — tests/test_native_audio.py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "wt_resample_linear"):
        raise RuntimeError("native resampler not available")
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_out = lib.wt_resample_len(len(x), sr_in, sr_out)
    out = np.empty(n_out, dtype=np.float32)
    lib.wt_resample_linear(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        sr_in, sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    return out
