"""ctypes bindings + lazy build of the native batch WAV decoder.

The decoder (native/wav_decoder.cpp) is a thread-pooled RIFF parser with a
plain C ABI; it is compiled on first use with g++ and cached next to the
source. Everything degrades gracefully to the pure-Python reader
(audiobd_tpu.data.wavio) when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libwavdec.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "wav_decoder.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", _SO_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:
        print(f"[audiobd_tpu.native] build failed, falling back to Python decoder: {e}")
        return False


def get_lib():
    """The loaded shared library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH):
            if not os.path.exists(_SRC_PATH) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.wavdec_batch.restype = ctypes.c_int
            lib.wavdec_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            assert lib.wavdec_version() >= 2
            lib.wavdec_batch_i16.restype = ctypes.c_int
            lib.wavdec_batch_i16.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            _lib = lib
        except Exception as e:
            print(f"[audiobd_tpu.native] load failed: {e}")
            _lib = None
        return _lib


def decode_batch(
    paths: list[str], max_len: int, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a list of wav files → (waves (N, max_len) f32 zero-padded,
    lengths (N,), sample_rates (N,)). Uses the native decoder when built,
    else the Python fallback."""
    n = len(paths)
    lib = get_lib()
    if lib is not None:
        out = np.zeros((n, max_len), np.float32)
        lengths = np.zeros(n, np.int32)
        rates = np.zeros(n, np.int32)
        status = np.zeros(n, np.int32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.wavdec_batch(
            arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_len,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_threads,
        )
        bad = np.flatnonzero(status)
        if bad.size:
            raise IOError(f"{bad.size} wav files failed to decode, first: {paths[bad[0]]}")
        return out, lengths, rates

    from audiobd_tpu.data.wavio import read_wav

    out = np.zeros((n, max_len), np.float32)
    lengths = np.zeros(n, np.int32)
    rates = np.zeros(n, np.int32)
    for i, path in enumerate(paths):
        wav, sr = read_wav(path)
        clip = wav[0, :max_len]
        out[i, : len(clip)] = clip
        lengths[i] = wav.shape[1]
        rates[i] = sr
    return out, lengths, rates


def decode_batch_pcm16(
    paths: list[str], max_len: int, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Raw int16 PCM batch decode → (pcm (N, max_len) int16 zero-padded,
    lengths (N,), sample_rates (N,), ok (N,) bool).

    ``ok[i]`` is False for files the int16 path cannot serve (non-PCM16
    formats — per-file status 7 — or no native library at all); callers
    fall back to :func:`decode_batch` / the Python reader for those rows.
    Raw PCM halves the host→accelerator link bytes vs f32; the device prep
    programs dequantize exactly (poison/device_prep.py::dequantize_pcm).
    """
    n = len(paths)
    lib = get_lib()
    if lib is None:
        return (np.zeros((n, max_len), np.int16), np.zeros(n, np.int32),
                np.zeros(n, np.int32), np.zeros(n, bool))
    out = np.zeros((n, max_len), np.int16)
    lengths = np.zeros(n, np.int32)
    rates = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.wavdec_batch_i16(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), max_len,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    hard = np.flatnonzero((status != 0) & (status != 7))
    if hard.size:
        raise IOError(f"{hard.size} wav files failed to decode, first: {paths[hard[0]]}")
    return out, lengths, rates, status == 0
