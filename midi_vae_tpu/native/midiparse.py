"""ctypes bindings for the C++ SMF parser (``midiparse.cc``).

Exposes :func:`parse_midi_native`, returning the same
:class:`~midi_vae_tpu.midi.smf.NoteArrays` contract as the pure-Python
oracle ``midi/smf.py`` — callers should go through
:func:`midi_vae_tpu.midi.parse.parse_midi`, which picks the native path
when available.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from midi_vae_tpu.native._build import load_library


def _lib() -> Optional[ctypes.CDLL]:
    lib = load_library("midiparse")
    if lib is not None and not getattr(lib, "_configured", False):
        lib.midi_open.restype = ctypes.c_void_p
        lib.midi_open.argtypes = [ctypes.c_char_p]
        lib.midi_n_notes.restype = ctypes.c_long
        lib.midi_n_notes.argtypes = [ctypes.c_void_p]
        lib.midi_get_notes.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.midi_close.argtypes = [ctypes.c_void_p]
        lib._configured = True
    return lib


def native_midiparse_available() -> bool:
    return _lib() is not None


def parse_midi_native(path: str):
    """Parse an SMF file with the C++ parser; raises on unreadable files."""
    from midi_vae_tpu.midi.smf import NoteArrays

    lib = _lib()
    if lib is None:
        raise RuntimeError("native midiparse unavailable (no compiler?)")
    handle = lib.midi_open(path.encode())
    if not handle:
        raise ValueError(f"cannot parse MIDI file: {path}")
    try:
        n = lib.midi_n_notes(handle)
        onset = np.empty(n, np.float64)
        duration = np.empty(n, np.float64)
        pitch = np.empty(n, np.int32)
        velocity = np.empty(n, np.int32)
        if n:
            lib.midi_get_notes(
                handle,
                onset.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                duration.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                pitch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                velocity.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        return NoteArrays(onset=onset, duration=duration, pitch=pitch, velocity=velocity)
    finally:
        lib.midi_close(handle)
