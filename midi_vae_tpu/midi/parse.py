"""Unified MIDI parsing entry point: native C++ when available, Python
fallback otherwise.

Both implementations produce the same :class:`~midi_vae_tpu.midi.smf.NoteArrays`
(cross-checked in ``tests/test_midi.py``); the native parser exists
because bulk-parsing a corpus of .mid files is host-bound byte work
(design note in ``native/midiparse.cc``).
"""

from __future__ import annotations

from midi_vae_tpu.midi.smf import NoteArrays, read_smf
from midi_vae_tpu.native.midiparse import native_midiparse_available, parse_midi_native


def parse_midi(path: str, *, prefer_native: bool = True) -> NoteArrays:
    """Parse a Standard MIDI File into flat note-event arrays."""
    if prefer_native and native_midiparse_available():
        return parse_midi_native(path)
    return read_smf(path)
