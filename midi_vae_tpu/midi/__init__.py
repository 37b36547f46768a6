"""MIDI subsystem: SMF parsing, piano-roll rasterization, augmentation.

Capability extension over the reference (SURVEY appendix: "no MIDI
parsing exists in the repo — MIDI enters pre-rasterized as PNG
piano-rolls"; BASELINE.json north star asks for "MIDI parsing,
piano-roll rasterization, crop/shift/velocity augmentation" as
on-device transforms). Layout:

- :mod:`smf` — Standard MIDI File reader/writer in pure Python (the
  portable fallback and the test oracle for the native parser).
- :mod:`~midi_vae_tpu.native.midiparse` (``native/midiparse.cc``) — the
  C++ parser used in production paths; same note-event contract.
- :mod:`rasterize` — jit-compiled note-events → piano-roll rasterizer
  and stochastic augmentations (time-crop / pitch-shift / velocity
  scale), all on device.
- :mod:`factory` — synthetic .mid dataset generator (the MIDI analog of
  the reference's data_generators.py PNG factory).
- :mod:`stats` — corpus-level musical statistics (density / pitch-class /
  polyphony / duration histograms) + Jensen-Shannon comparison; backs the
  generation-quality dossier and the export-threshold calibrator.
- :mod:`calibrate` — per-checkpoint export-threshold calibration against
  the model's own reconstructions (``generate --export-threshold auto``).
"""

from midi_vae_tpu.midi.smf import NoteArrays, read_smf, write_smf  # noqa: F401
