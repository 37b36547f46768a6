"""MIDI subsystem tests: SMF round-trip, native↔Python parser parity,
rasterization, augmentation, and dataset integration."""

import numpy as np
import pytest

from midi_vae_tpu.midi.factory import generate_midi_dataset, random_notes
from midi_vae_tpu.midi.parse import parse_midi
from midi_vae_tpu.midi.smf import NoteArrays, read_smf, write_smf
from midi_vae_tpu.native.midiparse import native_midiparse_available, parse_midi_native


def _random_notes(seed=0, n=64):
    return random_notes(np.random.default_rng(seed), n)


# ----------------------------------------------------------------- SMF layer


class TestSMF:
    def test_write_read_roundtrip(self, tmp_path):
        notes = _random_notes()
        p = str(tmp_path / "a.mid")
        write_smf(notes, p)
        back = read_smf(p)
        assert len(back) == len(notes)
        # quantization at ppq=480/120bpm is ~1 ms
        assert np.abs(back.onset - notes.onset).max() < 2e-3
        assert np.array_equal(np.sort(back.pitch), np.sort(notes.pitch))
        assert set(back.velocity) <= set(notes.velocity.tolist())
        # SMF cannot represent the pairing of overlapping same-pitch
        # notes (FIFO convention reassigns durations); the per-pitch
        # multisets of on-times and off-times ARE preserved.
        for pitch in np.unique(notes.pitch):
            src, got = notes.pitch == pitch, back.pitch == pitch
            np.testing.assert_allclose(np.sort(back.onset[got]), np.sort(notes.onset[src]), atol=2e-3)
            np.testing.assert_allclose(
                np.sort((back.onset + back.duration)[got]),
                np.sort((notes.onset + notes.duration)[src]),
                atol=2e-3,
            )

    def test_empty_file(self, tmp_path):
        empty = NoteArrays(
            onset=np.zeros(0), duration=np.zeros(0), pitch=np.zeros(0, np.int32), velocity=np.zeros(0, np.int32)
        )
        p = str(tmp_path / "empty.mid")
        write_smf(empty, p)
        assert len(read_smf(p)) == 0
        assert empty.total_seconds == 0.0

    def test_tempo_scales_time(self, tmp_path):
        notes = _random_notes(n=16)
        fast, slow = str(tmp_path / "fast.mid"), str(tmp_path / "slow.mid")
        write_smf(notes, fast, tempo_us=250000)
        write_smf(notes, slow, tempo_us=500000)
        a, b = read_smf(fast), read_smf(slow)
        # same tick content at half the tempo period → same seconds, both
        # files store the notes at their true wall-clock positions
        assert np.abs(a.onset - b.onset).max() < 4e-3

    def test_tempo_map_roundtrip(self, tmp_path):
        """A file written with tempo changes parses back to the same
        seconds (the writer quantizes ticks piecewise on the same grid
        the reader integrates over)."""
        notes = _random_notes(n=48)  # onsets spread over ~ tens of seconds
        p = str(tmp_path / "tempo_map.mid")
        write_smf(notes, p, tempo_map=[(0.0, 500000), (2.0, 250000), (5.0, 1000000)])
        back = read_smf(p)
        assert len(back) == len(notes)
        np.testing.assert_allclose(np.sort(back.onset), np.sort(notes.onset), atol=3e-3)
        ends_src = np.sort(notes.onset + notes.duration)
        ends_back = np.sort(back.onset + back.duration)
        np.testing.assert_allclose(ends_back, ends_src, atol=3e-3)

    def test_multitrack_format1_roundtrip(self, tmp_path):
        """Format-1 output: conductor track + one track per assignment;
        readers (python oracle AND native parser) merge them back."""
        notes = _random_notes(n=32)
        tracks = np.arange(32) % 3
        p = str(tmp_path / "multi.mid")
        write_smf(notes, p, tracks=tracks, tempo_map=[(0.0, 500000), (1.5, 300000)])
        with open(p, "rb") as f:
            header = f.read(14)
        assert header[8:10] == b"\x00\x01"  # format 1
        assert header[10:12] == b"\x00\x04"  # conductor + 3 note tracks
        back = read_smf(p)
        assert len(back) == len(notes)
        np.testing.assert_allclose(np.sort(back.onset), np.sort(notes.onset), atol=3e-3)
        np.testing.assert_array_equal(np.sort(back.pitch), np.sort(notes.pitch))
        if native_midiparse_available():
            native = parse_midi_native(p)
            np.testing.assert_allclose(np.sort(native.onset), np.sort(back.onset), atol=1e-9)

    def test_tracks_length_mismatch_raises(self, tmp_path):
        notes = _random_notes(n=8)
        with pytest.raises(ValueError, match="tracks has"):
            write_smf(notes, str(tmp_path / "x.mid"), tracks=np.zeros(5, np.int32))

    def test_overlapping_same_pitch_fifo(self, tmp_path):
        # two overlapping notes on one pitch: offs pair with the earlier on
        notes = NoteArrays(
            onset=np.array([0.0, 0.5]),
            duration=np.array([1.0, 1.5]),
            pitch=np.array([60, 60], np.int32),
            velocity=np.array([80, 90], np.int32),
        )
        p = str(tmp_path / "o.mid")
        write_smf(notes, p)
        back = read_smf(p)
        assert len(back) == 2
        np.testing.assert_allclose(back.onset, [0.0, 0.5], atol=2e-3)
        np.testing.assert_allclose(back.duration, [1.0, 1.5], atol=4e-3)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.mid")
        with open(p, "wb") as f:
            f.write(b"definitely not midi")
        with pytest.raises(ValueError):
            read_smf(p)


# ------------------------------------------------------------- native parser


@pytest.mark.skipif(not native_midiparse_available(), reason="no native toolchain")
class TestNativeParser:
    def test_matches_python_oracle(self, tmp_path):
        for seed in range(5):
            notes = _random_notes(seed=seed, n=100)
            p = str(tmp_path / f"{seed}.mid")
            write_smf(notes, p)
            py, nat = read_smf(p), parse_midi_native(p)
            assert len(py) == len(nat)
            np.testing.assert_allclose(nat.onset, py.onset, atol=1e-9)
            np.testing.assert_allclose(nat.duration, py.duration, atol=1e-9)
            np.testing.assert_array_equal(nat.pitch, py.pitch)
            np.testing.assert_array_equal(nat.velocity, py.velocity)

    def test_rejects_garbage(self, tmp_path):
        p = str(tmp_path / "bad.mid")
        with open(p, "wb") as f:
            f.write(b"definitely not midi either")
        with pytest.raises(ValueError):
            parse_midi_native(p)

    def test_dispatcher_prefers_native(self, tmp_path):
        notes = _random_notes(n=10)
        p = str(tmp_path / "d.mid")
        write_smf(notes, p)
        assert len(parse_midi(p)) == 10


# ------------------------------------------------------------- rasterization


class TestRasterize:
    def test_host_windows_basic(self):
        from midi_vae_tpu.midi.rasterize import notes_to_windows

        notes = NoteArrays(
            onset=np.array([0.0, 1.0]),
            duration=np.array([0.5, 0.25]),
            pitch=np.array([60, 64], np.int32),
            velocity=np.array([127, 64], np.int32),
        )
        w = notes_to_windows(notes, steps=64, seconds_per_step=0.05)
        assert w.shape == (1, 128, 64, 1)
        # note 1: cols 0..10 at pitch 60, velocity 255
        assert (w[0, 60, 0:10, 0] == 255).all()
        assert w[0, 60, 10:, 0].sum() == 0
        # note 2: onset 1.0s → col 20, dur 0.25 → 5 cols, vel 64/127*255
        expected_v = int(np.clip(64 / 127 * 255, 0, 255))
        assert (w[0, 64, 20:25, 0] == expected_v).all()
        # silence elsewhere
        assert w.sum() == 10 * 255 + 5 * expected_v

    def test_host_windows_drop_empty(self):
        from midi_vae_tpu.midi.rasterize import notes_to_windows

        # one note at t=0 and one at t=20s: the windows between are silent
        notes = NoteArrays(
            onset=np.array([0.0, 20.0]),
            duration=np.array([0.5, 0.5]),
            pitch=np.array([60, 61], np.int32),
            velocity=np.array([100, 100], np.int32),
        )
        w = notes_to_windows(notes, steps=64, seconds_per_step=0.05)
        assert len(w) == 2  # silent middle windows dropped

    def test_jit_matches_host(self):
        import jax.numpy as jnp

        from midi_vae_tpu.midi.rasterize import notes_to_windows, rasterize_notes

        notes = _random_notes(seed=3, n=24)
        spc = 0.0625  # 8s / 128 steps: every note lands in window 0
        host = notes_to_windows(notes, steps=128, seconds_per_step=spc, min_notes_per_window=0)

        dev = rasterize_notes(
            jnp.asarray(notes.onset / spc, jnp.float32),
            jnp.asarray(notes.duration / spc, jnp.float32),
            jnp.asarray(notes.pitch),
            jnp.asarray(notes.velocity / 127.0, jnp.float32),
            jnp.ones(len(notes), bool),
            steps=128,
        )
        got = np.asarray(jnp.round(dev * 255).astype(jnp.uint8))
        expect = host[0, :, :, 0] if len(host) else np.zeros_like(got)
        # row-occupancy must agree; velocity may differ ±1 from rounding
        np.testing.assert_array_equal(got > 0, expect > 0)
        assert np.abs(got.astype(int) - expect.astype(int)).max() <= 1

    def test_jit_padding_mask(self):
        import jax.numpy as jnp

        from midi_vae_tpu.midi.rasterize import rasterize_notes

        onset = jnp.array([0.0, 5.0], jnp.float32)
        dur = jnp.array([4.0, 4.0], jnp.float32)
        pitch = jnp.array([10, 20], jnp.int32)
        vel = jnp.array([1.0, 1.0], jnp.float32)
        roll = rasterize_notes(onset, dur, pitch, vel, jnp.array([True, False]), steps=16)
        assert roll[10].sum() == 4  # valid note painted
        assert roll[20].sum() == 0  # padded note suppressed

    def test_batch_shape(self):
        import jax
        import jax.numpy as jnp

        from midi_vae_tpu.midi.rasterize import rasterize_batch

        B, N = 4, 8
        key = jax.random.PRNGKey(0)
        out = rasterize_batch(
            jax.random.uniform(key, (B, N)) * 100,
            jnp.ones((B, N)) * 4,
            jax.random.randint(key, (B, N), 0, 128),
            jnp.ones((B, N)) * 0.5,
            jnp.ones((B, N), bool),
            steps=128,
        )
        assert out.shape == (B, 128, 128, 1)


# -------------------------------------------------------------- augmentation


class TestAugment:
    def _roll(self):
        import jax.numpy as jnp

        roll = jnp.zeros((128, 128, 1))
        return roll.at[60, 10:20, 0].set(0.8)

    def test_deterministic_per_key(self):
        import jax

        from midi_vae_tpu.midi.rasterize import augment_pianoroll

        r = self._roll()
        a = augment_pianoroll(jax.random.PRNGKey(1), r)
        b = augment_pianoroll(jax.random.PRNGKey(1), r)
        c = augment_pianoroll(jax.random.PRNGKey(2), r)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_mass_preserved_up_to_scale(self):
        import jax

        from midi_vae_tpu.midi.rasterize import augment_pianoroll

        r = self._roll()
        # shifts are small; the note sits mid-roll so nothing falls off
        out = augment_pianoroll(jax.random.PRNGKey(0), r, max_pitch_shift=4, max_time_shift=8)
        occupied = np.asarray(out > 0).sum()
        assert occupied == 10  # same cells, shifted
        vals = np.asarray(out)[np.asarray(out) > 0]
        assert 0.8 * 0.7 - 1e-5 <= vals[0] <= min(0.8 * 1.2, 1.0) + 1e-5

    def test_edge_rows_zeroed_not_wrapped(self):
        import jax
        import jax.numpy as jnp

        from midi_vae_tpu.midi.rasterize import augment_pianoroll

        roll = jnp.zeros((128, 128, 1)).at[127, :, 0].set(1.0)  # top pitch row
        # forcing large shifts: with max shift = 1 in each sign, try keys
        # until one shifts up (dp=+1) — wrapped row must not appear at 0
        for k in range(20):
            out = np.asarray(augment_pianoroll(jax.random.PRNGKey(k), roll, max_pitch_shift=1, max_time_shift=0))
            assert out[0].sum() == 0.0  # never wraps around

    def test_batch_variant(self):
        import jax
        import jax.numpy as jnp

        from midi_vae_tpu.midi.rasterize import augment_pianoroll_batch

        rolls = jnp.stack([self._roll()] * 3)
        out = augment_pianoroll_batch(jax.random.PRNGKey(0), rolls)
        assert out.shape == rolls.shape
        # per-sample keys → samples differ
        assert not np.array_equal(np.asarray(out[0]), np.asarray(out[1]))


# ------------------------------------------------------------------ datasets


class TestMidiDatasets:
    def test_factory_writes_class_tree(self, tmp_path):
        n = generate_midi_dataset(12, str(tmp_path / "corpus"), seed=0)
        assert n == 12
        classes = sorted((tmp_path / "corpus").iterdir())
        assert all(d.name.endswith("_density") for d in classes)
        files = [f for d in classes for f in d.iterdir()]
        assert len(files) == 12

    def test_load_midi_folder_and_cache(self, tmp_path):
        from midi_vae_tpu.data.sources import load_midi_folder

        corpus = str(tmp_path / "corpus")
        generate_midi_dataset(8, corpus, seed=1)
        ds = load_midi_folder(corpus)
        assert ds.images.dtype == np.uint8
        assert ds.images.shape[1:] == (128, 128, 1)
        assert len(ds.images) == len(ds.labels) > 0
        assert ds.images.max() > 0
        # second load hits the RRD cache and matches
        ds2 = load_midi_folder(corpus)
        np.testing.assert_array_equal(np.asarray(ds2.images), np.asarray(ds.images))
        np.testing.assert_array_equal(ds2.labels, ds.labels)

    def test_cache_hit_class_names_match_build(self, tmp_path):
        """A non-MIDI subdir next to flat .mid files must not change the
        reported class names between the build pass and the cache hit
        (labels are baked flat into the cache)."""
        from midi_vae_tpu.data.sources import load_midi_folder
        from midi_vae_tpu.midi.factory import random_notes
        from midi_vae_tpu.midi.smf import write_smf

        root = tmp_path / "flat"
        root.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            write_smf(random_notes(rng, 32), str(root / f"f{i}.mid"))
        (root / "unrelated_dir").mkdir()  # no .mid inside
        first = load_midi_folder(str(root))
        second = load_midi_folder(str(root))  # cache hit
        assert first.class_names == second.class_names == ["midi"]
        np.testing.assert_array_equal(first.labels, second.labels)

    def test_corrupt_file_skipped_not_fatal(self, tmp_path, capsys):
        """One unparseable .mid in a corpus is skipped with a warning; an
        all-corrupt corpus is a clear error (data/sources.py ingest loop)."""
        from midi_vae_tpu.data.sources import load_midi_folder

        corpus = str(tmp_path / "corpus")
        generate_midi_dataset(4, corpus, seed=2)
        bad_dir = next(d for d in sorted((tmp_path / "corpus").iterdir()) if d.is_dir())
        (bad_dir / "zz_corrupt.mid").write_bytes(b"MThd\x00\x00\x00\x06garbage-not-midi")
        ds = load_midi_folder(corpus, use_cache=False)
        assert len(ds.images) > 0
        out = capsys.readouterr().out
        assert "skipped 1/5" in out

        all_bad = tmp_path / "allbad"
        all_bad.mkdir()
        (all_bad / "a.mid").write_bytes(b"\x00" * 32)
        with pytest.raises(ValueError, match="none of the 1"):
            load_midi_folder(str(all_bad), use_cache=False)

    def test_fetch_midi_synthetic_end_to_end(self):
        from midi_vae_tpu.data.fetch import fetch_dataset
        from midi_vae_tpu.data.transforms import get_transform

        tr, ev = get_transform("pianoroll", 128, {"normalization": "midi-synthetic"})
        train, val, test, distinct = fetch_dataset("midi-synthetic", transform_train=tr, transform_eval=ev)
        assert len(train) > len(test) > 0
        assert not distinct

    def test_device_loader_on_midi(self):
        import jax

        from midi_vae_tpu.data.fetch import fetch_dataset
        from midi_vae_tpu.data.pipeline import DeviceLoader
        from midi_vae_tpu.data.transforms import get_transform

        tr, ev = get_transform("pianoroll", 128, {"normalization": "midi-synthetic"})
        train, *_ = fetch_dataset("midi-synthetic", transform_train=tr, transform_eval=ev)
        loader = DeviceLoader(train, 16, train=True, seed=0)
        batch = next(iter(loader.epoch(1)))
        assert batch.x.shape == (16, 128, 128, 1)
        x = np.asarray(batch.x)
        assert np.isfinite(x).all()
        assert -0.5 - 1e-6 <= x.min() and x.max() <= 0.5 + 1e-6  # normalized [−.5,.5]
        jax.block_until_ready(batch.x)


class TestTempoMap:
    """Multi-tempo SMF files: the piecewise tick→seconds conversion must
    agree between the Python oracle and the C++ parser."""

    @staticmethod
    def _write_multi_tempo(path, ppq=480):
        """Hand-craft a format-0 file: tempo 120bpm, a note, tempo change to
        60bpm mid-file, another note."""
        import struct

        from midi_vae_tpu.midi.smf import _write_varlen

        body = bytearray()
        body += _write_varlen(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")  # 120 bpm
        body += _write_varlen(0) + bytes([0x90, 60, 100])          # note on at tick 0
        body += _write_varlen(ppq) + bytes([0x80, 60, 0])          # off after 1 beat (0.5 s)
        body += _write_varlen(0) + bytes([0xFF, 0x51, 0x03]) + (1000000).to_bytes(3, "big")  # 60 bpm
        body += _write_varlen(ppq) + bytes([0x90, 72, 90])         # on 1 beat later (1.0 s at 60bpm)
        body += _write_varlen(2 * ppq) + bytes([0x80, 72, 0])      # off 2 beats later (2.0 s)
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        with open(path, "wb") as f:
            f.write(b"MThd" + struct.pack(">IHHH", 6, 0, 1, ppq))
            f.write(b"MTrk" + struct.pack(">I", len(body)) + bytes(body))

    def test_python_oracle_times(self, tmp_path):
        p = str(tmp_path / "t.mid")
        self._write_multi_tempo(p)
        notes = read_smf(p)
        assert len(notes) == 2
        # note 1: tick 0..480 at 120bpm → 0.0s..0.5s
        np.testing.assert_allclose(notes.onset[0], 0.0, atol=1e-9)
        np.testing.assert_allclose(notes.duration[0], 0.5, atol=1e-9)
        # note 2: starts 1 beat after the 60bpm switch at tick 480 →
        # 0.5s + 1.0s = 1.5s; lasts 2 beats at 60bpm = 2.0s
        np.testing.assert_allclose(notes.onset[1], 1.5, atol=1e-9)
        np.testing.assert_allclose(notes.duration[1], 2.0, atol=1e-9)

    @pytest.mark.skipif(not native_midiparse_available(), reason="no native toolchain")
    def test_native_matches_oracle(self, tmp_path):
        p = str(tmp_path / "t.mid")
        self._write_multi_tempo(p)
        py, nat = read_smf(p), parse_midi_native(p)
        np.testing.assert_allclose(nat.onset, py.onset, atol=1e-12)
        np.testing.assert_allclose(nat.duration, py.duration, atol=1e-12)

    def test_running_status(self, tmp_path):
        """Events reusing the previous status byte parse identically."""
        import struct

        from midi_vae_tpu.midi.smf import _write_varlen

        ppq = 480
        body = bytearray()
        body += _write_varlen(0) + bytes([0x90, 60, 100])  # explicit status
        body += _write_varlen(10) + bytes([64, 90])        # running: note-on 64
        body += _write_varlen(100) + bytes([60, 0])        # running: vel 0 = off
        body += _write_varlen(10) + bytes([64, 0])
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        p = str(tmp_path / "r.mid")
        with open(p, "wb") as f:
            f.write(b"MThd" + struct.pack(">IHHH", 6, 0, 1, ppq))
            f.write(b"MTrk" + struct.pack(">I", len(body)) + bytes(body))
        py = read_smf(p)
        assert len(py) == 2
        assert sorted(py.pitch.tolist()) == [60, 64]
        if native_midiparse_available():
            nat = parse_midi_native(p)
            np.testing.assert_allclose(nat.onset, py.onset)
            np.testing.assert_array_equal(nat.pitch, py.pitch)


@pytest.mark.skipif(not native_midiparse_available(), reason="no native toolchain")
class TestParserRobustness:
    """The C++ parser must reject malformed bytes cleanly (no crash, no
    hang) — bounds-checked cursor behavior under truncation/mutation."""

    def test_truncations(self, tmp_path):
        notes = _random_notes(n=30)
        full = tmp_path / "full.mid"
        write_smf(notes, str(full))
        data = full.read_bytes()
        for cut in range(0, len(data), max(1, len(data) // 40)):
            p = tmp_path / f"cut_{cut}.mid"
            p.write_bytes(data[:cut])
            try:
                parse_midi_native(str(p))
            except ValueError:
                pass  # clean rejection is the contract

    def test_random_mutations(self, tmp_path):
        rng = np.random.default_rng(0)
        notes = _random_notes(n=30)
        full = tmp_path / "full.mid"
        write_smf(notes, str(full))
        data = bytearray(full.read_bytes())
        for trial in range(60):
            mutated = bytearray(data)
            for _ in range(rng.integers(1, 6)):
                mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
            p = tmp_path / f"mut_{trial}.mid"
            p.write_bytes(bytes(mutated))
            try:
                out = parse_midi_native(str(p))
                assert len(out) >= 0  # parsed: result must be well-formed
            except ValueError:
                pass


class TestPythonParserRobustness:
    """The pure-Python oracle honors the same untrusted-input contract as
    the C++ parser: ANY malformed byte stream raises ValueError — never
    IndexError/struct.error/ZeroDivisionError, never an unbounded value."""

    def _write(self, tmp_path, body, ppq=480, ntrks=1):
        import struct

        p = tmp_path / "x.mid"
        p.write_bytes(
            b"MThd" + struct.pack(">IHHH", 6, 0, ntrks, ppq) + b"MTrk" + struct.pack(">I", len(body)) + bytes(body)
        )
        return str(p)

    def test_truncations_raise_value_error_only(self, tmp_path):
        notes = _random_notes(n=30)
        full = tmp_path / "full.mid"
        write_smf(notes, str(full))
        data = full.read_bytes()
        for cut in range(0, len(data)):
            p = tmp_path / "cut.mid"
            p.write_bytes(data[:cut])
            try:
                read_smf(str(p))
            except ValueError:
                pass  # clean rejection is the contract

    def test_random_mutations_raise_value_error_only(self, tmp_path):
        rng = np.random.default_rng(3)
        notes = _random_notes(n=30)
        full = tmp_path / "full.mid"
        write_smf(notes, str(full))
        data = bytearray(full.read_bytes())
        for trial in range(120):
            mutated = bytearray(data)
            for _ in range(rng.integers(1, 8)):
                mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
            p = tmp_path / "mut.mid"
            p.write_bytes(bytes(mutated))
            try:
                out = read_smf(str(p))
                assert len(out) >= 0
            except ValueError:
                pass

    def test_overlong_varlen_rejected(self, tmp_path):
        from midi_vae_tpu.midi.smf import _write_varlen

        body = bytes([0x81, 0x80, 0x80, 0x80, 0x00]) + bytes([0x90, 60, 100])  # 5-byte varlen
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        with pytest.raises(ValueError, match="exceeds 4 bytes"):
            read_smf(self._write(tmp_path, body))

    def test_high_bit_note_data_rejected(self, tmp_path):
        from midi_vae_tpu.midi.smf import _write_varlen

        body = _write_varlen(0) + bytes([0x90, 0x85, 100])  # pitch 133: desynced stream
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        with pytest.raises(ValueError, match="out of range"):
            read_smf(self._write(tmp_path, body))

    def test_bad_mthd_length_rejected(self, tmp_path):
        import struct

        p = tmp_path / "h.mid"
        p.write_bytes(b"MThd" + struct.pack(">IHHH", 2, 0, 0, 480) + b"\x00" * 8)
        with pytest.raises(ValueError, match="MThd"):
            read_smf(str(p))

    def test_smpte_zero_ticks_per_frame_rejected(self, tmp_path):
        import struct

        from midi_vae_tpu.midi.smf import _write_varlen

        division = ((256 - 25) << 8) | 0  # SMPTE, 0 ticks/frame: div-by-zero trap
        body = _write_varlen(0) + bytes([0x90, 60, 100])
        body += _write_varlen(10) + bytes([0x80, 60, 0])
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        p = tmp_path / "s.mid"
        p.write_bytes(b"MThd" + struct.pack(">IHHH", 6, 0, 1, division) + b"MTrk" + struct.pack(">I", len(body)) + bytes(body))
        with pytest.raises(ValueError, match="SMPTE"):
            read_smf(str(p))
        if native_midiparse_available():
            with pytest.raises(ValueError):
                parse_midi_native(str(p))


@pytest.mark.skipif(not native_midiparse_available(), reason="no native toolchain")
class TestParserParity:
    """Accept/reject AND value parity between the Python oracle and the
    C++ parser on adversarial inputs (a 5000-trial offline fuzz of this
    property found zero disagreements; these are the regression trials)."""

    @staticmethod
    def _both(path):
        try:
            py = read_smf(path)
        except ValueError:
            py = None
        try:
            nat = parse_midi_native(path)
        except ValueError:
            nat = None
        return py, nat

    def test_mutation_fuzz_agreement(self, tmp_path):
        rng = np.random.default_rng(17)
        full = tmp_path / "full.mid"
        write_smf(_random_notes(n=40), str(full), tempo_map=[(0.0, 500000), (5.0, 250000)])
        data = bytearray(full.read_bytes())
        p = tmp_path / "m.mid"
        for trial in range(150):
            mutated = bytearray(data)
            for _ in range(rng.integers(1, 8)):
                mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
            if trial % 5 == 0:
                mutated = mutated[: rng.integers(0, len(mutated))]
            p.write_bytes(bytes(mutated))
            py, nat = self._both(str(p))
            assert (py is None) == (nat is None), f"accept/reject disagreement at trial {trial}"
            if py is not None:
                np.testing.assert_allclose(nat.onset, py.onset, atol=1e-12)
                np.testing.assert_allclose(nat.duration, py.duration, atol=1e-12)
                np.testing.assert_array_equal(nat.pitch, py.pitch)
                np.testing.assert_array_equal(nat.velocity, py.velocity)

    def test_sysex_events_parse_identically(self, tmp_path):
        """Sysex length follows F0/F7 directly (a former Python off-by-one
        read it one byte late and desynced against the C++ parser)."""
        import struct

        from midi_vae_tpu.midi.smf import _write_varlen

        rng = np.random.default_rng(5)
        payload = bytes(rng.integers(0, 256, 13).astype(np.uint8))
        body = _write_varlen(0) + bytes([0x90, 60, 100])
        body += _write_varlen(10) + bytes([0xF0]) + _write_varlen(len(payload)) + payload
        body += _write_varlen(10) + bytes([0x80, 60, 0])
        body += _write_varlen(0) + bytes([0xF7]) + _write_varlen(3) + b"\x01\x02\x03"
        body += _write_varlen(5) + bytes([0x90, 64, 90])
        body += _write_varlen(5) + bytes([64, 0])  # running status after sysex
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        p = tmp_path / "sx.mid"
        p.write_bytes(b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480) + b"MTrk" + struct.pack(">I", len(body)) + bytes(body))
        py = read_smf(str(p))
        nat = parse_midi_native(str(p))
        assert len(py) == 2
        np.testing.assert_allclose(nat.onset, py.onset, atol=1e-12)
        np.testing.assert_array_equal(nat.pitch, py.pitch)


class TestRasterizeMemoryBounds:
    """notes_to_windows allocates only kept windows: a file whose ticks
    declare an enormous timeline must not demand a timeline-sized buffer."""

    def _huge_delta_file(self, tmp_path):
        import struct

        from midi_vae_tpu.midi.smf import _write_varlen

        # ppq=1: one max 4-byte varlen (0x0FFFFFFF ticks) sustains a note
        # for ~134M beats → ~2.7e9 columns at the default resolution. The
        # old dense rasterizer would try to allocate ~340 GB here.
        body = _write_varlen(0) + bytes([0x90, 60, 100])
        body += _write_varlen(0x0FFFFFFF) + bytes([0x80, 60, 0])
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        p = tmp_path / "huge.mid"
        p.write_bytes(b"MThd" + struct.pack(">IHHH", 6, 0, 1, 1) + b"MTrk" + struct.pack(">I", len(body)) + bytes(body))
        return str(p)

    def test_huge_timeline_stays_small(self, tmp_path):
        from midi_vae_tpu.midi.rasterize import notes_to_windows

        notes = read_smf(self._huge_delta_file(tmp_path))
        w = notes_to_windows(notes, steps=128)
        assert w.shape == (1, 128, 128, 1)  # one onset → one kept window
        assert (w[0, 60] > 0).all()  # the sustain fills the kept window

    def test_keep_all_windows_is_budget_capped(self, tmp_path):
        from midi_vae_tpu.midi.rasterize import notes_to_windows

        notes = read_smf(self._huge_delta_file(tmp_path))
        with pytest.raises(ValueError, match="2 GiB"):
            notes_to_windows(notes, steps=128, min_notes_per_window=0)

    def test_nonfinite_notes_rejected(self):
        from midi_vae_tpu.midi.rasterize import notes_to_windows

        bad = NoteArrays(
            onset=np.array([0.0, np.inf]),
            duration=np.array([1.0, 1.0]),
            pitch=np.array([60, 61], np.int32),
            velocity=np.array([100, 100], np.int32),
        )
        with pytest.raises(ValueError, match="finite"):
            notes_to_windows(bad)

    def test_sparse_matches_dense_reference(self):
        """The windowed painter is bitwise-equal to the old full-timeline
        implementation on ordinary corpora (all min_notes_per_window)."""
        from midi_vae_tpu.midi.rasterize import notes_to_windows

        def dense_reference(notes, pitches=128, steps=128, spc=0.05, min_notes=1):
            start = np.floor(notes.onset / spc).astype(np.int64)
            end = np.ceil((notes.onset + np.maximum(notes.duration, 1e-9)) / spc).astype(np.int64)
            end = np.maximum(end, start + 1)
            total = int(-(-int(end.max()) // steps) * steps)
            roll = np.zeros((pitches, total), np.uint8)
            vel = np.clip((notes.velocity.astype(np.float64) / 127.0) * 255.0, 0, 255).astype(np.uint8)
            for s, e, p, v in zip(start, end, np.clip(notes.pitch, 0, pitches - 1), vel):
                row = roll[p, s:e]
                np.maximum(row, v, out=row)
            wins = roll.reshape(pitches, total // steps, steps).transpose(1, 0, 2)[..., None]
            counts = np.bincount(start // steps, minlength=total // steps)
            return np.ascontiguousarray(wins[counts >= min_notes])

        for seed in range(4):
            rng = np.random.default_rng(seed)
            n = int(rng.integers(5, 120))
            notes = NoteArrays(
                onset=np.sort(rng.uniform(0, 60, n)),
                duration=rng.uniform(0.01, 8.0, n),  # long sustains cross windows
                pitch=rng.integers(0, 128, n).astype(np.int32),
                velocity=rng.integers(1, 128, n).astype(np.int32),
            )
            for min_notes in (0, 1, 2):
                got = notes_to_windows(notes, steps=64, min_notes_per_window=min_notes)
                want = dense_reference(notes, steps=64, min_notes=min_notes)
                np.testing.assert_array_equal(got, want, err_msg=f"seed={seed} min={min_notes}")


class TestSMPTEDivision:
    """SMPTE time division (negative division word): ticks are wall-clock
    frames·subframes rather than tempo-scaled beats."""

    def test_smpte_times(self, tmp_path):
        import struct

        from midi_vae_tpu.midi.smf import _write_varlen

        fps, tpf = 25, 40  # 1000 ticks/second
        division = ((256 - fps) << 8) | tpf
        body = bytearray()
        body += _write_varlen(0) + bytes([0x90, 60, 100])
        body += _write_varlen(500) + bytes([0x80, 60, 0])  # 500 ticks = 0.5 s
        body += _write_varlen(0) + bytes([0xFF, 0x2F, 0x00])
        p = str(tmp_path / "smpte.mid")
        with open(p, "wb") as f:
            f.write(b"MThd" + struct.pack(">IHHH", 6, 0, 1, division))
            f.write(b"MTrk" + struct.pack(">I", len(body)) + bytes(body))

        py = read_smf(p)
        assert len(py) == 1
        np.testing.assert_allclose(py.onset, [0.0], atol=1e-12)
        np.testing.assert_allclose(py.duration, [0.5], atol=1e-12)
        if native_midiparse_available():
            nat = parse_midi_native(p)
            np.testing.assert_allclose(nat.duration, py.duration, atol=1e-12)


def test_midi_synthetic_dense_corpus():
    """The -dense variant (max_notes 384) produces a markedly denser roll
    distribution than the default corpus — the reproducible corpus behind
    RESULTS.md's collapse-trigger isolation (~8.5% vs ~1.3% fill)."""
    import numpy as np

    from midi_vae_tpu.data.fetch import fetch_dataset

    dense_train, _, _, _ = fetch_dataset("midi-synthetic-dense")
    sparse_train, _, _, _ = fetch_dataset("midi-synthetic")
    dense_fill = float((dense_train.images > 0).mean())
    sparse_fill = float((sparse_train.images > 0).mean())
    assert dense_fill > 3 * sparse_fill, (dense_fill, sparse_fill)
    assert dense_train.images.shape[1:] == sparse_train.images.shape[1:]


# ------------------------------------------------- corpus statistics (round 4)


class TestRollStatistics:
    """midi/stats.py: the histogram machinery behind the generation
    dossier and the export-threshold calibrator."""

    def test_run_lengths_hand_case(self):
        from midi_vae_tpu.midi.stats import run_lengths

        roll = np.zeros((1, 2, 10), np.uint8)
        roll[0, 0, 1:4] = 1   # length 3
        roll[0, 0, 6:7] = 1   # length 1
        roll[0, 1, 0:10] = 1  # length 10 (touches both edges)
        assert sorted(run_lengths(roll).tolist()) == [1, 3, 10]

    def test_histograms_are_distributions(self):
        from midi_vae_tpu.midi.stats import STAT_KEYS, roll_statistics

        rng = np.random.default_rng(0)
        rolls = (rng.random((8, 24, 32)) < 0.05).astype(np.uint8)
        st = roll_statistics(rolls)
        for k in STAT_KEYS:
            np.testing.assert_allclose(st[k].sum(), 1.0, atol=1e-12)
            assert (st[k] >= 0).all()

    def test_empty_corpus_degrades_gracefully(self):
        from midi_vae_tpu.midi.stats import roll_statistics

        st = roll_statistics(np.zeros((4, 8, 8), np.uint8))
        assert st["notes_per_roll"] == 0.0
        assert st["mean_duration"] == 0.0
        np.testing.assert_allclose(st["duration"].sum(), 1.0)  # uniform fallback

    def test_js_divergence_properties(self):
        from midi_vae_tpu.midi.stats import js_divergence

        p = np.array([0.5, 0.5, 0.0])
        q = np.array([0.0, 0.5, 0.5])
        assert js_divergence(p, p) == 0.0
        assert abs(js_divergence(p, q) - js_divergence(q, p)) < 1e-12
        assert 0.0 < js_divergence(p, q) <= 1.0
        # disjoint supports → maximal divergence (base 2)
        assert abs(js_divergence(np.array([1.0, 0.0]), np.array([0.0, 1.0])) - 1.0) < 1e-12


class TestSecondOrderStatistics:
    """Round-5 statistics (midi/stats.py ioi / pitch_interval /
    scale_consistency) + the tonal corpus (midi/factory.py
    structured_notes): the dossier's measurement must be able to FAIL a
    generator that gets texture right and music wrong."""

    def test_onset_events_hand_case(self):
        from midi_vae_tpu.midi.stats import onset_events

        roll = np.zeros((2, 4, 8), np.uint8)
        roll[0, 1, 2:5] = 1  # one note: onset at col 2
        roll[0, 3, 2:3] = 1  # simultaneous onset, higher row
        roll[1, 0, 0:2] = 1  # other roll: onset at col 0
        ni, hi, wi = onset_events(roll)
        np.testing.assert_array_equal(ni, [0, 0, 1])
        np.testing.assert_array_equal(wi, [2, 2, 0])
        np.testing.assert_array_equal(hi, [1, 3, 0])  # pitch-sorted within col

    def test_second_order_histograms_are_distributions(self):
        from midi_vae_tpu.midi.stats import STAT_KEYS_2ND, roll_statistics

        rng = np.random.default_rng(0)
        rolls = (rng.random((8, 24, 32)) < 0.05).astype(np.uint8)
        st = roll_statistics(rolls)
        for k in STAT_KEYS_2ND:
            np.testing.assert_allclose(st[k].sum(), 1.0, atol=1e-12)
            assert (st[k] >= 0).all()

    def test_structured_notes_are_tonal_and_metric(self):
        from midi_vae_tpu.midi.factory import GRID_SECONDS, structured_notes
        from midi_vae_tpu.midi.stats import SCALE_TEMPLATES

        rng = np.random.default_rng(3)
        notes = structured_notes(rng)
        # tonal: every pitch class sits in ONE of the 24 scale templates
        pcs = np.zeros(12)
        np.add.at(pcs, notes.pitch % 12, 1.0)
        fits = (SCALE_TEMPLATES @ pcs) / pcs.sum()
        assert fits.max() == 1.0, f"best scale fit {fits.max():.3f} < 1"
        # metric: all onsets are multiples of one 16th-note grid
        on_grid = [
            np.allclose(np.mod(notes.onset / g + 0.5, 1.0), 0.5, atol=1e-6)
            for g in GRID_SECONDS
        ]
        assert any(on_grid), "onsets do not sit on any 16th-note grid"
        # polyphonic: the held triads put a harmony floor under the melody
        assert len(notes.onset) > 12

    def test_separates_tonal_corpus_from_note_soup(self):
        """The headline property: first-order pitch-class JS is blind to
        the difference between music and uniform note soup; the
        second-order statistics see it at >5x the self-noise floor."""
        import tempfile

        from midi_vae_tpu.data.sources import load_midi_folder
        from midi_vae_tpu.midi.factory import generate_midi_dataset
        from midi_vae_tpu.midi.stats import js_profile, roll_statistics

        stats = {}
        for style in ("random", "structured"):
            d = tempfile.mkdtemp(prefix=f"stats2_{style}_")
            generate_midi_dataset(64, d, seed=0, style=style)
            rolls = (np.asarray(load_midi_folder(d).images)[..., 0] > 0).astype(np.uint8)
            half = len(rolls) // 2
            stats[style] = roll_statistics(rolls[:half])
            stats[style + "_b"] = roll_statistics(rolls[half:])

        cross = js_profile(stats["random"], stats["structured"])
        self_noise = js_profile(stats["structured"], stats["structured_b"])
        # first-order pitch-class cannot fail the soup...
        assert cross["js_pitch_class"] < 0.05, cross
        # ...the second-order statistics fail it decisively
        assert cross["js_pitch_interval"] > 0.2, cross
        assert cross["js_scale_consistency"] > 0.2, cross
        assert cross["js_mean_2nd"] > 5 * max(self_noise["js_mean_2nd"], 1e-3), (
            cross, self_noise)

    def test_scale_consistency_fails_broken_pitches(self):
        """A 'broken generator' that shuffles pitch rows (texture intact,
        harmony destroyed) must light up the scale statistic."""
        import tempfile

        from midi_vae_tpu.data.sources import load_midi_folder
        from midi_vae_tpu.midi.factory import generate_midi_dataset
        from midi_vae_tpu.midi.stats import js_profile, roll_statistics

        d = tempfile.mkdtemp(prefix="stats2_broken_")
        generate_midi_dataset(64, d, seed=1, style="structured")
        rolls = (np.asarray(load_midi_folder(d).images)[..., 0] > 0).astype(np.uint8)
        rng = np.random.default_rng(0)
        broken = rolls[:, rng.permutation(rolls.shape[1]), :]
        prof = js_profile(roll_statistics(broken), roll_statistics(rolls))
        assert prof["js_scale_consistency"] > 0.2, prof
        # duration/density texture is untouched — first-order mean stays low
        assert prof["js_duration"] < 0.02, prof
        assert prof["js_density"] < 0.02, prof

    def test_fetch_midi_structured_end_to_end(self):
        from midi_vae_tpu.data.fetch import fetch_dataset
        from midi_vae_tpu.midi.stats import roll_statistics

        train, _, test, _ = fetch_dataset("midi-structured")
        assert train.images.shape[1:] == (128, 128, 1)
        rolls = (np.asarray(train.images)[..., 0] > 0).astype(np.uint8)
        st = roll_statistics(rolls)
        assert st["mean_scale_fit"] > 0.95, st["mean_scale_fit"]


class TestCalibrateExportThreshold:
    """midi/calibrate.py: the fix for the dossier's duration-fragmentation
    finding — a decoder whose probabilities sag mid-note shatters long
    notes at a fixed threshold; calibration must recover them."""

    @staticmethod
    def _sagging_decoder_case(note_len=12, sag=0.07, peak=0.6):
        """Targets: clean notes of length `note_len`. Recon probs: the same
        notes with probability `peak` at the onset cell and `sag` (below
        the fixed 0.1 threshold) across the rest of the note."""
        n, h, w = 16, 16, 48
        targets = np.zeros((n, h, w), np.float32)
        probs = np.zeros((n, h, w), np.float32)
        rng = np.random.default_rng(0)
        for i in range(n):
            for _ in range(3):
                r = rng.integers(0, h)
                s = rng.integers(0, w - note_len)
                targets[i, r, s:s + note_len] = 0.8  # velocity-valued real roll
                probs[i, r, s] = peak
                probs[i, r, s + 1:s + note_len] = sag
        return probs, targets

    def test_calibration_heals_fragmentation(self):
        from midi_vae_tpu.midi.calibrate import calibrate_export_threshold

        probs, targets = self._sagging_decoder_case()
        best, rows = calibrate_export_threshold(probs, targets)
        # the sag sits at 0.07: any threshold above it fragments every
        # note to 1 column; calibration must select below the sag
        assert best < 0.07, (best, rows)
        by_t = {r["threshold"]: r for r in rows}
        assert by_t[best]["js_mean"] < by_t[0.1]["js_mean"]
        assert by_t[best]["mean_duration"] > 10.0  # recovered ~12-col notes
        assert by_t[0.1]["mean_duration"] < 2.0    # the fixed default fragments

    def test_well_calibrated_decoder_keeps_default(self):
        from midi_vae_tpu.midi.calibrate import calibrate_export_threshold

        # probabilities solidly above threshold across full note extents:
        # every candidate below the plateau scores identically, and the
        # chosen one must reproduce the target statistics (JS ~ 0)
        probs, targets = self._sagging_decoder_case(sag=0.9, peak=0.9)
        best, rows = calibrate_export_threshold(probs, targets)
        by_t = {r["threshold"]: r for r in rows}
        assert by_t[best]["js_mean"] < 1e-6
        assert by_t[best]["mean_duration"] == 12.0

    def test_channel_last_inputs_accepted(self):
        from midi_vae_tpu.midi.calibrate import calibrate_export_threshold

        probs, targets = self._sagging_decoder_case()
        best4, _ = calibrate_export_threshold(probs[..., None], targets[..., None])
        best3, _ = calibrate_export_threshold(probs, targets)
        assert best4 == best3
