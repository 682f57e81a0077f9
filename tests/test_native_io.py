"""Native C++ WAV decoder (native/wav_decoder.cc) vs the Python loader.

The native layer is a fast path over data/audio_io.py's semantics
(reference: /root/reference/src/data/preprocess.py:5-47); every test pins
byte-for-byte parity with the pure-Python implementation, including the
fallback routes (missing file -> 1 s zeros, non-target-rate -> scipy
polyphase resample on the Python side).
"""

import wave

import numpy as np
import pytest

from multilingual_multimodal_speech_emotion_recognition_tpu.data import (
    audio_io, native, pipeline)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder unavailable (no g++)")

RNG = np.random.default_rng(11)


def _write(path, samples, sr=16000, sampwidth=2, channels=1):
    samples = np.clip(samples, -1.0, 1.0)
    if channels > 1:
        assert samples.ndim == 2 and samples.shape[0] == channels
        inter = samples.T.reshape(-1)
    else:
        inter = samples.reshape(-1)
    if sampwidth == 2:
        raw = np.round(inter * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 1:
        raw = (np.round(inter * 127.0) + 128).astype(np.uint8).tobytes()
    elif sampwidth == 4:
        raw = np.clip(np.round(inter * 2147483647.0), -(2 ** 31),
                      2 ** 31 - 1).astype("<i4").tobytes()
    elif sampwidth == 3:
        v = np.round(inter * float((1 << 23) - 1)).astype(np.int32)
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        b = np.zeros((v.size, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw = b.tobytes()
    else:
        raise ValueError(sampwidth)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(raw)


def _python_load(path, **kw):
    """The pure-Python loader, with the native fast path disabled."""
    saved = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        return audio_io.load_audio(path, **kw)
    finally:
        native._lib, native._tried = saved


@pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2])
def test_decode_parity_formats(tmp_path, sampwidth, channels):
    T = 4000
    x = RNG.standard_normal((channels, T)).astype(np.float32) * 0.3
    p = tmp_path / f"c{channels}_w{sampwidth}.wav"
    _write(p, x if channels > 1 else x[0], sampwidth=sampwidth,
           channels=channels)
    got = audio_io.load_audio(p, dataset_root="")
    want = _python_load(p, dataset_root="")
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.float32 and len(got) == 8000  # padded to 0.5 s


def test_trim_and_pad(tmp_path):
    sr = 16000
    long = tmp_path / "long.wav"
    _write(long, RNG.standard_normal(sr * 3).astype(np.float32) * 0.2, sr)
    got = audio_io.load_audio(long, dataset_root="", max_length=2.0)
    np.testing.assert_array_equal(
        got, _python_load(long, dataset_root="", max_length=2.0))
    assert len(got) == 2 * sr

    short = tmp_path / "short.wav"
    _write(short, np.ones(100, np.float32) * 0.5, sr)
    got = audio_io.load_audio(short, dataset_root="")
    assert len(got) == sr // 2 and np.all(got[100:] == 0)


def test_min_pad_exceeds_max_trim(tmp_path):
    """Trim-then-pad ordering: min_length pad applies after max_length trim
    (preprocess.py:29-39), so min > max yields min-length output."""
    sr = 16000
    p = tmp_path / "x.wav"
    _write(p, RNG.standard_normal(sr).astype(np.float32) * 0.2, sr)
    got = audio_io.load_audio(p, dataset_root="", max_length=0.25)
    want = _python_load(p, dataset_root="", max_length=0.25)
    np.testing.assert_array_equal(got, want)
    assert len(got) == sr // 2 and np.all(got[sr // 4:] == 0)


def test_missing_file_zeros(tmp_path, capsys):
    got = audio_io.load_audio(tmp_path / "nope.wav", dataset_root="")
    np.testing.assert_array_equal(got, np.zeros(16000, np.float32))
    assert "Error loading" in capsys.readouterr().out


def test_resample_falls_back_to_python(tmp_path):
    p = tmp_path / "sr22050.wav"
    _write(p, RNG.standard_normal(22050).astype(np.float32) * 0.2, sr=22050)
    got = audio_io.load_audio(p, dataset_root="")
    want = _python_load(p, dataset_root="")
    np.testing.assert_array_equal(got, want)
    assert len(got) == 16000


def test_wav_info_matches_header(tmp_path):
    p = tmp_path / "probe.wav"
    _write(p, RNG.standard_normal(12345).astype(np.float32) * 0.2,
           sr=22050, channels=1)
    frames, sr = native.wav_info(p)
    assert (frames, sr) == (12345, 22050)
    assert native.wav_info(tmp_path / "absent.wav") is None


def test_batch_decode_mixed(tmp_path):
    sr = 16000
    paths, rows = [], []
    for i in range(3):
        p = tmp_path / f"ok{i}.wav"
        x = RNG.standard_normal(sr + i * 500).astype(np.float32) * 0.2
        _write(p, x, sr)
        paths.append(str(p))
    paths.append(str(tmp_path / "missing.wav"))
    p22 = tmp_path / "sr22k.wav"
    _write(p22, RNG.standard_normal(11025).astype(np.float32) * 0.2, sr=22050)
    paths.append(str(p22))

    T = 2 * sr
    out = np.zeros((len(paths), T), np.float32)
    lens, sts = native.decode_batch(paths, out, target_sr=sr,
                                    min_samples=sr // 2, n_threads=4)
    assert list(sts[:3]) == [native.OK] * 3
    assert sts[3] == native.OPEN_FAILED and sts[4] == native.NEEDS_RESAMPLE
    for i in range(3):
        want = _python_load(paths[i], dataset_root="")
        assert lens[i] == len(want)
        np.testing.assert_array_equal(out[i, : lens[i]], want)


def test_bucketed_loader_native_matches_python(tmp_path, monkeypatch):
    sr = 16000
    mani = tmp_path / "m.jsonl"
    lines = []
    for i in range(5):
        p = tmp_path / f"u{i}.wav"
        _write(p, RNG.standard_normal(sr * (1 + i % 3)).astype(np.float32) * 0.2,
               sr)
        lines.append(f'{{"audio": "{p}", "text": "hello {i}", "label": {i % 4}}}')
    # one missing file exercises zeros-on-error inside the batch path
    lines.append(f'{{"audio": "{tmp_path}/gone.wav", "text": "x", "label": 0}}')
    mani.write_text("\n".join(lines) + "\n")

    from multilingual_multimodal_speech_emotion_recognition_tpu.config import DataConfig
    cfg = DataConfig(dataset_root="")
    ds = pipeline.SERDataset(str(mani), cfg)
    ld = pipeline.BucketedLoader(ds, batch_size=3, shuffle=False,
                                 num_workers=2)
    native_batches = list(ld.epoch(0))

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    ds2 = pipeline.SERDataset(str(mani), cfg)
    ld2 = pipeline.BucketedLoader(ds2, batch_size=3, shuffle=False,
                                  num_workers=2)
    python_batches = list(ld2.epoch(0))

    assert len(native_batches) == len(python_batches)
    for nb, pb in zip(native_batches, python_batches):
        assert set(nb) == set(pb)
        for k in nb:
            np.testing.assert_array_equal(nb[k], pb[k], err_msg=k)


def test_wav_info_rejects_adpcm_and_oversized_fmt(tmp_path):
    """Compressed encodings and corrupt headers must fall back cleanly.

    bits_per_sample=4 (IMA ADPCM) used to integer-divide by bits/8 == 0 in
    ser_wav_info (SIGFPE killing the process); a fmt chunk declaring a
    multi-GB size used to bad_alloc across the C boundary. Both now return
    fallback statuses so pipeline.audio_length takes the Python probe.
    """
    import struct

    def riff(fmt_body, data=b"\x00" * 64, fmt_size=None):
        fmt_size = len(fmt_body) if fmt_size is None else fmt_size
        chunks = (b"fmt " + struct.pack("<I", fmt_size) + fmt_body +
                  b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def fmt_body(tag, channels, sr, bits):
        block = max(1, channels * (bits // 8))
        return struct.pack("<HHIIHH", tag, channels, sr, sr * block, block,
                           bits)

    adpcm = tmp_path / "adpcm.wav"
    adpcm.write_bytes(riff(fmt_body(0x11, 1, 16000, 4)))  # IMA ADPCM
    assert native.wav_info(adpcm) is None  # no SIGFPE, clean fallback

    mp3 = tmp_path / "mp3.wav"
    mp3.write_bytes(riff(fmt_body(0x55, 1, 16000, 0)))  # MPEG layer 3
    assert native.wav_info(mp3) is None

    huge_fmt = tmp_path / "huge_fmt.wav"
    # fmt chunk claiming ~4 GB: must not try to allocate it
    huge_fmt.write_bytes(riff(fmt_body(1, 1, 16000, 16),
                              fmt_size=0xFFFF0000))
    assert native.wav_info(huge_fmt) is None
    out = np.zeros(16000, np.float32)
    lib = native._load()
    import ctypes
    n = ctypes.c_int64(0)
    st = lib.ser_decode_wav(str(huge_fmt).encode(), 16000,
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            16000, 8000, ctypes.byref(n))
    assert st != native.OK  # fallback status, process alive


def test_fuzz_corrupt_bytes_never_crash(tmp_path):
    """Header fuzzing: random garbage and bit-mutated valid WAVs must come
    back as a fallback status (or a successful in-range decode), never a
    crash — the failure mode the ADVICE hardening targets (SIGFPE on
    ADPCM frame math, std::bad_alloc on a 4 GB fmt chunk)."""
    t = np.arange(800) / 16000.0
    base_path = tmp_path / "base.wav"
    _write(base_path, (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32))
    base = base_path.read_bytes()

    blobs = []
    for i in range(40):  # pure garbage, various sizes incl. tiny
        blobs.append(bytes(RNG.integers(0, 256, int(RNG.integers(0, 200)),
                                        dtype=np.uint8)))
    for i in range(120):  # corrupt a valid header/body in-place
        b = bytearray(base)
        for _ in range(int(RNG.integers(1, 6))):
            b[int(RNG.integers(0, min(len(b), 64)))] = int(RNG.integers(0, 256))
        blobs.append(bytes(b))
    # targeted: fmt chunk claiming ~4 GB, zero channels, ADPCM bits=4
    for patch in [(16, (0xFF, 0xFF, 0xFF, 0x7F)),   # fmt size
                  (22, (0, 0)),                     # channels = 0
                  (34, (4, 0)),                     # bits_per_sample = 4
                  (20, (2, 0))]:                    # format_tag = ADPCM
        b = bytearray(base)
        off, vals = patch
        b[off:off + len(vals)] = bytes(vals)
        blobs.append(bytes(b))

    p = tmp_path / "fuzz.wav"
    n_ok = 0
    for blob in blobs:
        p.write_bytes(blob)
        info = native.wav_info(p)
        samples, st = native.decode_wav(p, target_sr=16000,
                                        max_samples=16000, min_samples=800)
        if st == 0:
            n_ok += 1
            assert samples is not None and np.isfinite(samples).all()
            assert np.abs(samples).max() <= 1.0 + 1e-6
        else:
            assert samples is None
        # and the loader-level path must also survive via its Python
        # fallback (zeros-on-error, preprocess.py:44-47 semantics)
        wav = audio_io.load_audio(p, dataset_root=None)
        assert np.isfinite(wav).all()
