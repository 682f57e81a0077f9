// Native host-side WAV decode for the data pipeline.
//
// TPU-native replacement for the reference's torchaudio.load host path
// (/root/reference/src/data/preprocess.py:5-47): the hot manifest formats
// (CREMA-D / RAVDESS / TESS) are RIFF/WAV PCM, which this library decodes,
// downmixes, trims and pads directly into the caller's pinned batch buffer
// — one C call per batch, no Python-object churn and no GIL between files.
// Non-WAV containers and sample rates that need resampling return a
// distinct status so the Python fallback (data/audio_io.py) handles them
// with identical semantics (including the zeros-on-error rule).
//
// C ABI only (loaded via ctypes from data/native.py; no pybind11 in the
// image). Thread-safe; batch decode fans out over an internal thread pool.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// status codes surfaced to data/native.py (keep in sync)
enum Status : int32_t {
  kOk = 0,
  kOpenFailed = 1,      // missing/unreadable -> Python zeros-on-error
  kBadRiff = 2,         // not a RIFF/WAVE container -> Python fallback
  kBadFormat = 3,       // compressed / unsupported encoding -> fallback
  kNeedsResample = 4,   // decodable but sr != target -> Python resampler
  kTruncatedData = 5,   // data chunk shorter than declared -> fallback
};

struct WavFormat {
  uint16_t format_tag = 0;   // 1 = PCM, 3 = IEEE float (0xFFFE unwrapped)
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits_per_sample = 0;
};

bool read_exact(std::FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

// Walk the RIFF chunks to the fmt/data pair. On success positions the file
// at the start of sample data and sets *data_bytes.
int parse_header(std::FILE* f, WavFormat* fmt, uint32_t* data_bytes) {
  uint8_t hdr[12];
  if (!read_exact(f, hdr, 12)) return kBadRiff;
  if (std::memcmp(hdr, "RIFF", 4) != 0 || std::memcmp(hdr + 8, "WAVE", 4) != 0)
    return kBadRiff;
  bool have_fmt = false;
  for (;;) {
    uint8_t ch[8];
    if (!read_exact(f, ch, 8)) return kBadRiff;
    uint32_t size = rd_u32(ch + 4);
    if (std::memcmp(ch, "fmt ", 4) == 0) {
      // Corrupt headers can declare absurd chunk sizes (up to 4 GB); real
      // fmt chunks are 16/18/40 bytes. Cap well above that so a bad size
      // becomes a clean fallback instead of a bad_alloc at the C boundary.
      if (size > 65536) return kBadRiff;
      std::vector<uint8_t> body(size);
      if (!read_exact(f, body.data(), size)) return kBadRiff;
      if (size < 16) return kBadFormat;
      fmt->format_tag = rd_u16(&body[0]);
      fmt->channels = rd_u16(&body[2]);
      fmt->sample_rate = rd_u32(&body[4]);
      fmt->bits_per_sample = rd_u16(&body[14]);
      if (fmt->format_tag == 0xFFFE && size >= 40)  // WAVE_FORMAT_EXTENSIBLE
        fmt->format_tag = rd_u16(&body[24]);        // sub-format GUID head
      if (size & 1) std::fseek(f, 1, SEEK_CUR);     // RIFF pad byte
      have_fmt = true;
    } else if (std::memcmp(ch, "data", 4) == 0) {
      if (!have_fmt) return kBadRiff;
      *data_bytes = size;
      return kOk;
    } else {
      if (std::fseek(f, static_cast<long>(size + (size & 1)), SEEK_CUR) != 0)
        return kBadRiff;
    }
  }
}

// Per-format bulk converters: tight per-frame loops over typed pointers so
// the compiler auto-vectorizes them (a generic per-sample switch measured
// 2x SLOWER than numpy's astype — these loops beat it).
template <typename In, typename Conv>
void convert_frames(const uint8_t* raw, int64_t frames, uint16_t channels,
                    float* out, Conv conv) {
  const In* s = reinterpret_cast<const In*>(raw);
  if (channels == 1) {
    for (int64_t i = 0; i < frames; ++i) out[i] = conv(s[i]);
  } else if (channels == 2) {
    for (int64_t i = 0; i < frames; ++i)
      out[i] = 0.5f * (conv(s[2 * i]) + conv(s[2 * i + 1]));
  } else {
    const float inv = 1.0f / static_cast<float>(channels);
    for (int64_t i = 0; i < frames; ++i) {
      float acc = 0.0f;
      for (uint16_t c = 0; c < channels; ++c) acc += conv(s[i * channels + c]);
      out[i] = acc * inv;
    }
  }
}

void convert24(const uint8_t* raw, int64_t frames, uint16_t channels,
               float* out) {
  constexpr float k = 1.0f / static_cast<float>(1 << 23);
  const float inv = 1.0f / static_cast<float>(channels);
  for (int64_t i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (uint16_t c = 0; c < channels; ++c) {
      const uint8_t* p = raw + (i * channels + c) * 3;
      int32_t v = static_cast<int32_t>(p[0]) | (static_cast<int32_t>(p[1]) << 8)
                  | (static_cast<int32_t>(p[2]) << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      acc += static_cast<float>(v) * k;
    }
    out[i] = acc * inv;
  }
}

// True iff the (format_tag, bits_per_sample) pair is one the converters
// below handle. Shared by decode_one and ser_wav_info so the header probe
// rejects ADPCM/etc. the same way the decoder does (bits=4 would otherwise
// divide by bits/8 == 0 when computing the frame count).
bool supported_format(const WavFormat& fmt) {
  const uint16_t bits = fmt.bits_per_sample;
  const bool ok_bits = (fmt.format_tag == 3 && bits == 32) ||
                       (fmt.format_tag == 1 &&
                        (bits == 8 || bits == 16 || bits == 24 || bits == 32));
  return ok_bits && fmt.channels != 0;
}

// Decode one file into out[0..capacity) (mono, trimmed), pad with zeros up
// to min_samples. *out_len = number of samples written (valid + pad).
int decode_one(const char* path, int32_t target_sr, float* out,
               int64_t capacity, int64_t min_samples, int64_t* out_len) {
  *out_len = 0;
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return kOpenFailed;
  WavFormat fmt;
  uint32_t data_bytes = 0;
  int st = parse_header(f, &fmt, &data_bytes);
  if (st != kOk) {
    std::fclose(f);
    return st;
  }
  const uint16_t bits = fmt.bits_per_sample;
  if (!supported_format(fmt)) {
    std::fclose(f);
    return kBadFormat;
  }
  if (static_cast<int32_t>(fmt.sample_rate) != target_sr) {
    std::fclose(f);
    return kNeedsResample;
  }
  const uint32_t bytes_per_sample = bits / 8;
  const uint32_t frame_bytes = bytes_per_sample * fmt.channels;
  int64_t n_frames = data_bytes / frame_bytes;
  int64_t want = n_frames < capacity ? n_frames : capacity;

  std::vector<uint8_t> buf(static_cast<size_t>(want) * frame_bytes);
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  int64_t have = static_cast<int64_t>(got / frame_bytes);
  if (have == 0 && want > 0) return kTruncatedData;

  if (fmt.format_tag == 3) {
    convert_frames<float>(buf.data(), have, fmt.channels, out,
                          [](float v) { return v; });
  } else if (bits == 16) {
    convert_frames<int16_t>(buf.data(), have, fmt.channels, out,
                            [](int16_t v) { return v * (1.0f / 32768.0f); });
  } else if (bits == 32) {
    convert_frames<int32_t>(buf.data(), have, fmt.channels, out,
                            [](int32_t v) { return v * (1.0f / 2147483648.0f); });
  } else if (bits == 8) {
    convert_frames<uint8_t>(buf.data(), have, fmt.channels, out, [](uint8_t v) {
      return (static_cast<float>(v) - 128.0f) * (1.0f / 128.0f);
    });
  } else {  // 24-bit packed
    convert24(buf.data(), have, fmt.channels, out);
  }
  int64_t len = have;
  if (len < min_samples) {
    int64_t pad_to = min_samples < capacity ? min_samples : capacity;
    std::memset(out + len, 0, static_cast<size_t>(pad_to - len) * sizeof(float));
    len = pad_to;
  }
  *out_len = len;
  return kOk;
}

// Nothing may throw across the extern-C/ctypes boundary (it would
// std::terminate the training process). Any escaping exception — e.g. a
// bad_alloc from a pathological allocation — becomes a fallback status.
int decode_one_noexcept(const char* path, int32_t target_sr, float* out,
                        int64_t capacity, int64_t min_samples,
                        int64_t* out_len) noexcept {
  try {
    return decode_one(path, target_sr, out, capacity, min_samples, out_len);
  } catch (...) {
    *out_len = 0;
    return kBadRiff;
  }
}

}  // namespace

extern "C" {

// Header-only probe for duration bucketing (pipeline.py:audio_length).
// Returns a Status; on kOk fills frames (at native sr) and sample rate.
int32_t ser_wav_info(const char* path, int64_t* n_frames, int32_t* sr) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return kOpenFailed;
  WavFormat fmt;
  uint32_t data_bytes = 0;
  int st = parse_header(f, &fmt, &data_bytes);
  std::fclose(f);
  if (st != kOk) return st;
  // Same gate as decode_one: compressed formats (ADPCM bits=4, MP3-in-WAV,
  // ...) would yield a bogus frame count — and bits/8 == 0 for sub-byte
  // codecs would SIGFPE. Route them to the Python duration probe instead.
  if (!supported_format(fmt)) return kBadFormat;
  *n_frames = data_bytes / ((fmt.bits_per_sample / 8) * fmt.channels);
  *sr = static_cast<int32_t>(fmt.sample_rate);
  return kOk;
}

// Single-clip decode (load_audio fast path).
int32_t ser_decode_wav(const char* path, int32_t target_sr, float* out,
                       int64_t capacity, int64_t min_samples,
                       int64_t* out_len) {
  return decode_one_noexcept(path, target_sr, out, capacity, min_samples,
                             out_len);
}

// Whole-batch decode: paths[i] -> out[i*stride .. i*stride+capacity), with
// per-row lengths and statuses. Rows whose status != kOk are left untouched
// for the Python fallback. n_threads <= 1 decodes inline.
void ser_decode_batch(const char** paths, int32_t n, int32_t target_sr,
                      float* out, int64_t stride, int64_t capacity,
                      int64_t min_samples, int64_t* out_lens,
                      int32_t* statuses, int32_t n_threads) {
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      statuses[i] = decode_one_noexcept(paths[i], target_sr, out + i * stride,
                                        capacity, min_samples, &out_lens[i]);
    }
  };
  if (n_threads <= 1 || n <= 1) {
    worker();
    return;
  }
  int32_t nt = n_threads < n ? n_threads : n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
