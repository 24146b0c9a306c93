// Native host-side audio runtime for the TPU STT framework.
//
// The reference implements its entire host pipeline in C++
// (/root/reference/src/utils.h WAV parsing, stt_engine.cpp:117-125 PCM
// conversion, grpc_server.cpp:214-219 stream buffering). This library is
// the native counterpart for the hot serving paths, exposed to Python via
// ctypes (no pybind11 in the image):
//
//   * robust RIFF/WAV parsing (fmt/data chunk walk, PCM16, stereo average
//     mix, N-channel -> channel 0) — same semantics as audio/wav.py;
//   * int16 -> float32 PCM conversion;
//   * an amortized-growth stream buffer for gRPC streaming ingest with
//     first-chunk WAV-header stripping (replaces O(n^2) per-chunk
//     reallocation patterns).
//
// Build: `make -C native` -> libsstw_native.so.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Memory helpers
// ---------------------------------------------------------------------------

void sstw_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// PCM conversion
// ---------------------------------------------------------------------------

void sstw_pcm16_to_f32(const int16_t* in, size_t n, float* out) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (size_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

// ---------------------------------------------------------------------------
// WAV parsing
// ---------------------------------------------------------------------------

// Returns 0 on success; negative error codes otherwise.
//  -1 no RIFF/WAVE header      -2 bad fmt chunk
//  -3 unsupported format tag   -4 no data chunk
//  -5 unsupported bit depth    -6 allocation failure
int sstw_parse_wav(const uint8_t* data, size_t len, int16_t** out_pcm,
                   size_t* out_samples, int32_t* out_rate,
                   int32_t* out_channels) {
  *out_pcm = nullptr;
  *out_samples = 0;
  if (len < 12 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0)
    return -1;

  size_t ptr = 12;
  int32_t channels = 1, rate = 16000;
  int16_t bits = 0;
  bool fmt_found = false;
  const uint8_t* pcm_start = nullptr;
  size_t pcm_bytes = 0;

  while (ptr + 8 < len) {
    const uint8_t* id = data + ptr;
    uint32_t chunk;
    std::memcpy(&chunk, data + ptr + 4, 4);
    ptr += 8;
    if (ptr + chunk > len && std::memcmp(id, "data", 4) != 0) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      if (chunk < 16) return -2;
      uint16_t tag;
      std::memcpy(&tag, data + ptr, 2);
      if (tag != 1 && tag != 0xFFFE) return -3;
      uint16_t ch16;
      std::memcpy(&ch16, data + ptr + 2, 2);
      channels = ch16;
      std::memcpy(&rate, data + ptr + 4, 4);
      std::memcpy(&bits, data + ptr + 14, 2);
      fmt_found = true;
      ptr += chunk;
    } else if (std::memcmp(id, "data", 4) == 0) {
      if (!fmt_found) return -4;
      pcm_start = data + ptr;
      pcm_bytes = chunk;
      if (ptr + pcm_bytes > len) pcm_bytes = len - ptr;
      break;
    } else {
      ptr += chunk;
    }
    if ((chunk % 2) && ptr < len) ptr++;  // RIFF word alignment
  }
  if (!pcm_start || pcm_bytes < 2) return -4;
  if (bits != 16) return -5;

  const int16_t* raw = reinterpret_cast<const int16_t*>(pcm_start);
  size_t n = pcm_bytes / 2;
  size_t frames = channels > 0 ? n / channels : 0;
  auto* out = static_cast<int16_t*>(std::malloc(frames * sizeof(int16_t)));
  if (!out) return -6;

  if (channels == 1) {
    std::memcpy(out, raw, frames * sizeof(int16_t));
  } else if (channels == 2) {
    for (size_t i = 0; i < frames; ++i) {
      int32_t mixed = (int32_t)raw[2 * i] + (int32_t)raw[2 * i + 1];
      out[i] = static_cast<int16_t>(mixed / 2);
    }
  } else {
    for (size_t i = 0; i < frames; ++i) out[i] = raw[i * channels];
  }
  *out_pcm = out;
  *out_samples = frames;
  *out_rate = rate;
  *out_channels = channels;
  return 0;
}

// ---------------------------------------------------------------------------
// Streaming ingest buffer (amortized growth, WAV-header aware)
// ---------------------------------------------------------------------------

struct SstwStreamBuf {
  int16_t* data = nullptr;
  size_t size = 0;      // samples
  size_t capacity = 0;  // samples
  bool first_chunk = true;
  size_t header_skip = 0;  // bytes of WAV header still to strip
  uint8_t pending_byte = 0;
  bool has_pending = false;  // odd-byte carry between chunks
};

void* sstw_rb_create() { return new SstwStreamBuf(); }

void sstw_rb_destroy(void* h) {
  auto* b = static_cast<SstwStreamBuf*>(h);
  std::free(b->data);
  delete b;
}

static bool rb_reserve(SstwStreamBuf* b, size_t need) {
  if (need <= b->capacity) return true;
  size_t cap = b->capacity ? b->capacity : 16384;
  while (cap < need) cap *= 2;
  auto* nd = static_cast<int16_t*>(std::realloc(b->data, cap * sizeof(int16_t)));
  if (!nd) return false;
  b->data = nd;
  b->capacity = cap;
  return true;
}

// Append a chunk of bytes; the first chunk's 44-byte WAV header is
// stripped when present (grpc_server.cpp:195-212 semantics). Returns the
// buffer size in samples, or (size_t)-1 on allocation failure.
size_t sstw_rb_append(void* h, const uint8_t* bytes, size_t len) {
  auto* b = static_cast<SstwStreamBuf*>(h);
  if (b->first_chunk) {
    if (len >= 12 && std::memcmp(bytes, "RIFF", 4) == 0 &&
        std::memcmp(bytes + 8, "WAVE", 4) == 0 && len > 44)
      b->header_skip = 44;
    b->first_chunk = false;
  }
  if (b->header_skip) {
    size_t skip = b->header_skip < len ? b->header_skip : len;
    bytes += skip;
    len -= skip;
    b->header_skip -= skip;
  }
  if (!len) return b->size;

  // Odd-byte carry so sample boundaries survive arbitrary chunking.
  uint8_t stitched[2];
  if (b->has_pending) {
    stitched[0] = b->pending_byte;
    stitched[1] = bytes[0];
    if (!rb_reserve(b, b->size + 1)) return (size_t)-1;
    std::memcpy(b->data + b->size, stitched, 2);
    b->size += 1;
    bytes += 1;
    len -= 1;
    b->has_pending = false;
  }
  size_t samples = len / 2;
  if (len % 2) {
    b->pending_byte = bytes[len - 1];
    b->has_pending = true;
  }
  if (samples) {
    if (!rb_reserve(b, b->size + samples)) return (size_t)-1;
    std::memcpy(b->data + b->size, bytes, samples * 2);
    b->size += samples;
  }
  return b->size;
}

size_t sstw_rb_size(void* h) {
  return static_cast<SstwStreamBuf*>(h)->size;
}

// Copy the whole buffer out (caller allocates n samples).
void sstw_rb_read(void* h, int16_t* out) {
  auto* b = static_cast<SstwStreamBuf*>(h);
  std::memcpy(out, b->data, b->size * sizeof(int16_t));
}

void sstw_rb_clear(void* h) {
  auto* b = static_cast<SstwStreamBuf*>(h);
  b->size = 0;
  // header handling persists: only the very first chunk of a stream
  // carries a header.
}

}  // extern "C"
