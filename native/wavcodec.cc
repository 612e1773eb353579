// wavcodec: host-edge audio IO for egregora_tpu.
//
// Native replacement for the reference's libsndfile/soundfile dependency
// (SURVEY.md #33; reference call sites egregora_fat_llama_gpu.py:36,291).
// RIFF/WAVE parsing with PCM 8/16/24/32 and IEEE float32/64 support,
// planar float32 output, plus a std::thread batch decoder so a pipeline
// can overlap host decode with device compute.
//
// C API (ctypes-friendly; see egregora_tpu/utils/native.py):
//   wc_read(path, &data, &channels, &frames, &sr)   -> 0 on success
//   wc_write(path, data, channels, frames, sr, bits)-> 0 on success
//   wc_read_batch(paths, n, datas, chans, frames, srs, n_threads)
//   wc_free(ptr)
//   wc_last_error() -> const char* (thread-local)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

thread_local std::string g_error;

void set_error(const std::string& e) { g_error = e; }

struct Reader {
  FILE* f = nullptr;
  ~Reader() { if (f) fclose(f); }
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

int decode_to_planar(const uint8_t* raw, long n_frames, int channels,
                     int bits, int fmt_float, float* out /* [C][F] planar */) {
  const long stride = (long)channels;
  for (int c = 0; c < channels; ++c) {
    float* dst = out + (long)c * n_frames;
    if (fmt_float && bits == 32) {
      const float* s = reinterpret_cast<const float*>(raw);
      for (long i = 0; i < n_frames; ++i) dst[i] = s[i * stride + c];
    } else if (fmt_float && bits == 64) {
      const double* s = reinterpret_cast<const double*>(raw);
      for (long i = 0; i < n_frames; ++i)
        dst[i] = (float)s[i * stride + c];
    } else if (bits == 16) {
      const int16_t* s = reinterpret_cast<const int16_t*>(raw);
      const float k = 1.0f / 32768.0f;
      for (long i = 0; i < n_frames; ++i) dst[i] = s[i * stride + c] * k;
    } else if (bits == 32) {
      const int32_t* s = reinterpret_cast<const int32_t*>(raw);
      const float k = 1.0f / 2147483648.0f;
      for (long i = 0; i < n_frames; ++i) dst[i] = s[i * stride + c] * k;
    } else if (bits == 24) {
      const uint8_t* s = raw;
      const float k = 1.0f / 8388608.0f;
      for (long i = 0; i < n_frames; ++i) {
        const uint8_t* b = s + 3 * (i * stride + c);
        int32_t v = (int32_t)((uint32_t)b[0] | ((uint32_t)b[1] << 8) |
                              ((uint32_t)b[2] << 16));
        if (v >= (1 << 23)) v -= (1 << 24);
        dst[i] = v * k;
      }
    } else if (bits == 8) {
      const uint8_t* s = raw;
      const float k = 1.0f / 128.0f;
      for (long i = 0; i < n_frames; ++i)
        dst[i] = ((int)s[i * stride + c] - 128) * k;
    } else {
      return -1;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

const char* wc_last_error() { return g_error.c_str(); }

void wc_free(void* p) { std::free(p); }

// Returns 0 on success; *data is planar [channels][frames] float32
// allocated with malloc (caller frees via wc_free).
int wc_read(const char* path, float** data, int* channels, long* frames,
            int* sample_rate) {
  Reader r;
  r.f = std::fopen(path, "rb");
  if (!r.f) { set_error(std::string("cannot open ") + path); return 1; }

  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, r.f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    set_error("not a RIFF/WAVE file"); return 2;
  }

  int bits = 0, fmt_float = 0, ch = 0, sr = 0, have_fmt = 0;
  std::vector<uint8_t> payload;
  uint8_t chdr[8];
  while (std::fread(chdr, 1, 8, r.f) == 8) {
    uint32_t size = rd_u32(chdr + 4);
    if (!std::memcmp(chdr, "fmt ", 4)) {
      std::vector<uint8_t> fmt(size);
      if (std::fread(fmt.data(), 1, size, r.f) != size) {
        set_error("truncated fmt chunk"); return 3;
      }
      uint16_t tag = rd_u16(fmt.data());
      ch = rd_u16(fmt.data() + 2);
      sr = (int)rd_u32(fmt.data() + 4);
      bits = rd_u16(fmt.data() + 14);
      if (tag == 3) fmt_float = 1;
      else if (tag == 0xFFFE && size >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: subformat GUID's first u16
        uint16_t sub = rd_u16(fmt.data() + 24);
        fmt_float = (sub == 3);
      } else if (tag != 1) {
        set_error("unsupported WAV format tag " + std::to_string(tag));
        return 4;
      }
      have_fmt = 1;
    } else if (!std::memcmp(chdr, "data", 4)) {
      payload.resize(size);
      size_t got = std::fread(payload.data(), 1, size, r.f);
      payload.resize(got);
      break;  // fmt always precedes data in practice
    } else {
      if (std::fseek(r.f, (long)(size + (size & 1)), SEEK_CUR)) break;
    }
  }
  if (!have_fmt || ch <= 0 || sr <= 0) { set_error("missing fmt chunk"); return 5; }
  const int bytes = bits / 8;
  if (bytes <= 0) { set_error("bad bit depth"); return 6; }
  const long n_frames = (long)(payload.size() / ((size_t)bytes * ch));
  float* out = (float*)std::malloc(sizeof(float) * (size_t)n_frames * ch);
  if (!out) { set_error("oom"); return 7; }
  if (decode_to_planar(payload.data(), n_frames, ch, bits, fmt_float, out)) {
    std::free(out);
    set_error("unsupported sample format: bits=" + std::to_string(bits));
    return 8;
  }
  *data = out;
  *channels = ch;
  *frames = n_frames;
  *sample_rate = sr;
  return 0;
}

// data: planar [channels][frames] float32 in [-1, 1].
// bits: 16 or 32 (32 => IEEE float).
int wc_write(const char* path, const float* data, int channels, long frames,
             int sample_rate, int bits) {
  if (bits != 16 && bits != 32) { set_error("bits must be 16 or 32"); return 1; }
  FILE* f = std::fopen(path, "wb");
  if (!f) { set_error(std::string("cannot open ") + path); return 2; }
  const int bytes = bits / 8;
  const uint32_t data_size = (uint32_t)(frames * channels * bytes);
  const uint16_t tag = (bits == 32) ? 3 : 1;

  uint8_t h[44];
  std::memcpy(h, "RIFF", 4);
  uint32_t riff = 36 + data_size;
  std::memcpy(h + 4, &riff, 4);
  std::memcpy(h + 8, "WAVEfmt ", 8);
  uint32_t fmt_size = 16;
  std::memcpy(h + 16, &fmt_size, 4);
  uint16_t u16 = tag; std::memcpy(h + 20, &u16, 2);
  u16 = (uint16_t)channels; std::memcpy(h + 22, &u16, 2);
  uint32_t u32 = (uint32_t)sample_rate; std::memcpy(h + 24, &u32, 4);
  u32 = (uint32_t)(sample_rate * channels * bytes); std::memcpy(h + 28, &u32, 4);
  u16 = (uint16_t)(channels * bytes); std::memcpy(h + 32, &u16, 2);
  u16 = (uint16_t)bits; std::memcpy(h + 34, &u16, 2);
  std::memcpy(h + 36, "data", 4);
  std::memcpy(h + 40, &data_size, 4);
  if (std::fwrite(h, 1, 44, f) != 44) { fclose(f); set_error("write failed"); return 3; }

  // interleave + quantize in streaming blocks
  const long block = 65536;
  std::vector<uint8_t> buf((size_t)block * channels * bytes);
  for (long start = 0; start < frames; start += block) {
    const long n = (frames - start) < block ? (frames - start) : block;
    if (bits == 16) {
      int16_t* b = reinterpret_cast<int16_t*>(buf.data());
      for (long i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c) {
          // libsndfile convention, symmetric with the reader's
          // 1/32768: roundtrip through our own reader is exact
          long s = std::lround((double)data[(long)c * frames + start + i]
                               * 32768.0);
          if (s > 32767) s = 32767;
          if (s < -32768) s = -32768;
          b[i * channels + c] = (int16_t)s;
        }
    } else {
      float* b = reinterpret_cast<float*>(buf.data());
      for (long i = 0; i < n; ++i)
        for (int c = 0; c < channels; ++c)
          b[i * channels + c] = data[(long)c * frames + start + i];
    }
    if (std::fwrite(buf.data(), 1, (size_t)n * channels * bytes, f) !=
        (size_t)n * channels * bytes) {
      fclose(f); set_error("write failed"); return 3;
    }
  }
  fclose(f);
  return 0;
}

// Parallel batch decode: per-file status in the return-sense — entries
// with datas[i] == nullptr failed.  Overlaps host decode across files.
void wc_read_batch(const char** paths, int n, float** datas, int* channels,
                   long* frames, int* sample_rates, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* d = nullptr;
      int ch = 0, sr = 0;
      long fr = 0;
      if (wc_read(paths[i], &d, &ch, &fr, &sr) != 0) d = nullptr;
      datas[i] = d;
      channels[i] = ch;
      frames[i] = fr;
      sample_rates[i] = sr;
    }
  };
  std::vector<std::thread> pool;
  const int k = n < n_threads ? n : n_threads;
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}

}  // extern "C"
