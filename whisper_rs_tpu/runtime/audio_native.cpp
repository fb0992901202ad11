// Native audio ingest runtime: container decode -> mono f32 -> 16 kHz.
//
// TPU-native equivalent of the reference's native audio layer
// (symphonia container/codec decode + rubato FFT resampling,
// /root/reference/src/audio.rs:20-173).  Exposed over a minimal C ABI and
// loaded from Python with ctypes (runtime/native.py).
//
// Formats: WAV (PCM 8/16/24/32 + IEEE float) parsed directly; MP3 decoded
// through libmpg123 when present (dlopen'd at runtime — no build-time dep).
// Downmix: channel mean (audio.rs:123-131).  Resampler: Hann-windowed-sinc
// polyphase evaluated per output sample — band-limited 16 kHz out, the same
// observable contract as the reference's FftFixedIn path.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <dlfcn.h>

namespace {

thread_local std::string g_error;

constexpr int kTargetRate = 16000;

void set_error(const std::string& e) { g_error = e; }

// ---------------------------------------------------------------------------
// resampler: windowed-sinc, evaluated per output sample
// ---------------------------------------------------------------------------

std::vector<float> resample(const std::vector<float>& in, int sr_in, int sr_out) {
  if (sr_in == sr_out) return in;
  const double ratio = static_cast<double>(sr_in) / sr_out;
  const double cutoff = 0.95 * std::min(1.0, static_cast<double>(sr_out) / sr_in);
  const int half = 24;  // half-width in input samples at the lower rate
  const int64_t n_out =
      static_cast<int64_t>(static_cast<double>(in.size()) * sr_out / sr_in);
  std::vector<float> out(n_out);

  const int64_t n_in = static_cast<int64_t>(in.size());
  for (int64_t n = 0; n < n_out; ++n) {
    const double t = n * ratio;
    const int64_t i0 = static_cast<int64_t>(std::floor(t));
    const double frac = t - i0;
    double acc = 0.0;
    for (int k = -half + 1; k <= half; ++k) {
      const int64_t idx = i0 + k;
      if (idx < 0 || idx >= n_in) continue;
      const double u = k - frac;                     // distance in input samples
      const double x = cutoff * u;
      double s = (std::abs(x) < 1e-9) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
      const double w = 0.5 * (1.0 + std::cos(M_PI * u / half));  // Hann
      acc += in[idx] * s * cutoff * w;
    }
    out[n] = static_cast<float>(acc);
  }
  return out;
}

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------

bool parse_wav(const std::vector<uint8_t>& data, std::vector<float>* mono,
               int* sample_rate) {
  if (data.size() < 44 || std::memcmp(data.data(), "RIFF", 4) != 0 ||
      std::memcmp(data.data() + 8, "WAVE", 4) != 0) {
    set_error("not a RIFF/WAVE file");
    return false;
  }
  size_t pos = 12;
  uint16_t fmt_tag = 0, n_ch = 0, bits = 0;
  uint32_t sr = 0, sub_format = 0;
  const uint8_t* samples = nullptr;
  size_t samples_len = 0;

  while (pos + 8 <= data.size()) {
    const char* cid = reinterpret_cast<const char*>(data.data() + pos);
    uint32_t size;
    std::memcpy(&size, data.data() + pos + 4, 4);
    if (pos + 8 + size > data.size()) size = data.size() - pos - 8;
    const uint8_t* body = data.data() + pos + 8;
    if (std::memcmp(cid, "fmt ", 4) == 0 && size >= 16) {
      std::memcpy(&fmt_tag, body, 2);
      std::memcpy(&n_ch, body + 2, 2);
      std::memcpy(&sr, body + 4, 4);
      std::memcpy(&bits, body + 14, 2);
      // WAVE_FORMAT_EXTENSIBLE: SubFormat GUID data1 at fmt offset 24
      // (KSDATAFORMAT_SUBTYPE_PCM = 1, _IEEE_FLOAT = 3)
      if (size >= 40) std::memcpy(&sub_format, body + 24, 4);
    } else if (std::memcmp(cid, "data", 4) == 0) {
      samples = body;
      samples_len = size;
    }
    pos += 8 + size + (size & 1);
  }
  if (!samples || n_ch == 0 || sr == 0) {
    set_error("missing fmt/data chunk");
    return false;
  }
  if (fmt_tag == 0xFFFE) {
    if (sub_format != 1 && sub_format != 3) {
      set_error("unsupported WAVE_FORMAT_EXTENSIBLE SubFormat");
      return false;
    }
    fmt_tag = static_cast<uint16_t>(sub_format);
  }

  std::vector<float> interleaved;
  if (fmt_tag == 1) {  // PCM
    if (bits == 16) {
      const int16_t* p = reinterpret_cast<const int16_t*>(samples);
      size_t n = samples_len / 2;
      interleaved.resize(n);
      for (size_t i = 0; i < n; ++i) interleaved[i] = p[i] / 32768.0f;
    } else if (bits == 8) {
      interleaved.resize(samples_len);
      for (size_t i = 0; i < samples_len; ++i)
        interleaved[i] = (samples[i] - 128) / 128.0f;
    } else if (bits == 32) {
      const int32_t* p = reinterpret_cast<const int32_t*>(samples);
      size_t n = samples_len / 4;
      interleaved.resize(n);
      for (size_t i = 0; i < n; ++i) interleaved[i] = p[i] / 2147483648.0f;
    } else if (bits == 24) {
      size_t n = samples_len / 3;
      interleaved.resize(n);
      for (size_t i = 0; i < n; ++i) {
        int32_t v = samples[3 * i] | (samples[3 * i + 1] << 8) |
                    (samples[3 * i + 2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        interleaved[i] = v / 8388608.0f;
      }
    } else {
      set_error("unsupported PCM bit depth");
      return false;
    }
  } else if (fmt_tag == 3) {  // IEEE float
    if (bits == 32) {
      const float* p = reinterpret_cast<const float*>(samples);
      interleaved.assign(p, p + samples_len / 4);
    } else if (bits == 64) {
      const double* p = reinterpret_cast<const double*>(samples);
      size_t n = samples_len / 8;
      interleaved.resize(n);
      for (size_t i = 0; i < n; ++i) interleaved[i] = static_cast<float>(p[i]);
    } else {
      set_error("unsupported float bit depth");
      return false;
    }
  } else {
    set_error("unsupported WAV format tag");
    return false;
  }

  const size_t frames = interleaved.size() / n_ch;
  mono->resize(frames);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0;
    for (int c = 0; c < n_ch; ++c) acc += interleaved[i * n_ch + c];
    (*mono)[i] = static_cast<float>(acc / n_ch);
  }
  *sample_rate = static_cast<int>(sr);
  return true;
}

// ---------------------------------------------------------------------------
// MP3 via dlopen'd libmpg123 (optional at runtime)
// ---------------------------------------------------------------------------

struct Mpg123Api {
  void* lib = nullptr;
  int (*init)() = nullptr;
  void* (*newh)(const char*, int*) = nullptr;
  int (*open)(void*, const char*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*format_none)(void*) = nullptr;
  int (*format)(void*, long, int, int) = nullptr;
  int (*read)(void*, unsigned char*, size_t, size_t*) = nullptr;
  int (*close)(void*) = nullptr;
  void (*del)(void*) = nullptr;

  bool load() {
    if (lib) return true;
    lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!lib) return false;
    init = reinterpret_cast<decltype(init)>(dlsym(lib, "mpg123_init"));
    newh = reinterpret_cast<decltype(newh)>(dlsym(lib, "mpg123_new"));
    open = reinterpret_cast<decltype(open)>(dlsym(lib, "mpg123_open"));
    getformat =
        reinterpret_cast<decltype(getformat)>(dlsym(lib, "mpg123_getformat"));
    format_none =
        reinterpret_cast<decltype(format_none)>(dlsym(lib, "mpg123_format_none"));
    format = reinterpret_cast<decltype(format)>(dlsym(lib, "mpg123_format"));
    read = reinterpret_cast<decltype(read)>(dlsym(lib, "mpg123_read"));
    close = reinterpret_cast<decltype(close)>(dlsym(lib, "mpg123_close"));
    del = reinterpret_cast<decltype(del)>(dlsym(lib, "mpg123_delete"));
    return init && newh && open && getformat && format_none && format && read &&
           close && del;
  }
};

constexpr int kMpg123EncFloat32 = 0x200;
constexpr int kMpg123Done = -12;

bool decode_mp3(const char* path, std::vector<float>* mono, int* sample_rate) {
  static Mpg123Api api;
  if (!api.load()) {
    set_error("libmpg123 not available for mp3 decode");
    return false;
  }
  api.init();
  int err = 0;
  void* h = api.newh(nullptr, &err);
  if (!h) {
    set_error("mpg123_new failed");
    return false;
  }
  bool ok = false;
  long rate = 0;
  int channels = 0, enc = 0;
  std::vector<float> interleaved;
  if (api.open(h, path) == 0 && api.getformat(h, &rate, &channels, &enc) == 0) {
    api.format_none(h);
    api.format(h, rate, channels, kMpg123EncFloat32);
    std::vector<unsigned char> buf(1 << 16);
    size_t done = 0;
    int r;
    while ((r = api.read(h, buf.data(), buf.size(), &done)) == 0 || done > 0) {
      const float* p = reinterpret_cast<const float*>(buf.data());
      interleaved.insert(interleaved.end(), p, p + done / sizeof(float));
      if (r == kMpg123Done) break;
      if (r != 0 && done == 0) break;
      done = 0;
    }
    ok = !interleaved.empty();
    if (!ok) set_error("mp3 decode produced no samples");
  } else {
    set_error("mpg123 open/getformat failed");
  }
  api.close(h);
  api.del(h);
  if (!ok) return false;

  const size_t frames = interleaved.size() / channels;
  mono->resize(frames);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0;
    for (int c = 0; c < channels; ++c) acc += interleaved[i * channels + c];
    (*mono)[i] = static_cast<float>(acc / channels);
  }
  *sample_rate = static_cast<int>(rate);
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    set_error("failed to open file");
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(size);
  size_t got = std::fread(out->data(), 1, size, f);
  std::fclose(f);
  if (static_cast<long>(got) != size) {
    set_error("short read");
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Decode any supported file to mono f32 @16 kHz.  Returns 0 on success;
// caller frees *out with wr_free.
int wr_load_audio(const char* path, float** out, int64_t* out_len) {
  std::vector<float> mono;
  int sr = 0;

  const char* dot = std::strrchr(path, '.');
  const bool is_mp3 = dot && (std::strcmp(dot, ".mp3") == 0);

  if (is_mp3) {
    if (!decode_mp3(path, &mono, &sr)) return -1;
  } else {
    std::vector<uint8_t> data;
    if (!read_file(path, &data)) return -1;
    if (!parse_wav(data, &mono, &sr)) return -1;
  }

  std::vector<float> res = resample(mono, sr, kTargetRate);
  *out_len = static_cast<int64_t>(res.size());
  *out = static_cast<float*>(std::malloc(res.size() * sizeof(float)));
  std::memcpy(*out, res.data(), res.size() * sizeof(float));
  return 0;
}

// Standalone resampler (for tests / pipelines with raw PCM input).
int wr_resample(const float* in, int64_t n, int sr_in, int sr_out, float** out,
                int64_t* out_len) {
  std::vector<float> v(in, in + n);
  std::vector<float> res = resample(v, sr_in, sr_out);
  *out_len = static_cast<int64_t>(res.size());
  *out = static_cast<float*>(std::malloc(res.size() * sizeof(float)));
  std::memcpy(*out, res.data(), res.size() * sizeof(float));
  return 0;
}

void wr_free(float* p) { std::free(p); }

const char* wr_last_error() { return g_error.c_str(); }

}  // extern "C"
