// dataio: native audio decode + resample for the input pipeline.
//
// The reference framework's hot CPU path (wav decode, resampling) lives
// in torchaudio's C++ (SURVEY §2.9); this is the TPU build's native
// equivalent: a small, dependency-free shared library exposed to Python
// via ctypes (vae_gslm_tpu/data/native.py), with a numpy fallback.
//
//   wav_read       — RIFF/WAVE parse (PCM 8/16/24/32, float32/64),
//                    mixdown to mono float32.
//   resample_sinc  — polyphase windowed-sinc resampling between the
//                    supported rate pool (matches scipy resample_poly
//                    semantics closely; kaiser-windowed sinc).
//   mel_frames     — frame+window a signal for the STFT frontend
//                    (gather done on CPU so the TPU receives dense
//                    frame matrices when streaming host-side features).
//
// Build: g++ -O3 -march=native -shared -fPIC dataio.cc -o libdataio.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- wav io
// Returns 0 on success; fills *sr and *n_out (samples written, mono).
// out may be null to query the required size via *n_out.
int wav_read(const char* path, float* out, int64_t max_samples,
             int32_t* sr_out, int64_t* n_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  int64_t data_size = -1;
  long data_pos = -1;
  uint8_t chunk[8];
  while (std::fread(chunk, 1, 8, f) == 8) {
    uint32_t size;
    std::memcpy(&size, chunk + 4, 4);
    if (!std::memcmp(chunk, "fmt ", 4)) {
      std::vector<uint8_t> buf(size);
      if (std::fread(buf.data(), 1, size, f) != size) break;
      std::memcpy(&fmt, buf.data(), 2);
      std::memcpy(&channels, buf.data() + 2, 2);
      std::memcpy(&sr, buf.data() + 4, 4);
      std::memcpy(&bits, buf.data() + 14, 2);
    } else if (!std::memcmp(chunk, "data", 4)) {
      data_pos = std::ftell(f);
      data_size = size;
      std::fseek(f, (long)((size + 1) & ~1u), SEEK_CUR);
    } else {
      std::fseek(f, (long)((size + 1) & ~1u), SEEK_CUR);
    }
  }
  if (data_pos < 0 || !channels || !bits || (fmt != 1 && fmt != 3)) {
    std::fclose(f);
    return -3;
  }
  const int bytes = bits / 8;
  const int64_t frames = data_size / (bytes * channels);
  *sr_out = (int32_t)sr;
  *n_out = frames;
  if (!out) {
    std::fclose(f);
    return 0;
  }
  if (frames > max_samples) {
    std::fclose(f);
    return -4;
  }
  std::fseek(f, data_pos, SEEK_SET);
  std::vector<uint8_t> raw((size_t)data_size);
  if ((int64_t)std::fread(raw.data(), 1, (size_t)data_size, f) !=
      data_size) {
    std::fclose(f);
    return -5;
  }
  std::fclose(f);
  const double inv_ch = 1.0 / channels;
  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = raw.data() + (size_t)(i * channels + c) * bytes;
      double v = 0.0;
      if (fmt == 3 && bits == 32) {
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (fmt == 3 && bits == 64) {
        double dv;
        std::memcpy(&dv, p, 8);
        v = dv;
      } else if (bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = s / 32768.0;
      } else if (bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = s / 2147483648.0;
      } else if (bits == 24) {
        int32_t s = (int32_t)((p[0] << 8) | (p[1] << 16) | (p[2] << 24))
                    >> 8;
        v = s / 8388608.0;
      } else if (bits == 8) {
        v = ((int)p[0] - 128) / 128.0;
      } else {
        return -6;
      }
      acc += v;
    }
    out[i] = (float)(acc * inv_ch);
  }
  return 0;
}

// ----------------------------------------------------------- resampling
static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

static int64_t gcd64(int64_t a, int64_t b) {
  while (b) {
    int64_t t = a % b;
    a = b;
    b = t;
  }
  return a;
}

// Polyphase kaiser-windowed-sinc resampler: up by L, down by M.
// Returns number of output samples, or <0 on error.
int64_t resample_sinc(const float* in, int64_t n_in, int32_t sr_in,
                      int32_t sr_out, float* out, int64_t max_out) {
  if (sr_in == sr_out) {
    if (n_in > max_out) return -1;
    std::memcpy(out, in, sizeof(float) * (size_t)n_in);
    return n_in;
  }
  const int64_t g = gcd64(sr_in, sr_out);
  const int64_t L = sr_out / g, M = sr_in / g;
  const int64_t n_out = (n_in * L + M - 1) / M;
  if (n_out > max_out) return -1;
  // Filter: cutoff at min(1/L, 1/M) of Nyquist, half-width 10 zero
  // crossings, beta 8.6 (scipy resample_poly kaiser_fast-ish quality).
  const double cutoff = 1.0 / (double)(L > M ? L : M);
  const int half = (int)(10 * (L > M ? L : M));
  const double beta = 8.6;
  const double i0b = bessel_i0(beta);
  std::vector<double> taps(2 * half + 1);
  for (int i = -half; i <= half; ++i) {
    double x = (double)i;
    double sinc = (i == 0) ? cutoff
                           : std::sin(M_PI * cutoff * x) / (M_PI * x);
    double w = i0b > 0
                   ? bessel_i0(beta * std::sqrt(1.0 - (x / half) * (x / half)))
                         / i0b
                   : 1.0;
    taps[(size_t)(i + half)] = L * sinc * w;
  }
  for (int64_t j = 0; j < n_out; ++j) {
    // Output j corresponds to upsampled index j*M; input index
    // (j*M - k)/L for taps where (j*M - k) divisible by L.
    const int64_t up_center = j * M;
    double acc = 0.0;
    // Iterate input samples contributing: i such that
    // |up_center - i*L| <= half.
    int64_t i_lo = (up_center - half + L - 1) / L;
    int64_t i_hi = (up_center + half) / L;
    if (i_lo < 0) i_lo = 0;
    if (i_hi >= n_in) i_hi = n_in - 1;
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      const int64_t d = up_center - i * L;
      acc += taps[(size_t)(d + half)] * in[i];
    }
    out[j] = (float)acc;
  }
  return n_out;
}

// --------------------------------------------------------- mel framing
// Frame a padded signal into (n_frames, frame_len) with hop; reflect
// padding of pad samples on both sides is applied here so Python hands
// over the raw signal only.
int64_t mel_frames(const float* in, int64_t n_in, int32_t frame_len,
                   int32_t hop, int32_t pad, float* out,
                   int64_t max_frames) {
  const int64_t padded = n_in + 2 * (int64_t)pad;
  if (padded < frame_len) return 0;
  const int64_t n_frames = 1 + (padded - frame_len) / hop;
  if (n_frames > max_frames) return -1;
  auto sample = [&](int64_t idx) -> float {
    // reflect (no repeated edge), torch 'reflect' semantics
    int64_t i = idx - pad;
    if (i < 0) i = -i;
    if (i >= n_in) i = 2 * (n_in - 1) - i;
    if (i < 0) i = 0;
    return in[i];
  };
  for (int64_t fidx = 0; fidx < n_frames; ++fidx) {
    const int64_t start = fidx * hop;
    float* dst = out + fidx * frame_len;
    for (int32_t k = 0; k < frame_len; ++k)
      dst[k] = sample(start + k);
  }
  return n_frames;
}

}  // extern "C"
