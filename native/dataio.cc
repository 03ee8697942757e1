// dataio: native audio decode + resample for the input pipeline.
//
// The reference framework's hot CPU path (wav decode, resampling) lives
// in torchaudio's C++ (SURVEY §2.9); this is the TPU build's native
// equivalent: a small, dependency-free shared library exposed to Python
// via ctypes (vae_gslm_tpu/data/native.py), with a numpy fallback.
//
//   wav_read       — RIFF/WAVE parse (PCM 8/16/24/32, float32/64),
//                    mixdown to mono float32.
//   flac_read      — native FLAC decoder (constant/verbatim/fixed/LPC
//                    subframes, Rice/Rice2 residuals, L-S/R-S/M-S
//                    stereo decorrelation, wasted bits), mixdown to
//                    mono float32.  The reference decodes LibriSpeech
//                    .flac via torchaudio's C++ (data/dataset.py:183);
//                    this image ships no codec libraries, so the
//                    decoder is implemented here from the format spec.
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

// ------------------------------------------------------------- flac io
namespace flac {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)
  bool fail = false;

  uint64_t bits(int n) {  // n <= 57
    uint64_t v = 0;
    while (n > 0) {
      if (byte >= size) {
        fail = true;
        return 0;
      }
      int avail = 8 - bit;
      int take = n < avail ? n : avail;
      int shift = avail - take;
      v = (v << take) | ((data[byte] >> shift) & ((1u << take) - 1));
      bit += take;
      n -= take;
      if (bit == 8) {
        bit = 0;
        ++byte;
      }
    }
    return v;
  }
  int64_t sbits(int n) {  // sign-extended
    uint64_t v = bits(n);
    if (n > 0 && (v >> (n - 1)) & 1) v |= ~((1ull << n) - 1);
    return (int64_t)v;
  }
  uint32_t unary() {
    uint32_t q = 0;
    while (!fail && bits(1) == 0) {
      if (++q > 1u << 24) {  // corrupt stream guard
        fail = true;
        break;
      }
    }
    return q;
  }
  void align() {
    if (bit) {
      bit = 0;
      ++byte;
    }
  }
};

// UTF-8-style coded number in frame headers (up to 36 bits).  A
// leading byte with (1 + extra) leading ones is followed by `extra`
// continuation bytes; payload bits in the lead byte = 6 - extra.
static uint64_t utf8_number(BitReader& br) {
  uint64_t b0 = br.bits(8);
  if (b0 < 0x80) return b0;
  int extra = 0;
  for (uint64_t m = 0x40; m && (b0 & m); m >>= 1) ++extra;
  uint64_t v = extra < 6 ? (b0 & ((1u << (6 - extra)) - 1)) : 0;
  for (int i = 0; i < extra; ++i)
    v = (v << 6) | (br.bits(8) & 0x3F);
  return v;
}

// Rice/verbatim residual into res[0..n-1] (n excludes warmup).
static bool residual(BitReader& br, int64_t* res, int64_t block,
                     int order) {
  int method = (int)br.bits(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  int po = (int)br.bits(4);
  int64_t parts = 1ll << po;
  if (block % parts || block / parts <= order) return false;
  int64_t idx = 0;
  for (int64_t p = 0; p < parts; ++p) {
    int64_t count = block / parts - (p == 0 ? order : 0);
    uint32_t param = (uint32_t)br.bits(pbits);
    if (param == escape) {
      int rb = (int)br.bits(5);
      for (int64_t i = 0; i < count; ++i)
        res[idx++] = rb ? br.sbits(rb) : 0;
    } else {
      for (int64_t i = 0; i < count; ++i) {
        uint64_t q = br.unary();
        uint64_t r = param ? br.bits(param) : 0;
        uint64_t u = (q << param) | r;
        res[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    if (br.fail) return false;
  }
  return true;
}

// One subframe -> out[0..block-1] (channel samples, pre-decorrelation).
static bool subframe(BitReader& br, int64_t* out, int64_t block,
                     int bps) {
  if (br.bits(1) != 0) return false;  // padding bit
  int type = (int)br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = (int)br.unary() + 1;
  bps -= wasted;
  if (bps <= 0 || br.fail) return false;
  if (type == 0) {  // CONSTANT
    int64_t v = br.sbits(bps);
    for (int64_t i = 0; i < block; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int64_t i = 0; i < block; ++i) out[i] = br.sbits(bps);
  } else if ((type & 0x38) == 0x08 && (type & 7) <= 4) {  // FIXED
    int order = type & 7;
    for (int i = 0; i < order; ++i) out[i] = br.sbits(bps);
    if (!residual(br, out + order, block, order)) return false;
    for (int64_t i = order; i < block; ++i) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4:
          p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
              out[i - 4];
          break;
      }
      out[i] += p;
    }
  } else if (type & 0x20) {  // LPC
    int order = (type & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.sbits(bps);
    int prec = (int)br.bits(4) + 1;
    if (prec == 16) return false;  // 1111 invalid
    int shift = (int)br.sbits(5);
    if (shift < 0) return false;
    int64_t coef[32];
    for (int i = 0; i < order; ++i) coef[i] = br.sbits(prec);
    if (!residual(br, out + order, block, order)) return false;
    for (int64_t i = order; i < block; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted)
    for (int64_t i = 0; i < block; ++i) out[i] <<= wasted;
  return !br.fail;
}

}  // namespace flac

// Decode a FLAC file to mono float32 (averaged channels).  Same
// contract as wav_read: out == null queries sizes via *n_out.
int flac_read(const char* path, float* out, int64_t max_samples,
              int32_t* sr_out, int64_t* n_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)fsize);
  if ((long)std::fread(buf.data(), 1, (size_t)fsize, f) != fsize) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  flac::BitReader br{buf.data(), buf.size()};
  if (br.bits(32) != 0x664C6143u) return -2;  // "fLaC"
  uint32_t stream_sr = 0;
  int stream_ch = 0, stream_bps = 0;
  uint64_t total = 0;
  bool have_info = false;
  for (bool last = false; !last && !br.fail;) {
    last = br.bits(1);
    int type = (int)br.bits(7);
    uint32_t len = (uint32_t)br.bits(24);
    if (type == 0 && len >= 34) {  // STREAMINFO
      br.bits(16);  // min block
      br.bits(16);  // max block
      br.bits(24);  // min frame
      br.bits(24);  // max frame
      stream_sr = (uint32_t)br.bits(20);
      stream_ch = (int)br.bits(3) + 1;
      stream_bps = (int)br.bits(5) + 1;
      total = br.bits(36);
      // 18 bytes of fields consumed above; skip MD5 + any extension.
      for (uint32_t i = 18; i < len; ++i) br.bits(8);
      have_info = true;
    } else {
      for (uint32_t i = 0; i < len; ++i) br.bits(8);
    }
  }
  if (!have_info || br.fail || !stream_sr || stream_ch < 1 ||
      stream_ch > 8)
    return -3;
  *sr_out = (int32_t)stream_sr;
  if (!out) {
    // total==0 is legal (unknown); decode below would be needed, but
    // for the query path report what STREAMINFO says.
    *n_out = (int64_t)total;
    if (total != 0) return 0;
  }
  const double scale = 1.0 / (double)(1ll << (stream_bps - 1));
  std::vector<int64_t> ch[8];
  int64_t written = 0;
  while (!br.fail && br.byte < br.size - 2) {
    if (br.bits(14) != 0x3FFE) return -4;  // frame sync
    br.bits(1);                            // reserved
    br.bits(1);                            // blocking strategy
    int bs_code = (int)br.bits(4);
    int sr_code = (int)br.bits(4);
    int ch_code = (int)br.bits(4);
    int sz_code = (int)br.bits(3);
    br.bits(1);  // reserved
    flac::utf8_number(br);
    int64_t block;
    switch (bs_code) {
      case 1: block = 192; break;
      case 2: case 3: case 4: case 5:
        block = 576ll << (bs_code - 2); break;
      case 6: block = (int64_t)br.bits(8) + 1; break;
      case 7: block = (int64_t)br.bits(16) + 1; break;
      default:
        if (bs_code >= 8) block = 256ll << (bs_code - 8);
        else return -5;
    }
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    int bps = stream_bps;
    switch (sz_code) {
      case 0: break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -6;
    }
    br.bits(8);  // header CRC-8 (not verified)
    int nch = ch_code < 8 ? ch_code + 1 : 2;
    if (ch_code > 10) return -7;
    for (int c = 0; c < nch; ++c) {
      int cbps = bps;
      // The side channel carries one extra bit.
      if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
          (ch_code == 10 && c == 1))
        cbps += 1;
      ch[c].assign((size_t)block, 0);
      if (!flac::subframe(br, ch[c].data(), block, cbps)) return -8;
    }
    br.align();
    br.bits(16);  // frame CRC-16 (not verified)
    if (br.fail) return -9;
    // Stereo decorrelation.
    if (ch_code == 8) {  // left/side: R = L - side
      for (int64_t i = 0; i < block; ++i)
        ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_code == 9) {  // right/side: L = R + side
      for (int64_t i = 0; i < block; ++i) {
        int64_t r = ch[1][i];
        ch[1][i] = r;
        ch[0][i] = r + ch[0][i];
      }
    } else if (ch_code == 10) {  // mid/side
      for (int64_t i = 0; i < block; ++i) {
        int64_t mid = (ch[0][i] << 1) | (ch[1][i] & 1);
        int64_t side = ch[1][i];
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }
    int64_t take = block;
    if (total && written + take > (int64_t)total)
      take = (int64_t)total - written;  // last-frame padding guard
    if (out) {
      if (written + take > max_samples) return -10;
      const double inv = 1.0 / nch;
      for (int64_t i = 0; i < take; ++i) {
        double acc = 0.0;
        for (int c = 0; c < nch; ++c) acc += (double)ch[c][i];
        out[written + i] = (float)(acc * inv * scale);
      }
    }
    written += take;
    if (total && written >= (int64_t)total) break;
  }
  *n_out = written;
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
