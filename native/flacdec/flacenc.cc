// flacenc: clean-room FLAC encoder for knnsvc_tpu (write-side of the
// reference's pydub/ffmpeg flac export, lib_ongaku_test.py:118-143).
//
// Implemented from the FLAC format specification (RFC 9639): STREAMINFO +
// fixed-blocksize frames (4096), independent channels, 16-bit, subframes
// CONSTANT / FIXED(0-4) / VERBATIM chosen per block by cost, Rice residual
// coding (method 0, partition order 0, optimal parameter). Output round-trips
// bit-exactly through this repo's own decoder (flac.cc) and follows the spec
// closely enough for any conforming decoder (proper CRC-8/CRC-16, UTF-8
// frame numbers, STREAMINFO bounds).
//
// C ABI at the bottom (ctypes, see knnsvc_tpu/io/flac.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace flacenc {
namespace {

constexpr uint32_t kBlockSize = 4096;

class BitWriter {
 public:
  void put_bits(uint64_t value, int n) {
    for (int i = n - 1; i >= 0; --i) {
      cur_ = (cur_ << 1) | ((value >> i) & 1);
      if (++nbits_ == 8) {
        bytes_.push_back(cur_);
        cur_ = 0;
        nbits_ = 0;
      }
    }
  }
  void put_unary(uint32_t q) {
    for (uint32_t i = 0; i < q; ++i) put_bits(0, 1);
    put_bits(1, 1);
  }
  void align() {
    if (nbits_ != 0) put_bits(0, 8 - nbits_);
  }
  const std::vector<uint8_t>& bytes() const { return bytes_; }
  std::vector<uint8_t> take() { return std::move(bytes_); }

 private:
  std::vector<uint8_t> bytes_;
  uint8_t cur_ = 0;
  int nbits_ = 0;
};

uint8_t crc8(const uint8_t* data, size_t n) {  // poly x^8+x^2+x+1 (0x07)
  uint8_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= data[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? static_cast<uint8_t>((crc << 1) ^ 0x07)
                         : static_cast<uint8_t>(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* data, size_t n) {  // poly 0x8005
  uint16_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= static_cast<uint16_t>(data[i]) << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? static_cast<uint16_t>((crc << 1) ^ 0x8005)
                           : static_cast<uint16_t>(crc << 1);
  }
  return crc;
}

void put_utf8(BitWriter* bw, uint64_t v) {
  if (v < 0x80) {
    bw->put_bits(v, 8);
  } else if (v < 0x800) {
    bw->put_bits(0xC0 | (v >> 6), 8);
    bw->put_bits(0x80 | (v & 0x3F), 8);
  } else if (v < 0x10000) {
    bw->put_bits(0xE0 | (v >> 12), 8);
    bw->put_bits(0x80 | ((v >> 6) & 0x3F), 8);
    bw->put_bits(0x80 | (v & 0x3F), 8);
  } else if (v < 0x200000) {
    bw->put_bits(0xF0 | (v >> 18), 8);
    bw->put_bits(0x80 | ((v >> 12) & 0x3F), 8);
    bw->put_bits(0x80 | ((v >> 6) & 0x3F), 8);
    bw->put_bits(0x80 | (v & 0x3F), 8);
  } else {
    bw->put_bits(0xF8 | (v >> 24), 8);
    bw->put_bits(0x80 | ((v >> 18) & 0x3F), 8);
    bw->put_bits(0x80 | ((v >> 12) & 0x3F), 8);
    bw->put_bits(0x80 | ((v >> 6) & 0x3F), 8);
    bw->put_bits(0x80 | (v & 0x3F), 8);
  }
}

// Fixed-predictor residuals, order 0-4 (successive differencing).
void fixed_residual(const int32_t* x, uint32_t n, int order,
                    std::vector<int64_t>* res) {
  res->assign(x, x + n);
  for (int o = 0; o < order; ++o) {
    for (uint32_t i = n - 1; i >= static_cast<uint32_t>(o) + 1; --i)
      (*res)[i] -= (*res)[i - 1];
  }
}

inline uint64_t zigzag(int64_t r) {
  return (static_cast<uint64_t>(r) << 1) ^ static_cast<uint64_t>(r >> 63);
}

// Optimal Rice parameter (partition order 0) and the resulting bit cost.
uint64_t rice_cost(const std::vector<int64_t>& res, int order, int* best_k) {
  uint64_t best = UINT64_MAX;
  *best_k = 0;
  for (int k = 0; k <= 14; ++k) {
    uint64_t bits = 0;
    for (size_t i = order; i < res.size(); ++i) {
      bits += (zigzag(res[i]) >> k) + 1 + k;
      if (bits > best) break;
    }
    if (bits < best) {
      best = bits;
      *best_k = k;
    }
  }
  return best;
}

void write_subframe(BitWriter* bw, const int32_t* x, uint32_t n, int bps) {
  // constant?
  bool constant = true;
  for (uint32_t i = 1; i < n; ++i)
    if (x[i] != x[0]) {
      constant = false;
      break;
    }
  if (constant) {
    bw->put_bits(0, 1);       // zero pad
    bw->put_bits(0b000000, 6);  // CONSTANT
    bw->put_bits(0, 1);       // no wasted bits
    bw->put_bits(static_cast<uint32_t>(x[0]) & ((1u << bps) - 1), bps);
    return;
  }

  // pick the fixed order with the cheapest Rice coding
  std::vector<int64_t> res;
  std::vector<int64_t> best_res;
  uint64_t best_cost = UINT64_MAX;
  int best_order = 0, best_k = 0;
  const int max_order = n >= 5 ? 4 : static_cast<int>(n) - 1;
  for (int order = 0; order <= max_order; ++order) {
    fixed_residual(x, n, order, &res);
    int k;
    const uint64_t cost = rice_cost(res, order, &k) + order * bps;
    if (cost < best_cost) {
      best_cost = cost;
      best_order = order;
      best_k = k;
      best_res = res;
    }
  }

  if (best_cost >= static_cast<uint64_t>(n) * bps) {  // incompressible block
    bw->put_bits(0, 1);
    bw->put_bits(0b000001, 6);  // VERBATIM
    bw->put_bits(0, 1);
    for (uint32_t i = 0; i < n; ++i)
      bw->put_bits(static_cast<uint32_t>(x[i]) & ((1u << bps) - 1), bps);
    return;
  }

  bw->put_bits(0, 1);
  bw->put_bits(0b001000 | best_order, 6);  // FIXED
  bw->put_bits(0, 1);
  for (int i = 0; i < best_order; ++i)     // warmup samples
    bw->put_bits(static_cast<uint32_t>(x[i]) & ((1u << bps) - 1), bps);
  bw->put_bits(0, 2);                      // residual method 0 (4-bit Rice)
  bw->put_bits(0, 4);                      // partition order 0
  bw->put_bits(best_k, 4);
  for (uint32_t i = best_order; i < n; ++i) {
    const uint64_t z = zigzag(best_res[i]);
    bw->put_unary(static_cast<uint32_t>(z >> best_k));
    if (best_k) bw->put_bits(z & ((1u << best_k) - 1), best_k);
  }
}

void write_frame(std::vector<uint8_t>* out, uint64_t frame_index,
                 const std::vector<std::vector<int32_t>>& ch, uint32_t n,
                 int bps) {
  BitWriter bw;
  bw.put_bits(0b11111111111110, 14);  // sync
  bw.put_bits(0, 1);                  // reserved
  bw.put_bits(0, 1);                  // fixed blocksize stream
  const bool full = (n == kBlockSize);
  bw.put_bits(full ? 0b1100 : 0b0111, 4);  // 4096 or 16-bit at end
  bw.put_bits(0b0000, 4);                  // sample rate: from STREAMINFO
  bw.put_bits(static_cast<uint32_t>(ch.size() - 1), 4);  // independent
  bw.put_bits(0b100, 3);                   // 16 bits per sample
  bw.put_bits(0, 1);                       // reserved
  put_utf8(&bw, frame_index);
  if (!full) bw.put_bits(n - 1, 16);
  {
    const auto& hdr = bw.bytes();
    bw.put_bits(crc8(hdr.data(), hdr.size()), 8);
  }
  for (const auto& c : ch) write_subframe(&bw, c.data(), n, bps);
  bw.align();
  {
    const auto& body = bw.bytes();
    bw.put_bits(crc16(body.data(), body.size()), 16);
  }
  const auto frame = bw.take();
  out->insert(out->end(), frame.begin(), frame.end());
}

std::vector<uint8_t> encode(const int16_t* interleaved, uint64_t n_samples,
                            int channels, int sample_rate) {
  std::vector<uint8_t> out;
  out.reserve(n_samples * channels * 2 + 1024);

  // fLaC + STREAMINFO (last metadata block)
  const char magic[4] = {'f', 'L', 'a', 'C'};
  out.insert(out.end(), magic, magic + 4);
  BitWriter si;
  si.put_bits(1, 1);          // last metadata block
  si.put_bits(0, 7);          // STREAMINFO
  si.put_bits(34, 24);        // length
  si.put_bits(kBlockSize, 16);  // min blocksize
  si.put_bits(kBlockSize, 16);  // max blocksize
  si.put_bits(0, 24);         // min framesize unknown
  si.put_bits(0, 24);         // max framesize unknown
  si.put_bits(sample_rate, 20);
  si.put_bits(channels - 1, 3);
  si.put_bits(16 - 1, 5);     // bits per sample
  si.put_bits(n_samples & 0xFFFFFFFFFULL, 36);
  for (int i = 0; i < 16; ++i) si.put_bits(0, 8);  // MD5 unknown
  {
    const auto b = si.take();
    out.insert(out.end(), b.begin(), b.end());
  }

  std::vector<std::vector<int32_t>> ch(channels);
  uint64_t pos = 0, frame_index = 0;
  while (pos < n_samples) {
    const uint32_t n = static_cast<uint32_t>(
        std::min<uint64_t>(kBlockSize, n_samples - pos));
    for (int c = 0; c < channels; ++c) {
      ch[c].resize(n);
      for (uint32_t i = 0; i < n; ++i)
        ch[c][i] = interleaved[(pos + i) * channels + c];
    }
    write_frame(&out, frame_index++, ch, n, 16);
    pos += n;
  }
  return out;
}

std::vector<uint8_t> g_result;  // per-call scratch (single-threaded ctypes use)

}  // namespace

extern "C" {

// Encode interleaved 16-bit PCM to FLAC. Returns the encoded size; call
// flacenc_copy to fetch the bytes. Returns 0 on invalid input.
uint64_t flacenc_encode16(const int16_t* interleaved, uint64_t n_samples,
                          int channels, int sample_rate) {
  if (!interleaved || n_samples == 0 || channels < 1 || channels > 8 ||
      sample_rate <= 0 || sample_rate >= (1 << 20))
    return 0;
  g_result = encode(interleaved, n_samples, channels, sample_rate);
  return g_result.size();
}

void flacenc_copy(uint8_t* dst, uint64_t n) {
  std::memcpy(dst, g_result.data(),
              std::min<uint64_t>(n, g_result.size()));
  g_result.clear();
  g_result.shrink_to_fit();
}

}  // extern "C"

}  // namespace flacenc
