// flacdec: clean-room FLAC decoder for knnsvc_tpu.
//
// The reference reads .flac datasets (LibriSpeech) through libsndfile/ffmpeg;
// neither exists in this image, so this implements the FLAC bitstream format
// (https://xiph.org/flac/format.html) directly: STREAMINFO metadata, frame
// headers (UTF-8 coded numbers, all block-size/sample-rate codes), stereo
// decorrelation (left/right/mid-side), subframe types CONSTANT / VERBATIM /
// FIXED(0-4) / LPC(1-32), wasted bits, and Rice-coded residual partitions
// (methods 0 and 1, escape to verbatim). CRCs are not verified (decode-only
// use on trusted local datasets).
//
// C ABI at the bottom (ctypes): two-call protocol — probe for sizes, then
// decode into caller-allocated int32 interleaved buffer.

#include <cstdint>
#include <cstring>
#include <vector>

namespace flacdec {
namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // bits consumed of current byte (0..7)
  bool error = false;

  bool aligned_eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) {
      error = true;
      return 0;
    }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) {
      bit_pos = 0;
      ++byte_pos;
    }
    return b;
  }

  uint64_t read_bits(int n) {  // n <= 57
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    if (n == 0) return 0;
    uint64_t v = read_bits(n);
    // sign-extend
    if (v & (1ull << (n - 1))) v |= ~((1ull << n) - 1);
    return static_cast<int64_t>(v);
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!error && read_bit() == 0) ++q;
    return q;
  }

  void align() {
    if (bit_pos != 0) {
      bit_pos = 0;
      ++byte_pos;
    }
  }
};

// UTF-8-style coded number in frame headers (up to 56 bits).
uint64_t read_utf8_number(BitReader& br) {
  uint64_t b0 = br.read_bits(8);
  if ((b0 & 0x80) == 0) return b0;
  int n_extra = 0;
  uint64_t mask = 0x40;
  while (b0 & mask) {
    ++n_extra;
    mask >>= 1;
  }
  uint64_t v = b0 & (mask - 1);
  for (int i = 0; i < n_extra; ++i) {
    uint64_t b = br.read_bits(8);
    if ((b & 0xC0) != 0x80) {
      br.error = true;
      return 0;
    }
    v = (v << 6) | (b & 0x3F);
  }
  return v;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bits_per_sample = 0;
  uint64_t total_samples = 0;
  size_t audio_start = 0;  // byte offset of first frame
};

bool parse_streaminfo(const uint8_t* data, size_t size, StreamInfo* si) {
  if (size < 8 || std::memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  bool last = false;
  while (!last && pos + 4 <= size) {
    uint8_t hdr = data[pos];
    last = hdr & 0x80;
    int type = hdr & 0x7F;
    uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (type == 0 && len >= 34 && pos + 34 <= size) {
      const uint8_t* p = data + pos;
      si->sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      si->channels = ((p[12] >> 1) & 0x7) + 1;
      si->bits_per_sample = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si->total_samples = (static_cast<uint64_t>(p[13] & 0x0F) << 32) |
                          (static_cast<uint64_t>(p[14]) << 24) | (p[15] << 16) |
                          (p[16] << 8) | p[17];
    }
    pos += len;
  }
  si->audio_start = pos;
  return si->sample_rate != 0 && pos < size;
}

// Rice/residual decode into warmup-filled buffer positions [order, block).
bool decode_residual(BitReader& br, int order, uint32_t block_size,
                     std::vector<int64_t>& out) {
  uint32_t method = static_cast<uint32_t>(br.read_bits(2));
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t partition_order = static_cast<uint32_t>(br.read_bits(4));
  uint32_t n_partitions = 1u << partition_order;
  if (block_size % n_partitions != 0) return false;
  uint32_t samples_per_part = block_size >> partition_order;
  // first partition holds samples_per_part - order samples; malformed
  // streams with order > samples_per_part would underflow the unsigned
  // count into an unbounded out-of-bounds write
  if (samples_per_part <= static_cast<uint32_t>(order)) return false;

  uint32_t idx = order;
  for (uint32_t p = 0; p < n_partitions; ++p) {
    uint32_t count = samples_per_part - (p == 0 ? order : 0);
    uint32_t param = static_cast<uint32_t>(br.read_bits(param_bits));
    if (param == escape) {
      int raw_bits = static_cast<int>(br.read_bits(5));
      for (uint32_t i = 0; i < count; ++i) out[idx++] = br.read_signed(raw_bits);
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t r = param ? br.read_bits(param) : 0;
        uint64_t u = (static_cast<uint64_t>(q) << param) | r;
        out[idx++] = (u & 1) ? -static_cast<int64_t>(u >> 1) - 1
                             : static_cast<int64_t>(u >> 1);
      }
    }
    if (br.error) return false;
  }
  return idx == block_size;
}


bool decode_subframe(BitReader& br, uint32_t block_size, int bps,
                     std::vector<int64_t>& out) {
  if (br.read_bit() != 0) return false;  // padding bit
  uint32_t type = static_cast<uint32_t>(br.read_bits(6));
  int wasted = 0;
  if (br.read_bit()) {  // wasted bits flag: unary count - 1
    wasted = 1 + static_cast<int>(br.read_unary());
  }
  int eff_bps = bps - wasted;
  out.assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(eff_bps);
    for (uint32_t i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < block_size; ++i) out[i] = br.read_signed(eff_bps);
  } else if (type >= 8 && type <= 12) {  // FIXED order 0-4
    int order = type - 8;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(eff_bps);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t pred = 0;
      switch (order) {
        case 0: pred = 0; break;
        case 1: pred = out[i - 1]; break;
        case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
        case 3: pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4]; break;
      }
      out[i] += pred;  // residual already stored at out[i]
    }
  } else if (type >= 32) {  // LPC, order = (type & 31) + 1
    int order = static_cast<int>(type & 31) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(eff_bps);
    int precision = static_cast<int>(br.read_bits(4)) + 1;
    if (precision == 16) return false;  // invalid code 1111
    int shift = static_cast<int>(br.read_signed(5));
    if (shift < 0) return false;
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; ++i) coefs[i] = br.read_signed(precision);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coefs[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted) {
    for (uint32_t i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return !br.error;
}

struct FrameInfo {
  uint32_t block_size = 0;
  int channels = 0;
  int channel_assignment = 0;  // 0-7 independent; 8 L/S; 9 R/S; 10 M/S
  int bps = 0;
};

bool decode_frame_header(BitReader& br, const StreamInfo& si, FrameInfo* fi) {
  uint64_t sync = br.read_bits(14);
  if (sync != 0x3FFE) return false;
  br.read_bit();                      // reserved
  br.read_bit();                      // blocking strategy
  uint32_t bs_code = static_cast<uint32_t>(br.read_bits(4));
  uint32_t sr_code = static_cast<uint32_t>(br.read_bits(4));
  uint32_t ch_code = static_cast<uint32_t>(br.read_bits(4));
  uint32_t ss_code = static_cast<uint32_t>(br.read_bits(3));
  br.read_bit();                      // reserved
  read_utf8_number(br);               // frame/sample number

  switch (bs_code) {
    case 0: return false;
    case 1: fi->block_size = 192; break;
    case 6: fi->block_size = static_cast<uint32_t>(br.read_bits(8)) + 1; break;
    case 7: fi->block_size = static_cast<uint32_t>(br.read_bits(16)) + 1; break;
    default:
      if (bs_code <= 5) fi->block_size = 576u << (bs_code - 2);
      else fi->block_size = 256u << (bs_code - 8);
  }
  static const uint32_t kRates[12] = {0, 88200, 176400, 192000, 8000, 16000,
                                      22050, 24000, 32000, 44100, 48000, 96000};
  if (sr_code < 12) {
    (void)kRates[sr_code];  // 0 -> from STREAMINFO
  } else if (sr_code == 12) {
    br.read_bits(8);
  } else if (sr_code == 13 || sr_code == 14) {
    br.read_bits(16);
  } else {
    return false;
  }

  if (ch_code < 8) {
    fi->channels = static_cast<int>(ch_code) + 1;
    fi->channel_assignment = 0;
  } else if (ch_code <= 10) {
    fi->channels = 2;
    fi->channel_assignment = static_cast<int>(ch_code);
  } else {
    return false;
  }

  static const int kBps[8] = {0, 8, 12, -1, 16, 20, 24, 32};
  int b = kBps[ss_code];
  fi->bps = b > 0 ? b : si.bits_per_sample;
  if (fi->bps <= 0) return false;

  br.read_bits(8);  // header CRC-8 (not verified)
  return !br.error;
}

// Decode everything; samples returned interleaved, scaled to the stream bps.
bool decode_stream(const uint8_t* data, size_t size, const StreamInfo& si,
                   std::vector<int32_t>* pcm) {
  BitReader br{data, size};
  br.byte_pos = si.audio_start;
  std::vector<std::vector<int64_t>> ch(si.channels);

  while (true) {
    br.align();
    // skip any padding bytes until sync or EOF
    while (br.byte_pos + 2 <= size &&
           !(data[br.byte_pos] == 0xFF && (data[br.byte_pos + 1] & 0xFC) == 0xF8)) {
      ++br.byte_pos;
    }
    if (br.byte_pos + 16 > size) break;

    FrameInfo fi;
    if (!decode_frame_header(br, si, &fi)) break;
    if (fi.channels != si.channels) break;

    for (int c = 0; c < fi.channels; ++c) {
      int bps = fi.bps;
      // side channel carries one extra bit
      if ((fi.channel_assignment == 8 && c == 1) ||
          (fi.channel_assignment == 9 && c == 0) ||
          (fi.channel_assignment == 10 && c == 1)) {
        bps += 1;
      }
      if (!decode_subframe(br, fi.block_size, bps, ch[c])) return !pcm->empty();
    }
    br.align();
    br.read_bits(16);  // frame CRC-16 (not verified)
    if (br.error) break;

    // stereo decorrelation
    for (uint32_t i = 0; i < fi.block_size; ++i) {
      int64_t out[8];
      if (fi.channel_assignment == 8) {          // left/side
        out[0] = ch[0][i];
        out[1] = ch[0][i] - ch[1][i];
      } else if (fi.channel_assignment == 9) {   // right/side
        out[1] = ch[1][i];
        out[0] = ch[0][i] + ch[1][i];
      } else if (fi.channel_assignment == 10) {  // mid/side
        int64_t mid = ch[0][i], side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        out[0] = (mid + side) >> 1;
        out[1] = (mid - side) >> 1;
      } else {
        for (int c = 0; c < fi.channels; ++c) out[c] = ch[c][i];
      }
      for (int c = 0; c < fi.channels; ++c)
        pcm->push_back(static_cast<int32_t>(out[c]));
    }
  }
  return !pcm->empty();
}

}  // namespace
}  // namespace flacdec

extern "C" {

// Probe: header-only (no decoding). Fills (sample_rate, channels,
// bits_per_sample, expected interleaved count from STREAMINFO total_samples;
// 0 when the stream does not declare it).
int flacdec_probe(const uint8_t* data, long size, int* sample_rate,
                  int* channels, int* bits, long* n_interleaved) {
  flacdec::StreamInfo si;
  if (!flacdec::parse_streaminfo(data, static_cast<size_t>(size), &si)) return 1;
  *sample_rate = static_cast<int>(si.sample_rate);
  *channels = si.channels;
  *bits = si.bits_per_sample;
  *n_interleaved = static_cast<long>(si.total_samples) * si.channels;
  return 0;
}

// Decode into caller buffer of capacity int32 (values at native bps scale,
// i.e. 16-bit streams span +-32767). Writes the actual interleaved count to
// *n_out (may be < capacity). Returns 0 on success, 3 if the buffer is too
// small (with *n_out = required count).
int flacdec_decode(const uint8_t* data, long size, int32_t* out, long capacity,
                   long* n_out) {
  flacdec::StreamInfo si;
  if (!flacdec::parse_streaminfo(data, static_cast<size_t>(size), &si)) return 1;
  std::vector<int32_t> pcm;
  if (!flacdec::decode_stream(data, static_cast<size_t>(size), si, &pcm)) return 2;
  *n_out = static_cast<long>(pcm.size());
  if (static_cast<long>(pcm.size()) > capacity) return 3;
  std::memcpy(out, pcm.data(), pcm.size() * sizeof(int32_t));
  return 0;
}

}  // extern "C"
