// Serial host codec: the native verification oracle and `--host` backend.
//
// Re-implements the adaptive order-0 arithmetic coder that the reference
// (jiahansu/GPUAR) compiles __host__ __device__ in src/gpuar_kernel.cu
// (encode :487-531, decode :848-892).  Same algorithm, fresh structure:
// the model is an explicit cumulative-frequency row (the reference uses a
// Fenwick tree storing identical counts, :205-238), and the decode symbol
// search is a branch-free binary search over that row (:727-763 equivalent).
// Output bitstreams are bit-identical to the reference by construction.
//
// Exposed C ABI (loaded from Python via ctypes):
//   tg_encode_packet / tg_decode_packet      one packet
//   tg_encode_batch  / tg_decode_batch       fixed-stride packet batches
//   tg_encode_stream / tg_decode_stream      back-to-back .gip packet bodies

#include <cstdint>
#include <cstring>

namespace {

constexpr int kModelSize = 257;   // cumulative entries C[0..256]
constexpr uint32_t kInitCum = 256;
constexpr uint32_t kMsb = 0x8000u;
constexpr uint32_t kSecond = 0x4000u;
constexpr uint32_t kLowMask = 0xFFFFu;
constexpr int kHeader = 4;        // [u16 total][u16 raw]

struct Model {
  // C[i] = cumulative count of symbols < i.  u16 suffices: max 256+8192.
  uint16_t cum[kModelSize];
  uint32_t cumprob;

  void reset() {
    for (int i = 0; i < kModelSize; ++i) cum[i] = static_cast<uint16_t>(i);
    cumprob = kInitCum;
  }

  // Account one occurrence of `sym`.  The suffix increment is phrased as
  // a FIXED-trip masked pass (i > sym <=> cum[i] > cum[sym], the row
  // being strictly increasing): the variable-start `for (i = sym+1)`
  // formulation defeated the vectoriser and cost ~70% of encode time
  // (ablation in benchmarks/PROBES_r3.md); this form is 8 AVX-512BW
  // iterations and doubled encode throughput.
  void bump(int sym) {
    const uint16_t t = cum[sym];
    for (int i = 1; i < kModelSize; ++i)
      cum[i] = static_cast<uint16_t>(cum[i] + (cum[i] > t));
    ++cumprob;
  }

  // Fused symbol search + model update (decode hot path).  Because the
  // row is strictly increasing with sym = max{c : cum[c] <= unscaled},
  // the adaptive update cum[i] += (i > sym) is identical to
  // cum[i] += (cum[i] > unscaled) — one auto-vectorised compare pass
  // yields the symbol (a count) AND applies the update.  The same trick
  // as the Pallas decode kernel's fused compare-read.  Does NOT touch
  // cumprob; the caller increments it after using the pre-update bounds
  // (cum[sym] is unchanged; pre-update cum[sym+1] = new value - 1).
  int find_bump(uint32_t unscaled) {
    const uint16_t u = static_cast<uint16_t>(unscaled);  // < cumprob <= 8448
    uint16_t gt = 0;  // u16 keeps the reduction in 32-lane vector adds
    for (int i = 1; i < kModelSize; ++i) {
      const uint16_t g = cum[i] > u;
      cum[i] = static_cast<uint16_t>(cum[i] + g);
      gt = static_cast<uint16_t>(gt + g);
    }
    return 256 - gt;
  }
};

// Exact magic-number division by cumprob: floor(x/d) = (x*M) >> s with
// s = 32 + floor(log2 d), M = floor(2^s/d) + 1, exact for all x < 2^31
// and d < 2^16 (the round-up error x*(M - 2^s/d)/2^s < 1/d can never
// carry floor(x/d) past the next integer).  cumprob walks 256..8448
// sequentially per packet, so the table reads stream through cache.
// (A double-reciprocal variant with branchy fixups measured SLOWER than
// the hardware divider; see benchmarks/PROBES_r3.md, host-codec section.)
struct DivTab {
  uint64_t mul[kInitCum + 8192 + 1];
  uint8_t sh[kInitCum + 8192 + 1];
  DivTab() {
    for (uint32_t d = 1; d <= kInitCum + 8192; ++d) {
      const int s = 63 - __builtin_clz(d);  // 32 + floor(log2 d)
      sh[d] = static_cast<uint8_t>(s);
      mul[d] = (static_cast<uint64_t>(1) << s) / d + 1;
    }
  }
};
const DivTab kDiv;

inline uint32_t div_cum(uint32_t x, uint32_t d) {
  return static_cast<uint32_t>((x * kDiv.mul[d]) >> kDiv.sh[d]);
}

// Narrow [lo, hi] to sym's cumulative share, then adapt the model.
// Mirrors applySymbolRange (src/gpuar_kernel.cu:256-299): new hi uses old lo,
// products are < 2^31, results wrap to 16 bits.
inline void apply_range(Model& m, int sym, uint32_t& lo, uint32_t& hi) {
  const uint32_t span = hi - lo + 1;
  hi = (lo + div_cum(m.cum[sym + 1] * span, m.cumprob) - 1) & kLowMask;
  lo = (lo + div_cum(m.cum[sym] * span, m.cumprob)) & kLowMask;
  m.bump(sym);
}

struct BitOut {
  uint8_t* p;
  uint64_t acc = 0;
  int n = 0;  // bits pending in acc (right-aligned); < 8 between calls

  // Append k bits (v's low k bits, MSB-first), k <= 32.
  inline void append(uint32_t v, int k) {
    acc = (acc << k) | v;
    n += k;
    while (n >= 8) {
      n -= 8;
      *p++ = static_cast<uint8_t>(acc >> n);
    }
  }
  // Append `len` copies of `bit` (underflow runs can exceed 32).
  inline void run(uint32_t bit, uint32_t len) {
    while (len) {
      const int c = len > 32 ? 32 : static_cast<int>(len);
      append(bit ? (c == 32 ? 0xFFFFFFFFu : (1u << c) - 1) : 0u, c);
      len -= c;
    }
  }
  void close() {  // left-align final partial byte (writeClose :430-439)
    if (n) { *p++ = static_cast<uint8_t>(acc << (8 - n)); acc = 0; n = 0; }
  }
};

struct BitIn {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t win = 0;
  int n = 0;  // bits available in win (right-aligned)

  // Take k bits MSB-first, k <= 32.  Reads past the stream return 0
  // (the values never matter: decode stops at the framed raw length).
  inline uint32_t take(int k) {
    while (n < 32) {
      win = (win << 8) | (p < end ? *p : 0u);
      ++p;
      n += 8;
    }
    n -= k;
    return static_cast<uint32_t>(win >> n) & (k == 32 ? 0xFFFFFFFFu
                                                      : (1u << k) - 1);
  }
};

// Leading common MSBs of the 16-bit bounds: how many settled bits this
// symbol emits (the serial loop's equal-MSB iterations, :325-336).
inline int settled_count(uint32_t lo, uint32_t hi) {
  const uint32_t x = (lo ^ hi) & kLowMask;
  return x ? __builtin_clz(x) - 16 : 16;
}

// Straddle (underflow) count once MSBs differ: the serial loop removes
// the second bit while lo = 01..., hi = 10... (:337-352).  That holds for
// exactly min(leading 1s of lo after its 0, leading 0s of hi after its 1)
// iterations, and no settled emission can follow (MSBs still differ).
inline int straddle_count(uint32_t lo, uint32_t hi) {
  if (!(lo & kSecond) || (hi & kSecond)) return 0;
  const uint32_t lw = ~static_cast<uint32_t>(lo << 17);  // 1-run of lo
  const uint32_t hw = static_cast<uint32_t>(hi << 17);   // 0-run of hi
  const int p = __builtin_clz(lw);
  const int q = hw ? __builtin_clz(hw) : 15;
  return p < q ? p : q;
}

}  // namespace

extern "C" {

// Encode n raw bytes into out (capacity >= n + 512 + 4). Returns total
// packet length including the 4-byte header.
int tg_encode_packet(const uint8_t* in, int n, uint8_t* out) {
  Model m;
  m.reset();
  BitOut bo{out + kHeader};
  uint32_t lo = 0, hi = kLowMask, under = 0;

  for (int i = 0; i < n; ++i) {
    apply_range(m, in[i], lo, hi);
    // Renormalise, closed form (equivalent to writeEncodedBits :321-367:
    // the serial loop is always m settled emissions then k straddles).
    const int ms = settled_count(lo, hi);
    if (ms) {
      const uint32_t bits = lo >> (16 - ms);  // the m common MSBs
      if (under) {  // pending underflow flushes after the first bit
        bo.append(bits >> (ms - 1), 1);
        bo.run((bits >> (ms - 1)) ^ 1u, under);
        under = 0;
        if (ms > 1) bo.append(bits & ((1u << (ms - 1)) - 1), ms - 1);
      } else {
        bo.append(bits, ms);
      }
      lo = (lo << ms) & kLowMask;
      hi = ((hi << ms) | ((1u << ms) - 1)) & kLowMask;
    }
    const int ks = straddle_count(lo, hi);
    if (ks) {  // drop k second bits, shift up, fill 0s (lo) / 1s (hi)
      under += static_cast<uint32_t>(ks);
      lo = (lo & (0x7FFFu >> ks)) << ks;
      hi = kMsb | ((hi & (0x7FFFu >> ks)) << ks) | ((1u << ks) - 1);
    }
  }

  // Tail flush (writeRemaining :379-388).
  const uint32_t tb = (lo >> 14) & 1u;
  bo.append(tb, 1);
  bo.run(tb ^ 1u, under + 1);
  bo.close();

  const int len = static_cast<int>(bo.p - out);
  out[0] = static_cast<uint8_t>(len);
  out[1] = static_cast<uint8_t>(len >> 8);
  out[2] = static_cast<uint8_t>(n);
  out[3] = static_cast<uint8_t>(n >> 8);
  return len;
}

// Decode one packet (header + bitstream) into out (capacity >= raw size).
// Returns the number of decoded bytes.
int tg_decode_packet(const uint8_t* in, uint8_t* out) {
  const int total = in[0] | (in[1] << 8);
  const int raw = in[2] | (in[3] << 8);
  BitIn bi{in + kHeader, in + total};
  Model m;
  m.reset();

  uint32_t code = bi.take(16);
  uint32_t lo = 0, hi = kLowMask;

  for (int i = 0; i < raw; ++i) {
    const uint32_t span = hi - lo + 1;
    const uint32_t unscaled = ((code - lo + 1) * m.cumprob - 1) / span;
    const int sym = m.find_bump(unscaled);
    out[i] = static_cast<uint8_t>(sym);
    // apply_range with the update already applied by find_bump: cum[sym]
    // is unchanged, pre-update cum[sym+1] is the new value minus 1.
    const uint32_t c_hi = static_cast<uint32_t>(m.cum[sym + 1]) - 1;
    hi = (lo + div_cum(c_hi * span, m.cumprob) - 1) & kLowMask;
    lo = (lo + div_cum(m.cum[sym] * span, m.cumprob)) & kLowMask;
    ++m.cumprob;
    // Mirror renormalisation, closed form (readEncodedBits :787-836).
    // The straddle op (code ^= kSecond then shift in a bit) removes
    // code's second bit exactly like lo/hi: 01x -> 0x b, 10x -> 1x b.
    const int ms = settled_count(lo, hi);
    if (ms) {
      code = ((code << ms) | bi.take(ms)) & kLowMask;
      lo = (lo << ms) & kLowMask;
      hi = ((hi << ms) | ((1u << ms) - 1)) & kLowMask;
    }
    const int ks = straddle_count(lo, hi);
    if (ks) {
      code = (code & kMsb) | ((code & (0x7FFFu >> ks)) << ks) | bi.take(ks);
      lo = (lo & (0x7FFFu >> ks)) << ks;
      hi = kMsb | ((hi & (0x7FFFu >> ks)) << ks) | ((1u << ks) - 1);
    }
  }
  return raw;
}

// Encode `total` raw bytes as ceil(total/packet_size) packets written at
// fixed `out_stride` offsets. lengths[i] receives each packet's total size.
// Returns the packet count.
long tg_encode_batch(const uint8_t* in, long total, int packet_size,
                     uint8_t* out, long out_stride, int* lengths) {
  long count = 0;
  for (long off = 0; off < total; off += packet_size, ++count) {
    const int n = static_cast<int>(total - off < packet_size ? total - off
                                                             : packet_size);
    lengths[count] = tg_encode_packet(in + off, n, out + count * out_stride);
  }
  return count;
}

// Decode `npackets` packets at fixed `in_stride` offsets into out at fixed
// `out_stride` offsets. raw_lengths[i] receives each decoded size.
void tg_decode_batch(const uint8_t* in, long in_stride, long npackets,
                     uint8_t* out, long out_stride, int* raw_lengths) {
  for (long i = 0; i < npackets; ++i) {
    raw_lengths[i] = tg_decode_packet(in + i * in_stride, out + i * out_stride);
  }
}

// Encode `total` raw bytes into a back-to-back .gip packet body.
// Returns the compressed body length, or -1 if out_cap is too small.
long tg_encode_stream(const uint8_t* in, long total, int packet_size,
                      uint8_t* out, long out_cap) {
  long w = 0;
  for (long off = 0; off < total; off += packet_size) {
    const int n = static_cast<int>(total - off < packet_size ? total - off
                                                             : packet_size);
    if (w + n + 512 + kHeader > out_cap) return -1;
    w += tg_encode_packet(in + off, n, out + w);
  }
  return w;
}

// Splice variable-length rows out of a fixed-stride batch into one
// contiguous buffer (the .gip body assembly).  numpy's small-array
// concatenate costs ~0.5 s per 8192-packet batch; this is a memcpy loop.
// Returns bytes written, or -1 on overflow / bad length.
long tg_splice(const uint8_t* rows, long stride, const int* lengths,
               long n, uint8_t* out, long out_cap) {
  long w = 0;
  for (long i = 0; i < n; ++i) {
    const long len = lengths[i];
    if (len < 0 || len > stride || w + len > out_cap) return -1;
    std::memcpy(out + w, rows + i * stride, static_cast<size_t>(len));
    w += len;
  }
  return w;
}

// Splice from a compacted blob: packet i's bytes live at byte offset
// offsets[i] (device-side row compaction leaves packets at aligned
// starts with a little inter-packet padding; this strips it).
long tg_splice_at(const uint8_t* blob, long blob_len, const long* offsets,
                  const int* lengths, long n, uint8_t* out, long out_cap) {
  long w = 0;
  for (long i = 0; i < n; ++i) {
    const long len = lengths[i];
    if (len < 0 || offsets[i] < 0 || offsets[i] + len > blob_len ||
        w + len > out_cap)
      return -1;
    std::memcpy(out + w, blob + offsets[i], static_cast<size_t>(len));
    w += len;
  }
  return w;
}

// Scatter packets from a back-to-back body into aligned blob offsets
// (the decode-side mirror: one pass builds the device upload buffer).
long tg_expand_at(const uint8_t* body, long body_len, const long* offsets,
                  const int* lengths, long n, uint8_t* blob,
                  long blob_cap) {
  long r = 0;
  for (long i = 0; i < n; ++i) {
    const long len = lengths[i];
    if (len < 0 || r + len > body_len || offsets[i] < 0 ||
        offsets[i] + len > blob_cap)
      return -1;
    std::memcpy(blob + offsets[i], body + r, static_cast<size_t>(len));
    r += len;
  }
  return r;
}

// Decode a back-to-back .gip packet body of `total` bytes.
// Returns decoded length, or -1 on malformed framing / -2 on overflow.
long tg_decode_stream(const uint8_t* in, long total, uint8_t* out,
                      long out_cap) {
  long r = 0, w = 0;
  while (r < total) {
    if (r + kHeader > total) return -1;
    const int psize = in[r] | (in[r + 1] << 8);
    const int raw = in[r + 2] | (in[r + 3] << 8);
    if (psize < kHeader || r + psize > total) return -1;
    if (w + raw > out_cap) return -2;
    tg_decode_packet(in + r, out + w);
    r += psize;
    w += raw;
  }
  return w;
}

}  // extern "C"
