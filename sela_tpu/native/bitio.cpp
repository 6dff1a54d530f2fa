// Native Rice bitstream pack/unpack — host-side hot loop.
//
// TPU-native framework analog of upstream:src/rice/rice_encoder.cpp and
// rice_decoder.cpp (sahaRatul/sela, path-level cite -- reference mount was
// empty; SURVEY.md SS2). The device (JAX/Pallas) does all codec math and
// chooses k; this library does the one genuinely bit-serial stage -- variable
// -length bit packing -- at memory speed on the host, threaded over
// independent blocks. Bit conventions are normative per /root/repo/FORMAT.md:
//   zigzag u = (v << 1) ^ (v >> 31)
//   k <= 30: (u >> k) one-bits, one zero bit, low k bits of u MSB-first
//   k == 31: all 32 bits of u MSB-first (verbatim escape)
//   bit i of stream = bit 31 - (i % 32) of word i / 32
//
// Exactness is asserted against the numpy oracle in tests/test_native.py.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint32_t zigzag(int32_t v) {
  return (static_cast<uint32_t>(v) << 1) ^ static_cast<uint32_t>(v >> 31);
}

inline int32_t unzigzag(uint32_t u) {
  return static_cast<int32_t>((u >> 1) ^ (~(u & 1) + 1));
}

struct BitWriter {
  uint32_t* out;
  size_t w = 0;
  uint64_t acc = 0;  // low `n` bits are pending, MSB-first order
  int n = 0;

  inline void put(uint32_t bits, int len) {
    if (len == 0) return;
    acc = (acc << len) | (static_cast<uint64_t>(bits) & ((1ull << len) - 1));
    n += len;
    while (n >= 32) {
      out[w++] = static_cast<uint32_t>(acc >> (n - 32));
      n -= 32;
    }
  }
  inline void put32(uint32_t bits) {
    acc = (acc << 32) | bits;
    n += 32;
    while (n >= 32) {
      out[w++] = static_cast<uint32_t>(acc >> (n - 32));
      n -= 32;
    }
  }
  inline void flush() {
    if (n > 0) {
      out[w++] = static_cast<uint32_t>(acc << (32 - n));
      n = 0;
      acc = 0;
    }
  }
};

struct BitReader {
  const uint32_t* in;
  size_t words;
  size_t r = 0;
  uint64_t acc = 0;  // low `n` bits are the next bits, MSB-first order
  int n = 0;

  inline void refill() {
    while (n <= 32 && r < words) {
      acc = (acc << 32) | in[r++];
      n += 32;
    }
  }
  inline uint32_t get(int len) {  // len <= 32
    if (len == 0) return 0;
    refill();
    if (n < len) {  // past-the-end: pad with zeros (caller validated sizes)
      acc <<= (len - n);
      n = len;
    }
    uint32_t v = static_cast<uint32_t>((acc >> (n - len)) & ((1ull << len) - 1));
    n -= len;
    return v;
  }
  inline uint32_t read_unary() {  // count 1-bits up to the terminating 0
    uint32_t q = 0;
    for (;;) {
      refill();
      if (n == 0) return q;  // truncated stream: treat as terminated
      // examine the top n pending bits
      uint64_t window = acc & ((n == 64) ? ~0ull : ((1ull << n) - 1));
      // leading ones of the n-bit window
      int lead = 0;
      while (lead < n &&
             ((window >> (n - 1 - lead)) & 1ull) != 0)
        ++lead;
      q += static_cast<uint32_t>(lead);
      if (lead < n) {       // found the zero bit
        n -= lead + 1;      // consume the ones and the stop bit
        return q;
      }
      n = 0;                // consumed everything; keep counting
      acc = 0;
    }
  }
};

inline uint64_t rice_bits(uint32_t u, int k) {
  if (k == 31) return 32;
  return static_cast<uint64_t>(u >> k) + 1 + k;
}

void parallel_for(int64_t count, void (*fn)(int64_t, void*), void* ctx) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 2;
  unsigned nthreads = hw;
  if (count < static_cast<int64_t>(nthreads) * 4) {
    for (int64_t i = 0; i < count; ++i) fn(i, ctx);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  for (unsigned t = 0; t < nthreads; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= count) return;
        fn(i, ctx);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Pass 1: exact word count per block (so Python can allocate output).
// values: concatenated int32; offs[i]..offs[i]+counts[i] is block i;
// ks[i] in [0, 31]. Returns per-block word counts in out_words.
void rice_block_words(const int32_t* values, const int64_t* offs,
                      const int32_t* counts, const int32_t* ks,
                      int64_t n_blocks, int64_t* out_words) {
  struct Ctx {
    const int32_t* values;
    const int64_t* offs;
    const int32_t* counts;
    const int32_t* ks;
    int64_t* out_words;
  } ctx{values, offs, counts, ks, out_words};
  parallel_for(
      n_blocks,
      [](int64_t i, void* p) {
        auto& c = *static_cast<Ctx*>(p);
        const int32_t* v = c.values + c.offs[i];
        int k = c.ks[i];
        uint64_t bits = 0;
        for (int32_t j = 0; j < c.counts[i]; ++j)
          bits += rice_bits(zigzag(v[j]), k);
        c.out_words[i] = static_cast<int64_t>((bits + 31) / 32);
      },
      &ctx);
}

// Pass 2: pack. word_offs are exclusive prefix sums of rice_block_words
// output; out must hold sum(words).
void rice_pack_blocks(const int32_t* values, const int64_t* offs,
                      const int32_t* counts, const int32_t* ks,
                      const int64_t* word_offs, int64_t n_blocks,
                      uint32_t* out) {
  struct Ctx {
    const int32_t* values;
    const int64_t* offs;
    const int32_t* counts;
    const int32_t* ks;
    const int64_t* word_offs;
    uint32_t* out;
  } ctx{values, offs, counts, ks, word_offs, out};
  parallel_for(
      n_blocks,
      [](int64_t i, void* p) {
        auto& c = *static_cast<Ctx*>(p);
        const int32_t* v = c.values + c.offs[i];
        int k = c.ks[i];
        BitWriter bw{c.out + c.word_offs[i]};
        for (int32_t j = 0; j < c.counts[i]; ++j) {
          uint32_t u = zigzag(v[j]);
          if (k == 31) {
            bw.put32(u);
          } else {
            uint32_t q = u >> k;
            while (q >= 32) {
              bw.put32(0xFFFFFFFFu);
              q -= 32;
            }
            bw.put((1u << q) - 1, static_cast<int>(q));  // q one-bits
            bw.put(0, 1);                                // stop bit
            bw.put(u, k);                                // low k bits
          }
        }
        bw.flush();
      },
      &ctx);
}

// Unpack: words concatenated; per block word_offs/word_counts,
// value offs/counts, ks. out holds concatenated int32 values.
void rice_unpack_blocks(const uint32_t* words, const int64_t* word_offs,
                        const int32_t* word_counts, const int64_t* offs,
                        const int32_t* counts, const int32_t* ks,
                        int64_t n_blocks, int32_t* out) {
  struct Ctx {
    const uint32_t* words;
    const int64_t* word_offs;
    const int32_t* word_counts;
    const int64_t* offs;
    const int32_t* counts;
    const int32_t* ks;
    int32_t* out;
  } ctx{words, word_offs, word_counts, offs, counts, ks, out};
  parallel_for(
      n_blocks,
      [](int64_t i, void* p) {
        auto& c = *static_cast<Ctx*>(p);
        BitReader br{c.words + c.word_offs[i],
                     static_cast<size_t>(c.word_counts[i])};
        int k = c.ks[i];
        int32_t* o = c.out + c.offs[i];
        for (int32_t j = 0; j < c.counts[i]; ++j) {
          uint32_t u;
          if (k == 31) {
            u = br.get(32);
          } else {
            uint32_t q = br.read_unary();
            uint32_t rem = (k > 0) ? br.get(k) : 0;
            u = (q << k) | rem;
          }
          o[j] = unzigzag(u);
        }
      },
      &ctx);
}

}  // extern "C"
