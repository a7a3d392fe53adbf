// Native host-side Hades252 oracle: BLS12-381 scalar field + the width-5
// permutation, single-threaded 4x u64 Montgomery arithmetic.
//
// Role in the framework (not a TPU compute path):
//   * fast CPU oracle for large-batch cross-checks (Merkle roots over 2^20
//     leaves are impractical with Python big-ints),
//   * the measured stand-in for the reference implementation's performance
//     class (dusk-hades is a single-threaded Rust crate over 4x u64
//     Montgomery limbs — reference: src/strategies/scalar.rs + the external
//     dusk-bls12_381 crate); bench.py reports TPU throughput relative to
//     this baseline.
//
// Exposed via a C ABI and loaded from Python with ctypes (no pybind11 in
// this image). Build: `make -C native` -> libhades_cpu.so.
//
// Algorithm parity (reference: src/strategies.rs:140-157):
//   4 full rounds, 59 partial rounds, 4 full rounds; ARK adds a constant to
//   every word each round; S-box x^5 on all words (full) / last word only
//   (partial); 5x5 MDS mat-vec. Constants are read verbatim from
//   ark.bin/mds.bin (canonical little-endian integers, SURVEY.md §2.2).

#include <cstdint>
#include <cstring>
#include <chrono>

extern "C" {

namespace {

using u64 = uint64_t;
using u128 = unsigned __int128;

constexpr int WIDTH = 5;
constexpr int FULL_HALF = 4;
constexpr int PARTIAL = 59;
constexpr int ROUNDS = 2 * FULL_HALF + PARTIAL;
constexpr int N_ARK = 960;

// BLS12-381 scalar field modulus, little-endian u64 limbs.
constexpr u64 P[4] = {0xffffffff00000001ull, 0x53bda402fffe5bfeull,
                      0x3339d80809a1d805ull, 0x73eda753299d7d48ull};
// -p^{-1} mod 2^64
constexpr u64 INV = 0xfffffffeffffffffull;
// R^2 mod p (R = 2^256)
constexpr u64 R2[4] = {0xc999e990f3f29c6dull, 0x2b6cedcb87925c23ull,
                       0x05d314967254398full, 0x0748d9d99f59ff11ull};

struct Fr {
  u64 l[4];
};

inline bool geq_p(const u64 a[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > P[i]) return true;
    if (a[i] < P[i]) return false;
  }
  return true;  // equal
}

inline void sub_p(u64 a[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 t = (u128)a[i] - P[i] - borrow;
    a[i] = (u64)t;
    borrow = (t >> 64) & 1;
  }
}

inline void add(Fr& out, const Fr& a, const Fr& b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 t = (u128)a.l[i] + b.l[i] + carry;
    out.l[i] = (u64)t;
    carry = t >> 64;
  }
  if (geq_p(out.l)) sub_p(out.l);
}

inline void sub(Fr& out, const Fr& a, const Fr& b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 t = (u128)a.l[i] - b.l[i] - borrow;
    out.l[i] = (u64)t;
    borrow = (t >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 t = (u128)out.l[i] + P[i] + carry;
      out.l[i] = (u64)t;
      carry = t >> 64;
    }
  }
}

// Montgomery CIOS multiply: out = a * b * R^{-1} mod p.
inline void mont_mul(Fr& out, const Fr& a, const Fr& b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);

    u64 m = t[0] * INV;
    carry = ((u128)t[0] + (u128)m * P[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 c2 = (u128)t[j] + (u128)m * P[j] + carry;
      t[j - 1] = (u64)c2;
      carry = c2 >> 64;
    }
    cur = (u128)t[4] + carry;
    t[3] = (u64)cur;
    t[4] = t[5] + (u64)(cur >> 64);
  }
  std::memcpy(out.l, t, 32);
  if (t[4] || geq_p(out.l)) sub_p(out.l);
}

inline void sqr(Fr& out, const Fr& a) { mont_mul(out, a, a); }

inline void sbox5(Fr& x) {
  Fr x2, x4;
  sqr(x2, x);
  sqr(x4, x2);
  mont_mul(x, x4, x);
}

Fr g_ark[N_ARK];        // Montgomery form
Fr g_mds[WIDTH][WIDTH]; // Montgomery form
bool g_ready = false;

inline void to_mont(Fr& x) {
  Fr r2;
  std::memcpy(r2.l, R2, 32);
  mont_mul(x, x, r2);
}

inline void from_mont(Fr& x) {
  Fr one = {{1, 0, 0, 0}};
  mont_mul(x, x, one);
}

inline void decode(Fr& out, const uint8_t* bytes) {
  std::memcpy(out.l, bytes, 32);  // little-endian host assumed (x86/arm LE)
}

inline void perm_mont(Fr s[WIDTH]) {
  int ci = 0;
  Fr res[WIDTH];
  for (int r = 0; r < ROUNDS; ++r) {
    const bool full = r < FULL_HALF || r >= FULL_HALF + PARTIAL;
    for (int w = 0; w < WIDTH; ++w) add(s[w], s[w], g_ark[ci++]);
    if (full) {
      for (int w = 0; w < WIDTH; ++w) sbox5(s[w]);
    } else {
      sbox5(s[WIDTH - 1]);
    }
    for (int k = 0; k < WIDTH; ++k) {
      Fr acc = {{0, 0, 0, 0}};
      for (int j = 0; j < WIDTH; ++j) {
        Fr prod;
        mont_mul(prod, g_mds[k][j], s[j]);
        add(acc, acc, prod);
      }
      res[k] = acc;
    }
    for (int w = 0; w < WIDTH; ++w) s[w] = res[w];
  }
}

// --- optimized partial-round schedule (sparse factorization) ---------------
// The 59 partial rounds only S-box word 4, so the dense MDS chain factors
// into per-round 9-entry sparse matrices plus one dense 4x4 fixup (A^59)
// after the chain — the exact transform of
// hades252_tpu/params.optimized_partial_int (oracle-tested there and used
// by the Pallas "opt" schedule). 1044 Montgomery muls per permutation vs
// the naive schedule's 1972. The naive engine above stays as the measured
// stand-in for the reference's performance class (dusk-hades' Rust path is
// the dense schedule); this one serves the framework's own host
// verification/tree hashing.
Fr g_opt_c0[WIDTH];            // ARK of the first partial round
Fr g_opt_u[PARTIAL][4];        // per-round sparse column
Fr g_opt_w[PARTIAL][4];        // per-round sparse row
Fr g_opt_m;                    // M[4][4]
Fr g_opt_d[PARTIAL - 1][WIDTH];  // folded constants, added after round r
Fr g_opt_fin[4][4];            // A^59 fixup
bool g_opt_ready = false;

inline void perm_opt_mont(Fr s[WIDTH]) {
  int ci = 0;
  Fr res[WIDTH];
  auto full_round = [&](void) {
    for (int w = 0; w < WIDTH; ++w) add(s[w], s[w], g_ark[ci++]);
    for (int w = 0; w < WIDTH; ++w) sbox5(s[w]);
    for (int k = 0; k < WIDTH; ++k) {
      Fr acc = {{0, 0, 0, 0}};
      for (int j = 0; j < WIDTH; ++j) {
        Fr prod;
        mont_mul(prod, g_mds[k][j], s[j]);
        add(acc, acc, prod);
      }
      res[k] = acc;
    }
    for (int w = 0; w < WIDTH; ++w) s[w] = res[w];
  };
  for (int r = 0; r < FULL_HALF; ++r) full_round();
  // enter the transformed chain: x = s + c0
  for (int w = 0; w < WIDTH; ++w) add(s[w], s[w], g_opt_c0[w]);
  for (int r = 0; r < PARTIAL; ++r) {
    Fr x4 = s[WIDTH - 1];
    sbox5(x4);
    Fr n4, prod;
    mont_mul(n4, g_opt_m, x4);
    for (int j = 0; j < 4; ++j) {
      mont_mul(prod, g_opt_w[r][j], s[j]);
      add(n4, n4, prod);
    }
    for (int i = 0; i < 4; ++i) {
      mont_mul(prod, g_opt_u[r][i], x4);
      add(s[i], s[i], prod);
    }
    s[WIDTH - 1] = n4;
    if (r < PARTIAL - 1)
      for (int w = 0; w < WIDTH; ++w) add(s[w], s[w], g_opt_d[r][w]);
  }
  // leave the chain: words 0..3 <- A^59 @ s[0:4]
  Fr fix[4];
  for (int i = 0; i < 4; ++i) {
    Fr acc = {{0, 0, 0, 0}};
    for (int j = 0; j < 4; ++j) {
      Fr prod;
      mont_mul(prod, g_opt_fin[i][j], s[j]);
      add(acc, acc, prod);
    }
    fix[i] = acc;
  }
  for (int i = 0; i < 4; ++i) s[i] = fix[i];
  ci = (FULL_HALF + PARTIAL) * WIDTH;  // ARK of global rounds 63..66
  for (int r = 0; r < FULL_HALF; ++r) full_round();
}

}  // namespace

// Load constants from the raw asset bytes (canonical LE scalars).
// Returns 0 on success.
int hades_init(const uint8_t* ark, long ark_len, const uint8_t* mds,
               long mds_len) {
  if (ark_len != N_ARK * 32 || mds_len != WIDTH * WIDTH * 32) return -1;
  for (int i = 0; i < N_ARK; ++i) {
    decode(g_ark[i], ark + 32 * i);
    to_mont(g_ark[i]);
  }
  for (int i = 0; i < WIDTH; ++i)
    for (int j = 0; j < WIDTH; ++j) {
      decode(g_mds[i][j], mds + 32 * (i * WIDTH + j));
      to_mont(g_mds[i][j]);
    }
  g_ready = true;
  return 0;
}

// Load the sparse partial-round schedule (canonical LE scalars, computed
// host-side by hades252_tpu/params.optimized_partial_int). Payload layout:
// c0 (5) | u (59*4) | w (59*4) | m (1) | d (58*5) | final (4*4), each a
// 32-byte canonical LE scalar. Requires hades_init first. Returns 0 on
// success.
int hades_init_opt(const uint8_t* payload, long len) {
  constexpr long N_SCALARS =
      WIDTH + PARTIAL * 4 * 2 + 1 + (PARTIAL - 1) * WIDTH + 16;
  if (!g_ready || len != N_SCALARS * 32) return -1;
  const uint8_t* p = payload;
  auto next = [&](Fr& out) {
    decode(out, p);
    to_mont(out);
    p += 32;
  };
  for (int w = 0; w < WIDTH; ++w) next(g_opt_c0[w]);
  for (int r = 0; r < PARTIAL; ++r)
    for (int i = 0; i < 4; ++i) next(g_opt_u[r][i]);
  for (int r = 0; r < PARTIAL; ++r)
    for (int j = 0; j < 4; ++j) next(g_opt_w[r][j]);
  next(g_opt_m);
  for (int r = 0; r < PARTIAL - 1; ++r)
    for (int w = 0; w < WIDTH; ++w) next(g_opt_d[r][w]);
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) next(g_opt_fin[i][j]);
  g_opt_ready = true;
  return 0;
}

// Permute n states in place through the sparse-factored schedule
// (bit-identical outputs to hades_perm_batch; ~1.9x fewer field muls).
int hades_perm_batch_opt(uint8_t* states, long n) {
  if (!g_opt_ready) return -1;
  for (long b = 0; b < n; ++b) {
    Fr s[WIDTH];
    for (int w = 0; w < WIDTH; ++w) {
      decode(s[w], states + 32 * (b * WIDTH + w));
      to_mont(s[w]);
    }
    perm_opt_mont(s);
    for (int w = 0; w < WIDTH; ++w) {
      from_mont(s[w]);
      std::memcpy(states + 32 * (b * WIDTH + w), s[w].l, 32);
    }
  }
  return 0;
}

// Single-thread throughput of the sparse-factored schedule.
double hades_bench_opt(long n) {
  if (!g_opt_ready) return -1.0;
  Fr s[WIDTH] = {};
  for (int w = 0; w < WIDTH; ++w) s[w].l[0] = (u64)w + 1;
  for (int w = 0; w < WIDTH; ++w) to_mont(s[w]);
  auto t0 = std::chrono::steady_clock::now();
  for (long i = 0; i < n; ++i) perm_opt_mont(s);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  volatile u64 sink = s[0].l[0];
  (void)sink;
  return (double)n / secs;
}

// Permute n states in place. states = n * WIDTH * 32 bytes, each scalar a
// canonical 32-byte LE integer (< p).
int hades_perm_batch(uint8_t* states, long n) {
  if (!g_ready) return -1;
  for (long b = 0; b < n; ++b) {
    Fr s[WIDTH];
    for (int w = 0; w < WIDTH; ++w) {
      decode(s[w], states + 32 * (b * WIDTH + w));
      to_mont(s[w]);
    }
    perm_mont(s);
    for (int w = 0; w < WIDTH; ++w) {
      from_mont(s[w]);
      std::memcpy(states + 32 * (b * WIDTH + w), s[w].l, 32);
    }
  }
  return 0;
}

// Rate-4 sponge over the permutation, matching the framework's spec
// (hades252_tpu/models/sponge.py): capacity word 0 is initialized to the
// message length L as a field element; each chunk of 4 message words
// (zero-padded) is added into words 1..4 and the state permuted; the
// digest is word 1 after the final permutation.
// msgs: n * L * 32 bytes (canonical LE scalars); out: n * 32 bytes.
int hades_sponge_hash(const uint8_t* msgs, long n, long L, uint8_t* out) {
  if (!g_ready || L <= 0) return -1;
  const long chunks = (L + 3) / 4;
  for (long b = 0; b < n; ++b) {
    Fr s[WIDTH] = {};
    s[0].l[0] = (u64)L;
    to_mont(s[0]);
    for (long c = 0; c < chunks; ++c) {
      for (int i = 0; i < 4; ++i) {
        const long idx = c * 4 + i;
        if (idx >= L) break;  // zero padding: adding 0 is a no-op
        Fr w;
        decode(w, msgs + 32 * (b * L + idx));
        to_mont(w);
        add(s[1 + i], s[1 + i], w);
      }
      perm_mont(s);
    }
    from_mont(s[1]);
    std::memcpy(out + 32 * b, s[1].l, 32);
  }
  return 0;
}

// Arity-4 Merkle root, matching hades252_tpu/models/merkle.py:
// parent = perm([TAG=4, c0, c1, c2, c3])[1]; leaves zero-padded to a power
// of four. leaves: n * 32 bytes; out: 32 bytes. Scratch is allocated here.
int hades_merkle_root(const uint8_t* leaves, long n, uint8_t* out) {
  if (!g_ready || n <= 0) return -1;
  long full = 1;
  while (full < n) full *= 4;
  Fr* level = new Fr[full];
  for (long i = 0; i < n; ++i) {
    decode(level[i], leaves + 32 * i);
    to_mont(level[i]);
  }
  for (long i = n; i < full; ++i) level[i] = Fr{{0, 0, 0, 0}};
  Fr tag = {{4, 0, 0, 0}};
  to_mont(tag);
  while (full > 1) {
    const long parents = full / 4;
    for (long g = 0; g < parents; ++g) {
      Fr s[WIDTH];
      s[0] = tag;
      for (int i = 0; i < 4; ++i) s[1 + i] = level[g * 4 + i];
      perm_mont(s);
      level[g] = s[1];
    }
    full = parents;
  }
  from_mont(level[0]);
  std::memcpy(out, level[0].l, 32);
  delete[] level;
  return 0;
}

// Duplex cipher matching hades252_tpu/models/cipher.py:
//   state0 = [TAG_ENC + L*2^32, k0, k1, nonce, 1] -> perm; per rate-4
//   chunk: c_i = m_i + state[1+i], state[1+i] = c_i, perm; tag = state[1].
// decrypt=1 runs the inverse direction (m_i = c_i - state[1+i], duplex
// feedback still absorbs the ciphertext). L must be a multiple of 4
// (caller zero-pads). key: n*2*32; nonce: n*32; data/out: n*L*32;
// tags: n*32 bytes.
int hades_cipher(const uint8_t* key, const uint8_t* nonce,
                 const uint8_t* data, long n, long L, int decrypt,
                 uint8_t* out, uint8_t* tags) {
  if (!g_ready || L <= 0 || (L % 4) != 0) return -1;
  for (long b = 0; b < n; ++b) {
    Fr s[WIDTH];
    s[0] = Fr{{(u64)(6ull + ((u64)L << 32)), 0, 0, 0}};
    decode(s[1], key + 64 * b);
    decode(s[2], key + 64 * b + 32);
    decode(s[3], nonce + 32 * b);
    s[4] = Fr{{1, 0, 0, 0}};
    for (int w = 0; w < WIDTH; ++w) to_mont(s[w]);
    perm_mont(s);
    for (long c = 0; c < L / 4; ++c) {
      for (int i = 0; i < 4; ++i) {
        Fr d_in;
        decode(d_in, data + 32 * (b * L + c * 4 + i));
        to_mont(d_in);
        Fr o;
        if (decrypt) {
          sub(o, d_in, s[1 + i]);
          s[1 + i] = d_in;  // duplex absorbs the ciphertext
        } else {
          add(o, d_in, s[1 + i]);
          s[1 + i] = o;
        }
        from_mont(o);
        std::memcpy(out + 32 * (b * L + c * 4 + i), o.l, 32);
      }
      perm_mont(s);
    }
    Fr t = s[1];
    from_mont(t);
    std::memcpy(tags + 32 * b, t.l, 32);
  }
  return 0;
}

// Single-thread throughput measurement: permute n dummy states, return
// permutations per second.
double hades_bench(long n) {
  if (!g_ready) return -1.0;
  Fr s[WIDTH] = {};
  for (int w = 0; w < WIDTH; ++w) s[w].l[0] = (u64)w + 1;
  for (int w = 0; w < WIDTH; ++w) to_mont(s[w]);
  auto t0 = std::chrono::steady_clock::now();
  for (long i = 0; i < n; ++i) perm_mont(s);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  // fold the state into a sink so the loop cannot be optimized away
  volatile u64 sink = s[0].l[0];
  (void)sink;
  return (double)n / secs;
}

}  // extern "C"
