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

#if defined(__AVX512IFMA__) && defined(__AVX512F__)
// GCC's avx512 intrinsic headers self-trigger -Wuninitialized via
// _mm512_undefined_epi32() when inlined under -Wall -Wextra; the
// diagnostic is about the header's own deliberate undef idiom, so it
// is disabled file-wide on IFMA builds only.
#pragma GCC diagnostic ignored "-Wuninitialized"
#include <immintrin.h>
#define HADES_IFMA 1
#endif

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

// --- AVX-512 IFMA batch-8 engine (radix-2^52 Montgomery, R' = 2^260) -------
// Vectorizes the sparse-factored schedule ACROSS 8 independent states: each
// Fr8 limb holds the same radix-52 digit of 8 field elements in one 512-bit
// register, so vpmadd52{lo,hi}uq performs 8 52x52-bit MACs per instruction.
// Value-domain discipline: every Fr8 is kept < 2p with normalized 52-bit
// limbs. The CIOS bound gives mont outputs < p*(4p/R' + 1) < 1.24p (inputs
// < 2p and 4p < R' = 2^260), so products need no reduction; lazy limb adds
// are brought back under 2p by one conditional 2p-subtract. Accumulator
// headroom: each 64-bit lane gains at most 4*(2^52-1) per CIOS iteration,
// < 2^57 total over 5 iterations. Bit-identity with the scalar engines
// holds at the canonical boundary (from-mont + one conditional p-subtract;
// pinned by tests/test_native.py), because both engines compute the same
// value mod p and emit it canonically.
#ifdef HADES_IFMA

struct Fr52 {
  u64 l[5];
};

constexpr u64 M52 = (1ull << 52) - 1;

Fr52 g8_p, g8_2p;  // p and 2p, radix-52
u64 g8_inv52;      // -p^{-1} mod 2^52 (truncation of INV)
Fr52 g8_r2;        // 2^520 mod p: to-Montgomery(R'=2^260) multiplier
Fr52 g8_one;       // 1: from-Montgomery multiplier
Fr52 g8v_ark[N_ARK];
Fr52 g8v_mds[WIDTH][WIDTH];
Fr52 g8v_c0[WIDTH], g8v_u[PARTIAL][4], g8v_w[PARTIAL][4], g8v_m,
    g8v_d[PARTIAL - 1][WIDTH], g8v_fin[4][4];
bool g8_ready = false;

inline Fr52 to52(const u64 a[4]) {
  Fr52 o;
  o.l[0] = a[0] & M52;
  o.l[1] = ((a[0] >> 52) | (a[1] << 12)) & M52;
  o.l[2] = ((a[1] >> 40) | (a[2] << 24)) & M52;
  o.l[3] = ((a[2] >> 28) | (a[3] << 36)) & M52;
  o.l[4] = a[3] >> 16;
  return o;
}

inline void from52(const u64 l[5], u64 a[4]) {
  a[0] = l[0] | (l[1] << 52);
  a[1] = (l[1] >> 12) | (l[2] << 40);
  a[2] = (l[2] >> 24) | (l[3] << 28);
  a[3] = (l[3] >> 36) | (l[4] << 16);
}

struct Fr8 {
  __m512i l[5];
};

inline __m512i bc(u64 v) { return _mm512_set1_epi64((long long)v); }

inline Fr8 bc52(const Fr52& c) {
  Fr8 o;
  for (int i = 0; i < 5; ++i) o.l[i] = bc(c.l[i]);
  return o;
}

// if a >= mod, return a - mod (limbs renormalized); else a. Requires
// normalized 52-bit limbs on both sides.
inline Fr8 cond_sub(const Fr8& a, const Fr52& mod) {
  const __m512i m52 = bc(M52), zero = _mm512_setzero_si512();
  __m512i borrow = zero, d[5];
  for (int i = 0; i < 5; ++i) {
    __m512i t =
        _mm512_sub_epi64(_mm512_sub_epi64(a.l[i], bc(mod.l[i])), borrow);
    borrow = _mm512_maskz_srli_epi64((__mmask8)-1, t, 63);  // magnitudes < 2^53: bit63 == sign
    d[i] = _mm512_and_si512(t, m52);
  }
  const __mmask8 ge = _mm512_cmpeq_epu64_mask(borrow, zero);
  Fr8 o;
  for (int i = 0; i < 5; ++i)
    o.l[i] = _mm512_mask_blend_epi64(ge, a.l[i], d[i]);
  return o;
}

// a + b with both < 2p -> result < 2p (one conditional 2p-subtract).
inline Fr8 add8(const Fr8& a, const Fr8& b) {
  const __m512i m52 = bc(M52);
  Fr8 s;
  __m512i c = _mm512_setzero_si512();
  for (int i = 0; i < 5; ++i) {
    __m512i t = _mm512_add_epi64(_mm512_add_epi64(a.l[i], b.l[i]), c);
    c = _mm512_maskz_srli_epi64((__mmask8)-1, t, 52);
    s.l[i] = _mm512_and_si512(t, m52);
  }
  return cond_sub(s, g8_2p);  // sum < 4p < 2^260: no carry out of limb 4
}

// Montgomery CIOS, radix 2^52: out = a*b*R'^{-1} mod p, < 1.24p for
// inputs < 2p. 8 independent products per call.
inline Fr8 mul8(const Fr8& a, const Fr8& b) {
  const __m512i m52 = bc(M52), zero = _mm512_setzero_si512();
  const __m512i inv = bc(g8_inv52);
  __m512i p0 = bc(g8_p.l[0]), p1 = bc(g8_p.l[1]), p2 = bc(g8_p.l[2]),
          p3 = bc(g8_p.l[3]), p4 = bc(g8_p.l[4]);
  __m512i t0 = zero, t1 = zero, t2 = zero, t3 = zero, t4 = zero, t5 = zero;
  for (int i = 0; i < 5; ++i) {
    const __m512i ai = a.l[i];
    t0 = _mm512_madd52lo_epu64(t0, ai, b.l[0]);
    t1 = _mm512_madd52lo_epu64(t1, ai, b.l[1]);
    t2 = _mm512_madd52lo_epu64(t2, ai, b.l[2]);
    t3 = _mm512_madd52lo_epu64(t3, ai, b.l[3]);
    t4 = _mm512_madd52lo_epu64(t4, ai, b.l[4]);
    t1 = _mm512_madd52hi_epu64(t1, ai, b.l[0]);
    t2 = _mm512_madd52hi_epu64(t2, ai, b.l[1]);
    t3 = _mm512_madd52hi_epu64(t3, ai, b.l[2]);
    t4 = _mm512_madd52hi_epu64(t4, ai, b.l[3]);
    t5 = _mm512_madd52hi_epu64(t5, ai, b.l[4]);
    // m = low52(t0) * inv mod 2^52 (vpmadd52lo masks operands to 52 bits)
    const __m512i m = _mm512_madd52lo_epu64(zero, t0, inv);
    t0 = _mm512_madd52lo_epu64(t0, m, p0);  // t0 == 0 mod 2^52 now
    t1 = _mm512_madd52lo_epu64(t1, m, p1);
    t2 = _mm512_madd52lo_epu64(t2, m, p2);
    t3 = _mm512_madd52lo_epu64(t3, m, p3);
    t4 = _mm512_madd52lo_epu64(t4, m, p4);
    t1 = _mm512_madd52hi_epu64(t1, m, p0);
    t2 = _mm512_madd52hi_epu64(t2, m, p1);
    t3 = _mm512_madd52hi_epu64(t3, m, p2);
    t4 = _mm512_madd52hi_epu64(t4, m, p3);
    t5 = _mm512_madd52hi_epu64(t5, m, p4);
    const __m512i carry = _mm512_maskz_srli_epi64((__mmask8)-1, t0, 52);
    t0 = _mm512_add_epi64(t1, carry);
    t1 = t2;
    t2 = t3;
    t3 = t4;
    t4 = t5;
    t5 = zero;
  }
  __m512i t[5] = {t0, t1, t2, t3, t4};
  Fr8 o;
  __m512i c = zero;
  for (int i = 0; i < 5; ++i) {
    __m512i v = _mm512_add_epi64(t[i], c);
    c = _mm512_maskz_srli_epi64((__mmask8)-1, v, 52);
    o.l[i] = _mm512_and_si512(v, m52);
  }
  return o;
}

inline void sbox5_8(Fr8& x) {
  Fr8 x2 = mul8(x, x);
  Fr8 x4 = mul8(x2, x2);
  x = mul8(x4, x);
}

inline void full_round8(Fr8 s[WIDTH], int& ci) {
  for (int w = 0; w < WIDTH; ++w) s[w] = add8(s[w], bc52(g8v_ark[ci++]));
  for (int w = 0; w < WIDTH; ++w) sbox5_8(s[w]);
  Fr8 res[WIDTH];
  for (int k = 0; k < WIDTH; ++k) {
    Fr8 acc = mul8(bc52(g8v_mds[k][0]), s[0]);
    for (int j = 1; j < WIDTH; ++j)
      acc = add8(acc, mul8(bc52(g8v_mds[k][j]), s[j]));
    res[k] = acc;
  }
  for (int w = 0; w < WIDTH; ++w) s[w] = res[w];
}

// 8-wide mirror of perm_opt_mont (the sparse-factored schedule).
inline void perm_opt_mont8(Fr8 s[WIDTH]) {
  int ci = 0;
  for (int r = 0; r < FULL_HALF; ++r) full_round8(s, ci);
  for (int w = 0; w < WIDTH; ++w) s[w] = add8(s[w], bc52(g8v_c0[w]));
  for (int r = 0; r < PARTIAL; ++r) {
    Fr8 x4 = s[WIDTH - 1];
    sbox5_8(x4);
    Fr8 n4 = mul8(bc52(g8v_m), x4);
    for (int j = 0; j < 4; ++j)
      n4 = add8(n4, mul8(bc52(g8v_w[r][j]), s[j]));
    for (int i = 0; i < 4; ++i)
      s[i] = add8(s[i], mul8(bc52(g8v_u[r][i]), x4));
    s[WIDTH - 1] = n4;
    if (r < PARTIAL - 1)
      for (int w = 0; w < WIDTH; ++w) s[w] = add8(s[w], bc52(g8v_d[r][w]));
  }
  Fr8 fix[4];
  for (int i = 0; i < 4; ++i) {
    Fr8 acc = mul8(bc52(g8v_fin[i][0]), s[0]);
    for (int j = 1; j < 4; ++j)
      acc = add8(acc, mul8(bc52(g8v_fin[i][j]), s[j]));
    fix[i] = acc;
  }
  for (int i = 0; i < 4; ++i) s[i] = fix[i];
  ci = (FULL_HALF + PARTIAL) * WIDTH;  // ARK of global rounds 63..66
  for (int r = 0; r < FULL_HALF; ++r) full_round8(s, ci);
}

// Permute 8 states (8 * WIDTH * 32 bytes, canonical LE) in place.
void perm_opt_ifma8(uint8_t* states) {
  Fr8 s[WIDTH];
  alignas(64) u64 buf[5][8];
  for (int w = 0; w < WIDTH; ++w) {
    for (int k = 0; k < 8; ++k) {
      u64 a[4];
      std::memcpy(a, states + 32 * (k * WIDTH + w), 32);
      const Fr52 f = to52(a);
      for (int l = 0; l < 5; ++l) buf[l][k] = f.l[l];
    }
    for (int l = 0; l < 5; ++l)
      s[w].l[l] = _mm512_load_si512((const void*)buf[l]);
    s[w] = mul8(s[w], bc52(g8_r2));  // to Montgomery (R' = 2^260)
  }
  perm_opt_mont8(s);
  for (int w = 0; w < WIDTH; ++w) {
    // from-Montgomery output is < p + 2p/R' (i.e. at most p): one
    // conditional p-subtract makes it canonical
    const Fr8 v = cond_sub(mul8(s[w], bc52(g8_one)), g8_p);
    for (int l = 0; l < 5; ++l)
      _mm512_store_si512((void*)buf[l], v.l[l]);
    for (int k = 0; k < 8; ++k) {
      u64 l5[5], a[4];
      for (int l = 0; l < 5; ++l) l5[l] = buf[l][k];
      from52(l5, a);
      std::memcpy(states + 32 * (k * WIDTH + w), a, 32);
    }
  }
}

// Convert the scalar engines' Montgomery-R(2^256) constants into
// radix-52 Montgomery-R'(2^260) form. Requires hades_init + the opt
// schedule to be loaded (their Fr values are c * 2^256 mod p).
void init_ifma() {
  g8_inv52 = INV & M52;
  g8_p = to52(P);
  u64 p2[4];
  u128 cc = 0;
  for (int i = 0; i < 4; ++i) {
    u128 t = (u128)P[i] + P[i] + cc;
    p2[i] = (u64)t;
    cc = t >> 64;
  }
  g8_2p = to52(p2);
  Fr k260 = {{1, 0, 0, 0}};
  to_mont(k260);  // 2^256 mod p
  for (int i = 0; i < 4; ++i) add(k260, k260, k260);  // 2^260 mod p
  Fr r2_260;
  std::memcpy(r2_260.l, R2, 32);  // 2^512 mod p
  for (int i = 0; i < 8; ++i) add(r2_260, r2_260, r2_260);  // 2^520 mod p
  g8_r2 = to52(r2_260.l);
  const u64 one[4] = {1, 0, 0, 0};
  g8_one = to52(one);
  const auto conv = [&](const Fr& mont_c) {
    Fr t;
    mont_mul(t, mont_c, k260);  // (c*2^256) * (2^260) / 2^256 = c*2^260
    return to52(t.l);
  };
  for (int i = 0; i < N_ARK; ++i) g8v_ark[i] = conv(g_ark[i]);
  for (int i = 0; i < WIDTH; ++i)
    for (int j = 0; j < WIDTH; ++j) g8v_mds[i][j] = conv(g_mds[i][j]);
  for (int w = 0; w < WIDTH; ++w) g8v_c0[w] = conv(g_opt_c0[w]);
  for (int r = 0; r < PARTIAL; ++r)
    for (int i = 0; i < 4; ++i) {
      g8v_u[r][i] = conv(g_opt_u[r][i]);
      g8v_w[r][i] = conv(g_opt_w[r][i]);
    }
  g8v_m = conv(g_opt_m);
  for (int r = 0; r < PARTIAL - 1; ++r)
    for (int w = 0; w < WIDTH; ++w) g8v_d[r][w] = conv(g_opt_d[r][w]);
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) g8v_fin[i][j] = conv(g_opt_fin[i][j]);
  g8_ready = true;
}

#endif  // HADES_IFMA

// Shared scalar body of hades_perm_batch_opt (also the non-multiple-of-8
// tail under the IFMA engine).
inline void perm_batch_opt_scalar(uint8_t* states, long n) {
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
#ifdef HADES_IFMA
  init_ifma();
#endif
  return 0;
}

// Permute n states in place through the sparse-factored schedule
// (bit-identical outputs to hades_perm_batch; ~1.9x fewer field muls).
// On AVX-512 IFMA hosts, groups of 8 states run through the batch
// vector engine (radix-52 Montgomery, bit-identical canonical outputs);
// the remainder takes the scalar path.
int hades_perm_batch_opt(uint8_t* states, long n) {
  if (!g_opt_ready) return -1;
#ifdef HADES_IFMA
  if (g8_ready) {
    const long groups = n / 8;
    for (long g = 0; g < groups; ++g)
      perm_opt_ifma8(states + 32 * WIDTH * 8 * g);
    perm_batch_opt_scalar(states + 32 * WIDTH * 8 * groups, n - 8 * groups);
    return 0;
  }
#endif
  perm_batch_opt_scalar(states, n);
  return 0;
}

// 1 when the AVX-512 IFMA batch engine is compiled in and initialized.
int hades_has_ifma(void) {
#ifdef HADES_IFMA
  return g8_ready ? 1 : 0;
#else
  return 0;
#endif
}

// Single-thread throughput of the IFMA batch-8 engine (includes the
// canonical<->radix-52 conversions each call, like real usage). -1 when
// the engine is not compiled in.
double hades_bench_opt8(long n) {
#ifdef HADES_IFMA
  if (!g8_ready) return -1.0;
  alignas(64) uint8_t buf[8 * WIDTH * 32] = {};
  for (int k = 0; k < 8; ++k)
    for (int w = 0; w < WIDTH; ++w)
      buf[32 * (k * WIDTH + w)] = (uint8_t)(w + 1);
  const long groups = (n + 7) / 8;
  auto t0 = std::chrono::steady_clock::now();
  for (long i = 0; i < groups; ++i) perm_opt_ifma8(buf);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  volatile uint8_t sink = buf[0];
  (void)sink;
  return (double)(groups * 8) / secs;
#else
  (void)n;
  return -1.0;
#endif
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
