// Bit-packed GF(2) Gauss-Jordan elimination (native host preprocessing).
//
// par2gen / LDPC generator-matrix preprocessing (reference fec.py:43,102)
// reduces a dense binary parity-check matrix; at AR4JA/DVB-S2 sizes the
// uint8 NumPy row operations cost minutes. Packing 64 columns per machine
// word makes each row XOR 8x narrower and allocation-free: the same
// reduction runs in seconds.
//
// Semantics mirror gauss_elim_gf2 exactly (same pivot policy — first
// nonzero at/below the current row, full-row swaps, eliminate the pivot
// column in ALL other rows), so the native and NumPy paths are bit-identical.
//
// C ABI for ctypes. Built together with alist.cpp into one shared library.

#include <cstdint>

extern "C" {

// In-place reduced row echelon form over GF(2).
// M: m rows of n_words little-endian uint64 words; column c lives at
// word c/64, bit c%64. Bits beyond n_bits must be zero. Returns the rank.
long gf2_rref(uint64_t* M, long m, long n_bits) {
  if (m <= 0 || n_bits <= 0) return 0;
  const long nw = (n_bits + 63) / 64;
  long lead = 0;
  long r = 0;
  for (; r < m; ++r) {
    if (lead >= n_bits) break;
    long w = lead >> 6;
    uint64_t bit = 1ULL << (lead & 63);
    long piv = -1;
    for (;;) {
      for (long i = r; i < m; ++i) {
        if (M[i * nw + w] & bit) {
          piv = i;
          break;
        }
      }
      if (piv >= 0) break;
      if (++lead == n_bits) return r;
      w = lead >> 6;
      bit = 1ULL << (lead & 63);
    }
    if (piv != r) {
      uint64_t* a = M + r * nw;
      uint64_t* b = M + piv * nw;
      for (long k = 0; k < nw; ++k) {
        uint64_t t = a[k];
        a[k] = b[k];
        b[k] = t;
      }
    }
    const uint64_t* pr = M + r * nw;
    for (long i = 0; i < m; ++i) {
      if (i == r) continue;
      uint64_t* row = M + i * nw;
      if (row[w] & bit) {
        for (long k = 0; k < nw; ++k) row[k] ^= pr[k];
      }
    }
    ++lead;
  }
  return r;
}

}  // extern "C"
