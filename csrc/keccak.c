/* Keccak-f[1600] permutation + legacy Keccak-256 digest, C implementation.
 *
 * Host-side native component: the Fiat-Shamir transcript absorbs thousands
 * of 32-byte field reprs per proof; the python keccak is the host
 * bottleneck at large k. Loaded via ctypes from ops/keccak.py (pure-python
 * fallback kept for environments without a toolchain).
 *
 * Build: gcc -O3 -shared -fPIC -o libkeccak.so keccak.c
 */

#include <stdint.h>
#include <string.h>

#define ROTL64(x, n) (((x) << (n)) | ((x) >> (64 - (n))))

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int ROTC[24] = {1,  3,  6,  10, 15, 21, 28, 36, 45, 55, 2,  14,
                             27, 41, 56, 8,  25, 43, 62, 18, 39, 61, 20, 44};
static const int PILN[24] = {10, 7,  11, 17, 18, 3,  5,  16, 8,  21, 24, 4,
                             15, 23, 19, 13, 12, 2,  20, 14, 22, 9,  6,  1};

void keccak_f1600(uint64_t st[25]) {
  uint64_t bc[5], t;
  for (int round = 0; round < 24; round++) {
    /* theta */
    for (int i = 0; i < 5; i++)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; i++) {
      t = bc[(i + 4) % 5] ^ ROTL64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    /* rho + pi */
    t = st[1];
    for (int i = 0; i < 24; i++) {
      int j = PILN[i];
      bc[0] = st[j];
      st[j] = ROTL64(t, ROTC[i]);
      t = bc[0];
    }
    /* chi */
    for (int j = 0; j < 25; j += 5) {
      for (int i = 0; i < 5; i++) bc[i] = st[j + i];
      for (int i = 0; i < 5; i++)
        st[j + i] = bc[i] ^ ((~bc[(i + 1) % 5]) & bc[(i + 2) % 5]);
    }
    /* iota */
    st[0] ^= RC[round];
  }
}

/* incremental sponge state: 25 lanes + byte buffer handled by caller.
 * absorb `len` bytes (len % 136 == 0) into the state. */
void keccak256_absorb_blocks(uint64_t st[25], const uint8_t *data,
                             uint64_t nblocks) {
  for (uint64_t b = 0; b < nblocks; b++) {
    for (int i = 0; i < 17; i++) {
      uint64_t lane;
      memcpy(&lane, data + b * 136 + i * 8, 8);
      st[i] ^= lane;
    }
    keccak_f1600(st);
  }
}

/* finalize a COPY of the state with legacy 0x01 padding over `rem` buffered
 * bytes, write 32-byte digest. */
void keccak256_finalize(const uint64_t st_in[25], const uint8_t *rem,
                        uint64_t rem_len, uint8_t out[32]) {
  uint64_t st[25];
  memcpy(st, st_in, sizeof(st));
  uint8_t block[136];
  memset(block, 0, sizeof(block));
  memcpy(block, rem, rem_len);
  block[rem_len] = 0x01;
  block[135] |= 0x80;
  for (int i = 0; i < 17; i++) {
    uint64_t lane;
    memcpy(&lane, block + i * 8, 8);
    st[i] ^= lane;
  }
  keccak_f1600(st);
  memcpy(out, st, 32);
}
