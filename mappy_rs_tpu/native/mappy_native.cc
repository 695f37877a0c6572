// Native host-side inner loops for mappy_rs_tpu.
//
// TPU-native counterpart of the native runtime the reference gets from
// Rust/C (SURVEY.md §2b): the device produces packed traceback
// direction bytes (ops/extend.py); the strictly-sequential O(path)
// walks, base encoding and tag generation run here instead of Python.
// Loaded via ctypes (native/__init__.py) with a pure-numpy fallback.
//
// Build: make -C mappy_rs_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

// direction byte layout (must match ops/extend.py)
constexpr uint8_t H_SRC_MASK = 0x07;
constexpr uint8_t E1_CONT = 0x08;
constexpr uint8_t E2_CONT = 0x10;
constexpr uint8_t F1_CONT = 0x20;
constexpr uint8_t F2_CONT = 0x40;

inline int band_lo(int s, int qlen, int tlen, int W) {
  // static anti-diagonal band; must match ops/extend.py band_lo_host
  (void)qlen;
  (void)tlen;
  long lo = (long)(s / 2) - W / 2 + 1;
  return lo < 0 ? 0 : (int)lo;
}

}  // namespace

extern "C" {

// ASCII -> 0..4 base codes
void encode_ascii(const char* s, int64_t n, uint8_t* out) {
  static uint8_t table[256];
  static bool init = false;
  if (!init) {
    memset(table, 4, sizeof(table));
    table['A'] = table['a'] = 0;
    table['C'] = table['c'] = 1;
    table['G'] = table['g'] = 2;
    table['T'] = table['t'] = 3;
    table['U'] = table['u'] = 3;
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) out[i] = table[(uint8_t)s[i]];
}

// Walk packed traceback directions for a batch of DP jobs.
//   dirs:   [S, J, W] uint8 (diag-major, job, band-lane)
//   out_ops: per job, up to max_ops (len, op) pairs packed len<<4|op,
//            written from alignment START; out_n = count (-1 overflow)
void traceback_batch(const uint8_t* dirs, int S, int J, int W,
                     const int32_t* qlen, const int32_t* tlen,
                     const int32_t* start_i, const int32_t* start_j,
                     int32_t* out_ops, int32_t* out_n, int max_ops) {
  for (int job = 0; job < J; ++job) {
    int32_t* ops = out_ops + (int64_t)job * max_ops;
    int n_ops = 0;
    bool overflow = false;
    int ql = qlen[job], tl = tlen[job];
    int i = start_i[job], j = start_j[job];
    int state = 0;  // 0=M 1=E1 2=E2 3=F1 4=F2
    auto emit = [&](int op, int cnt) {
      if (n_ops > 0 && (ops[n_ops - 1] & 0xF) == op) {
        ops[n_ops - 1] += cnt << 4;
      } else if (n_ops < max_ops) {
        ops[n_ops++] = (cnt << 4) | op;
      } else {
        overflow = true;
      }
    };
    while (i >= 0 && j >= 0 && !overflow) {
      int s = i + j;
      int d = i - band_lo(s, ql, tl, W);
      uint8_t byte = 0;
      if (d >= 0 && d < W && s < S)
        byte = dirs[((int64_t)s * J + job) * W + d];
      if (state == 0) {
        int src = byte & H_SRC_MASK;
        if (src == 0) {
          emit(0, 1);
          --i;
          --j;
        } else {
          state = src;
        }
      } else if (state == 1 || state == 2) {
        emit(2, 1);  // D consumes ref
        bool cont = byte & (state == 1 ? E1_CONT : E2_CONT);
        --j;
        if (!cont) state = 0;
      } else {
        emit(1, 1);  // I consumes query
        bool cont = byte & (state == 3 ? F1_CONT : F2_CONT);
        --i;
        if (!cont) state = 0;
      }
    }
    if (i >= 0) emit(1, i + 1);
    if (j >= 0) emit(2, j + 1);
    // reverse to alignment-start order
    for (int a = 0, b = n_ops - 1; a < b; ++a, --b)
      std::swap(ops[a], ops[b]);
    out_n[job] = overflow ? -1 : n_ops;
  }
}

// CIGAR statistics: mlen (exact matches), blen (M+I+D), NM.
void cigar_stats(const int32_t* ops, int n_ops, const uint8_t* q,
                 const uint8_t* t, int32_t* out) {
  int64_t qi = 0, ti = 0, mlen = 0, blen = 0, nm = 0;
  for (int k = 0; k < n_ops; ++k) {
    int op = ops[k] & 0xF;
    int n = ops[k] >> 4;
    blen += n;
    if (op == 0) {
      for (int x = 0; x < n; ++x) {
        if (q[qi + x] == t[ti + x] && q[qi + x] < 4)
          ++mlen;
        else
          ++nm;
      }
      qi += n;
      ti += n;
    } else if (op == 1) {
      nm += n;
      qi += n;
    } else {
      nm += n;
      ti += n;
    }
  }
  out[0] = (int32_t)mlen;
  out[1] = (int32_t)blen;
  out[2] = (int32_t)nm;
}

}  // extern "C"
