// Native host-side traceback walker + CIGAR run-length encoder.
//
// TPU-native equivalent of the reference's AlignedSequence construction
// loop (SeqALib traceback walk in NeedlemanWunschSA::buildAlignment,
// SURVEY.md 3.1): the device kernels emit packed pointer matrices to HBM
// (wavefront_pallas); the pointer chase itself is scalar and branchy --
// the one part of the pipeline TPUs are structurally bad at -- so it runs
// on the host.  The NumPy fallback walks all pairs in lockstep (every
// pair pays the longest pair's step count); this C++ walker runs each
// pair independently and fuses the run-length encoding, so the Python
// layer only formats (op, count) runs into CIGAR strings.
//
// Pointer byte layout (must match seqalib_tpu.types / wavefront_pallas):
//   bits 0-1: H provenance  0=STOP 1=DIAG 2=UP 3=LEFT
//   bit  2:   E came from E (extend) rather than H (open)
//   bit  3:   F came from F (extend) rather than H (open)
//
// Ops: 0=M 1=I 2=D (utils/cigar.py).  Runs are emitted in WALK order
// (end -> start); callers reverse when formatting.

#include <cstdint>

namespace {
constexpr int PTR_STOP = 0;
constexpr int PTR_DIAG = 1;
constexpr int PTR_UP = 2;
constexpr int PTR_LEFT = 3;
constexpr int OP_M = 0;
constexpr int OP_I = 1;
constexpr int OP_D = 2;

inline void push_run(uint8_t op, uint8_t* run_ops, int32_t* run_cnts,
                     int32_t& nr) {
  if (nr > 0 && run_ops[nr - 1] == op) {
    run_cnts[nr - 1] += 1;
  } else {
    run_ops[nr] = op;
    run_cnts[nr] = 1;
    nr += 1;
  }
}
}  // namespace

extern "C" {

// P: (Kp, B, Np) int8 packed pointers, P[k][b][i] for cell (i, j=k-i).
// si/sj: (B,) walk start coords.  done0: (B,) skip flags.
// run_ops/run_cnts: (B, cap) outputs; nruns: (B,); fi/fj: (B,) final coords.
void sq_walk_linear(const int8_t* P, int64_t Kp, int64_t B, int64_t Np,
                    const int64_t* si, const int64_t* sj,
                    const uint8_t* done0, int64_t cap, uint8_t* run_ops,
                    int32_t* run_cnts, int32_t* nruns, int64_t* fi,
                    int64_t* fj) {
  for (int64_t b = 0; b < B; ++b) {
    int64_t i = si[b], j = sj[b];
    int32_t nr = 0;
    uint8_t* ro = run_ops + b * cap;
    int32_t* rc = run_cnts + b * cap;
    if (!done0[b]) {
      while (true) {
        const int p = P[(i + j) * B * Np + b * Np + i] & 3;
        if (p == PTR_STOP) break;
        if (p == PTR_DIAG) {
          push_run(OP_M, ro, rc, nr);
          --i;
          --j;
        } else if (p == PTR_UP) {
          push_run(OP_I, ro, rc, nr);
          --i;
        } else {
          push_run(OP_D, ro, rc, nr);
          --j;
        }
      }
    }
    nruns[b] = nr;
    fi[b] = i;
    fj[b] = j;
  }
}

// Affine walk: H/E/F state machine with extend bits (wavefront_pallas
// _host_traceback_affine semantics).
void sq_walk_affine(const int8_t* P, int64_t Kp, int64_t B, int64_t Np,
                    const int64_t* si, const int64_t* sj,
                    const uint8_t* done0, int64_t cap, uint8_t* run_ops,
                    int32_t* run_cnts, int32_t* nruns, int64_t* fi,
                    int64_t* fj) {
  constexpr int ST_H = 0, ST_E = 1, ST_F = 2;
  for (int64_t b = 0; b < B; ++b) {
    int64_t i = si[b], j = sj[b];
    int st = ST_H;
    int32_t nr = 0;
    uint8_t* ro = run_ops + b * cap;
    int32_t* rc = run_cnts + b * cap;
    if (!done0[b]) {
      while (true) {
        const int byte = P[(i + j) * B * Np + b * Np + i];
        const int ph = byte & 3;
        const bool ext_e = (byte >> 2) & 1;
        const bool ext_f = (byte >> 3) & 1;
        if (st == ST_H) {
          if (ph == PTR_STOP) break;
          if (ph == PTR_DIAG) {
            push_run(OP_M, ro, rc, nr);
            --i;
            --j;
          } else if (ph == PTR_UP) {
            push_run(OP_I, ro, rc, nr);
            --i;
            if (ext_f) st = ST_F;
          } else {
            push_run(OP_D, ro, rc, nr);
            --j;
            if (ext_e) st = ST_E;
          }
        } else if (st == ST_F) {
          push_run(OP_I, ro, rc, nr);
          --i;
          if (!ext_f) st = ST_H;
        } else {
          push_run(OP_D, ro, rc, nr);
          --j;
          if (!ext_e) st = ST_H;
        }
      }
    }
    nruns[b] = nr;
    fi[b] = i;
    fj[b] = j;
  }
}

// Strip-layout walk (ops/strip_pallas.py pointer matrices):
// P[gb, s, k, pr, p] (int8) is the packed byte of DP cell (i, j) with
// i = s*TI + p + 1, j = k - p, pair = gb*BSUB + pr.  DP row 0 / column 0
// are implicit STOP cells (local boundary; not stored).  affine != 0
// runs the H/E/F state machine on the extend bits.
void sq_walk_strip(const int8_t* P, int64_t GB, int64_t S, int64_t K,
                   int64_t BSUB, int64_t TI, int64_t B, const int64_t* si,
                   const int64_t* sj, const uint8_t* done0, int affine,
                   int global_mode, int64_t cap, uint8_t* run_ops,
                   int32_t* run_cnts, int32_t* nruns, int64_t* fi,
                   int64_t* fj) {
  constexpr int ST_H = 0, ST_E = 1, ST_F = 2;
  (void)GB;
  for (int64_t b = 0; b < B; ++b) {
    int64_t i = si[b], j = sj[b];
    const int64_t gb = b / BSUB, pr = b % BSUB;
    int st = ST_H;
    int32_t nr = 0;
    uint8_t* ro = run_ops + b * cap;
    int32_t* rc = run_cnts + b * cap;
    if (!done0[b]) {
      while (true) {
        if (global_mode && st == ST_H) {
          // DP row 0 / column 0 are not stored; a global walk runs them
          // to the origin (all-D along row 0, all-I along column 0 --
          // exactly the oracle's boundary pointers)
          if (i == 0 && j == 0) break;
          if (i == 0) {
            push_run(2, ro, rc, nr);
            --j;
            continue;
          }
          if (j == 0) {
            push_run(1, ro, rc, nr);
            --i;
            continue;
          }
        }
        int byte = 0;
        if (i >= 1 && j >= 1) {
          const int64_t s = (i - 1) / TI, p = (i - 1) % TI, k = j + p;
          byte = P[(((gb * S + s) * K + k) * BSUB + pr) * TI + p];
        }
        const int ph = byte & 3;
        const bool ext_e = (byte >> 2) & 1;
        const bool ext_f = (byte >> 3) & 1;
        if (st == ST_H) {
          if (ph == PTR_STOP) break;
          if (ph == PTR_DIAG) {
            push_run(0, ro, rc, nr);
            --i;
            --j;
          } else if (ph == PTR_UP) {
            push_run(1, ro, rc, nr);
            --i;
            if (affine && ext_f) st = ST_F;
          } else {
            push_run(2, ro, rc, nr);
            --j;
            if (affine && ext_e) st = ST_E;
          }
        } else if (st == ST_F) {
          push_run(1, ro, rc, nr);
          --i;
          if (!ext_f) st = ST_H;
        } else {
          push_run(2, ro, rc, nr);
          --j;
          if (!ext_e) st = ST_H;
        }
      }
    }
    nruns[b] = nr;
    fi[b] = i;
    fj[b] = j;
  }
}

// Banded checkpointed-traceback block walk (models/banded.py pass 2).
// P: (KW, B, Wp) int8 packed pointers for anti-diagonals [k0, k0+KW);
// band slot p = i - ihat(k), ihat(k) = max(0, floor((k - dhi + 1) / 2)).
// ii/jj/st/done persist ACROSS super-block calls (the walk spans many
// blocks, last to first), as do the run buffers: push_run merges a run
// that continues over a block boundary.  st: 0=H 1=E 2=D-run... (matches
// models/banded.py ST_H/ST_E/ST_F = 0/1/2).
void sq_walk_banded(const int8_t* P, int64_t KW, int64_t B, int64_t Wp,
                    int64_t k0, int64_t dhi, int64_t* ii, int64_t* jj,
                    uint8_t* st, uint8_t* done, int64_t cap,
                    uint8_t* run_ops, int32_t* run_cnts, int32_t* nruns) {
  constexpr int ST_H = 0, ST_E = 1, ST_F = 2;
  for (int64_t b = 0; b < B; ++b) {
    if (done[b]) continue;
    int64_t i = ii[b], j = jj[b];
    int s = st[b];
    int32_t nr = nruns[b];
    uint8_t* ro = run_ops + b * cap;
    int32_t* rc = run_cnts + b * cap;
    while (true) {
      const int64_t k = i + j;
      if (k < k0 || k >= k0 + KW) break;  // next (earlier) block's turn
      const int64_t num = k - dhi + 1;
      const int64_t ih = num > 0 ? num / 2 : 0;
      int64_t p = i - ih;
      if (p < 0) p = 0;
      if (p >= Wp) p = Wp - 1;
      const int byte = P[(k - k0) * B * Wp + b * Wp + p];
      const int ph = byte & 3;
      const bool ee = (byte >> 2) & 1;
      const bool ef = (byte >> 3) & 1;
      if (s == ST_H) {
        if (ph == PTR_STOP) {
          done[b] = 1;
          break;
        }
        if (ph == PTR_DIAG) {
          push_run(OP_M, ro, rc, nr);
          --i;
          --j;
        } else if (ph == PTR_UP) {
          push_run(OP_I, ro, rc, nr);
          s = ef ? ST_F : ST_H;
          --i;
        } else {
          push_run(OP_D, ro, rc, nr);
          s = ee ? ST_E : ST_H;
          --j;
        }
      } else if (s == ST_F) {
        push_run(OP_I, ro, rc, nr);
        s = ef ? ST_F : ST_H;
        --i;
      } else {  // ST_E
        push_run(OP_D, ro, rc, nr);
        s = ee ? ST_E : ST_H;
        --j;
      }
    }
    ii[b] = i;
    jj[b] = j;
    st[b] = static_cast<uint8_t>(s);
    nruns[b] = nr;
  }
}

// Batch RLE of padded op rows (ops: (B, L) uint8, 255 = padding) in the
// given order; used to accelerate utils.cigar.ops_batch_to_cigars.
void sq_rle(const uint8_t* ops, int64_t B, int64_t L, int64_t cap,
            uint8_t* run_ops, int32_t* run_cnts, int32_t* nruns) {
  for (int64_t b = 0; b < B; ++b) {
    const uint8_t* row = ops + b * L;
    uint8_t* ro = run_ops + b * cap;
    int32_t* rc = run_cnts + b * cap;
    int32_t nr = 0;
    for (int64_t x = 0; x < L; ++x) {
      const uint8_t op = row[x];
      if (op == 255) break;
      push_run(op, ro, rc, nr);
    }
    nruns[b] = nr;
  }
}

}  // extern "C"
