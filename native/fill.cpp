// Native host runtime: transducer-composition Forward/Backward fills.
//
// The regular tensor compute (emission einsums, column-batched
// sum-product, chain-pair kernels) runs on the accelerator through XLA;
// this library is the native "executor" for the irregular part -- the
// sparse-DAG DP fill over profile-state pairs (reference semantics:
// forward.cpp:68-223 and 975-1097) -- where per-cell control flow
// dominates and Python loop overhead would otherwise bound throughput.
//
// Built as a plain shared library, loaded via ctypes (see
// historian_tpu/native.py).  All inputs are flat C arrays prepared by
// the Python caller (CSR edge lists per profile state).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libhistfill.so fill.cpp

#include <cmath>
#include <cstdint>

static const double NEG_INF = -INFINITY;
static const double LOG2 = 0.693147180559945309417232121458176568;

static inline double lse2(double x, double y) {
  if (x == y) return x + LOG2;  // also handles both == -inf
  const double d = x - y;
  if (d > 0) return x + log1p(exp(-d));
  if (d <= 0) return y + log1p(exp(d));
  return x + y;  // nan propagation
}

// state indices (match engine/pairhmm.py)
enum { IMM = 0, IMD = 1, IDM = 2, IMI = 3, IIW = 4 };

struct Trans {
  double imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw;
  double imd_imm, imd_imd, imd_idm;
  double idm_imm, idm_imd, idm_idm;
  double imi_imm, imi_imd, imi_imi, imi_iiw;
  double iiw_imm, iiw_idm, iiw_iiw;
};

extern "C" void forward_fill(
    int64_t sx, int64_t sy,
    const int64_t* x_in_ptr, const int64_t* x_in_src, const double* x_in_lp,
    const int64_t* y_in_ptr, const int64_t* y_in_src, const double* y_in_lp,
    const uint8_t* x_null, const uint8_t* y_null,
    const uint8_t* x_ready, const uint8_t* y_ready,
    const uint8_t* x_emit_or_start,
    uint8_t x_empty, uint8_t y_empty,
    const double* insx, const double* rootsubx,
    const double* insy, const double* rootsuby,
    const double* absorb,        // [sx * sy]
    const uint8_t* env_mask,     // [sx * sy]
    const double* trans18,       // 18 transition log-probs, Trans order
    double* cells                // [sx * sy * 5], pre-filled with -inf
) {
  const Trans* t = reinterpret_cast<const Trans*>(trans18);
  #define CELL(i, j, s) cells[(((i) * sy) + (j)) * 5 + (s)]
  CELL(0, 0, IMM) = 0.0;  // start

  for (int64_t i = 0; i < sx - 1; ++i) {
    const bool xnull = x_null[i];
    const bool x_ready_or_empty = x_ready[i] || x_empty;
    for (int64_t j = 0; j < sy - 1; ++j) {
      if (!env_mask[i * sy + j]) continue;
      const bool ynull = y_null[j];
      const bool y_ready_or_empty = y_ready[j] || y_empty;
      double imm = (i == 0 && j == 0) ? 0.0 : NEG_INF;
      double imd = NEG_INF, idm = NEG_INF, imi = NEG_INF, iiw = NEG_INF;

      if (!xnull) {
        // x-absorbing transitions into IMD, IIW
        if (y_ready_or_empty) {
          for (int64_t e = x_in_ptr[i]; e < x_in_ptr[i + 1]; ++e) {
            const int64_t src = x_in_src[e];
            const double lp = x_in_lp[e];
            const double* sc = &CELL(src, j, 0);
            imd = lse2(imd, lse2(lse2(lse2(sc[IMM] + t->imm_imd, sc[IMD] + t->imd_imd),
                                      sc[IDM] + t->idm_imd), sc[IMI] + t->imi_imd) + lp);
            iiw = lse2(iiw, lse2(lse2(sc[IMM] + t->imm_iiw, sc[IMI] + t->imi_iiw),
                                 sc[IIW] + t->iiw_iiw) + lp);
          }
          imd += rootsubx[i];
          iiw += insx[i];
        }
      } else {
        // x-nonabsorbing transitions in IMD, IIW
        if (y_ready_or_empty) {
          for (int64_t e = x_in_ptr[i]; e < x_in_ptr[i + 1]; ++e) {
            const double* sc = &CELL(x_in_src[e], j, 0);
            imd = lse2(imd, sc[IMD] + x_in_lp[e]);
            iiw = lse2(iiw, sc[IIW] + x_in_lp[e]);
          }
        }
      }

      if (!ynull) {
        // y-absorbing transitions into IDM, IMI
        if (x_ready_or_empty) {
          for (int64_t e = y_in_ptr[j]; e < y_in_ptr[j + 1]; ++e) {
            const int64_t src = y_in_src[e];
            const double lp = y_in_lp[e];
            const double* sc = &CELL(i, src, 0);
            idm = lse2(idm, lse2(lse2(lse2(sc[IMM] + t->imm_idm, sc[IMD] + t->imd_idm),
                                      sc[IDM] + t->idm_idm), sc[IIW] + t->iiw_idm) + lp);
            imi = lse2(imi, lse2(sc[IMM] + t->imm_imi, sc[IMI] + t->imi_imi) + lp);
          }
          idm += rootsuby[j];
          imi += insy[j];
        }
      } else {
        // y-nonabsorbing transitions in IDM, IMI
        for (int64_t e = y_in_ptr[j]; e < y_in_ptr[j + 1]; ++e) {
          const double* sc = &CELL(i, y_in_src[e], 0);
          idm = lse2(idm, sc[IDM] + y_in_lp[e]);
          imi = lse2(imi, sc[IMI] + y_in_lp[e]);
        }
      }

      if (!xnull && !ynull) {
        // xy-absorbing transitions into IMM
        for (int64_t ex = x_in_ptr[i]; ex < x_in_ptr[i + 1]; ++ex) {
          const int64_t xsrc = x_in_src[ex];
          const double xlp = x_in_lp[ex];
          for (int64_t ey = y_in_ptr[j]; ey < y_in_ptr[j + 1]; ++ey) {
            const double* sc = &CELL(xsrc, y_in_src[ey], 0);
            imm = lse2(imm,
                       lse2(lse2(lse2(lse2(sc[IMM] + t->imm_imm, sc[IMD] + t->imd_imm),
                                      sc[IDM] + t->idm_imm), sc[IMI] + t->imi_imm),
                            sc[IIW] + t->iiw_imm)
                       + xlp + y_in_lp[ey]);
          }
        }
        imm += absorb[i * sy + j];
        if (i == 0 && j == 0) imm = 0.0;
      } else if (ynull && x_emit_or_start[i]) {
        // y-nonabsorbing transitions in IMM
        for (int64_t e = y_in_ptr[j]; e < y_in_ptr[j + 1]; ++e)
          imm = lse2(imm, CELL(i, y_in_src[e], IMM) + y_in_lp[e]);
        if (i == 0 && j == 0) imm = 0.0;
      } else if (xnull) {
        // x-nonabsorbing transitions in IMM
        if (y_ready_or_empty) {
          double acc = NEG_INF;
          for (int64_t e = x_in_ptr[i]; e < x_in_ptr[i + 1]; ++e)
            acc = lse2(acc, CELL(x_in_src[e], j, IMM) + x_in_lp[e]);
          imm = (i == 0 && j == 0) ? 0.0 : acc;
        } else
          imm = (i == 0 && j == 0) ? 0.0 : NEG_INF;
      }

      double* dst = &CELL(i, j, 0);
      dst[IMM] = imm;
      dst[IMD] = imd;
      dst[IDM] = idm;
      dst[IMI] = imi;
      dst[IIW] = iiw;
    }
  }
  #undef CELL
}

extern "C" void backward_fill(
    int64_t sx, int64_t sy,
    const int64_t* x_abs_ptr, const int64_t* x_abs_dest, const double* x_abs_lp,
    const int64_t* x_nul_ptr, const int64_t* x_nul_dest, const double* x_nul_lp,
    const int64_t* y_abs_ptr, const int64_t* y_abs_dest, const double* y_abs_lp,
    const int64_t* y_nul_ptr, const int64_t* y_nul_dest, const double* y_nul_lp,
    const uint8_t* x_ready, const uint8_t* y_ready,
    const uint8_t* x_emit_or_start,
    uint8_t x_empty, uint8_t y_empty,
    const double* insx, const double* rootsubx,
    const double* insy, const double* rootsuby,
    const double* absorb,
    const uint8_t* env_mask,
    const double* trans18,
    double* cells  // [sx * sy * 5], pre-seeded with end transitions by caller
) {
  const Trans* t = reinterpret_cast<const Trans*>(trans18);
  #define CELL(i, j, s) cells[(((i) * sy) + (j)) * 5 + (s)]

  for (int64_t i = sx - 2; i >= 0; --i) {
    const bool x_ready_or_empty = x_ready[i] || x_empty;
    for (int64_t j = sy - 2; j >= 0; --j) {
      if (!env_mask[i * sy + j]) continue;
      const bool y_ready_or_empty = y_ready[j] || y_empty;
      double* dst = &CELL(i, j, 0);
      double imm = dst[IMM], imd = dst[IMD], idm = dst[IDM], imi = dst[IMI], iiw = dst[IIW];

      // xy-absorbing transitions into IMM
      for (int64_t ex = x_abs_ptr[i]; ex < x_abs_ptr[i + 1]; ++ex) {
        const int64_t xd = x_abs_dest[ex];
        const double xlp = x_abs_lp[ex];
        for (int64_t ey = y_abs_ptr[j]; ey < y_abs_ptr[j + 1]; ++ey) {
          const int64_t yd = y_abs_dest[ey];
          const double dest_imm = xlp + y_abs_lp[ey] + absorb[xd * sy + yd] + CELL(xd, yd, IMM);
          imm = lse2(imm, t->imm_imm + dest_imm);
          imd = lse2(imd, t->imd_imm + dest_imm);
          idm = lse2(idm, t->idm_imm + dest_imm);
          imi = lse2(imi, t->imi_imm + dest_imm);
          iiw = lse2(iiw, t->iiw_imm + dest_imm);
        }
      }

      // x-absorbing transitions into IMD, IIW
      if (y_ready_or_empty) {
        for (int64_t ex = x_abs_ptr[i]; ex < x_abs_ptr[i + 1]; ++ex) {
          const int64_t xd = x_abs_dest[ex];
          const double dest_imd = x_abs_lp[ex] + rootsubx[xd] + CELL(xd, j, IMD);
          const double dest_iiw = x_abs_lp[ex] + insx[xd] + CELL(xd, j, IIW);
          imm = lse2(imm, t->imm_imd + dest_imd);
          imd = lse2(imd, t->imd_imd + dest_imd);
          idm = lse2(idm, t->idm_imd + dest_imd);
          imi = lse2(imi, t->imi_imd + dest_imd);
          imm = lse2(imm, t->imm_iiw + dest_iiw);
          imi = lse2(imi, t->imi_iiw + dest_iiw);
          iiw = lse2(iiw, t->iiw_iiw + dest_iiw);
        }
      }

      // y-absorbing transitions into IDM, IMI
      if (x_ready_or_empty) {
        for (int64_t ey = y_abs_ptr[j]; ey < y_abs_ptr[j + 1]; ++ey) {
          const int64_t yd = y_abs_dest[ey];
          const double dest_idm = y_abs_lp[ey] + rootsuby[yd] + CELL(i, yd, IDM);
          const double dest_imi = y_abs_lp[ey] + insy[yd] + CELL(i, yd, IMI);
          imm = lse2(imm, t->imm_idm + dest_idm);
          imd = lse2(imd, t->imd_idm + dest_idm);
          idm = lse2(idm, t->idm_idm + dest_idm);
          iiw = lse2(iiw, t->iiw_idm + dest_idm);
          imm = lse2(imm, t->imm_imi + dest_imi);
          imi = lse2(imi, t->imi_imi + dest_imi);
        }
      }

      // x-nonabsorbing (null) transitions: IMD, IIW, IMM propagate
      if (y_ready_or_empty) {
        for (int64_t ex = x_nul_ptr[i]; ex < x_nul_ptr[i + 1]; ++ex) {
          const int64_t xd = x_nul_dest[ex];
          const double lp = x_nul_lp[ex];
          if (xd >= sx) continue;
          imd = lse2(imd, lp + CELL(xd, j, IMD));
          iiw = lse2(iiw, lp + CELL(xd, j, IIW));
          imm = lse2(imm, lp + CELL(xd, j, IMM));
        }
      }

      // y-nonabsorbing (null) transitions: IDM, IMI, IMM propagate
      for (int64_t ey = y_nul_ptr[j]; ey < y_nul_ptr[j + 1]; ++ey) {
        const int64_t yd = y_nul_dest[ey];
        const double lp = y_nul_lp[ey];
        if (yd >= sy - 1) continue;
        idm = lse2(idm, lp + CELL(i, yd, IDM));
        imi = lse2(imi, lp + CELL(i, yd, IMI));
        if (x_emit_or_start[i])
          imm = lse2(imm, lp + CELL(i, yd, IMM));
      }

      dst[IMM] = imm;
      dst[IMD] = imd;
      dst[IDM] = idm;
      dst[IMI] = imi;
      dst[IIW] = iiw;
    }
  }
  #undef CELL
}
