// Single-core CPU baseline for the pair-transducer Forward DP.
//
// Re-creates the computational shape of the reference implementation's
// hot loop (5-state composed-transducer Forward fill with lookup-table
// log-sum-exp over a dense profile-pair grid; see SURVEY.md 2.4) so the
// TPU kernel's throughput can be compared against an honest optimized
// single-core C++ rate measured on the same machine.
//
// Build: g++ -O3 -march=native -o bench_baseline bench_baseline.cpp
// Run:   ./bench_baseline <xlen> <ylen> <alphabet> <components> <reps>
// Output: cells-per-second (cells = xlen * ylen * 5)

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <limits>
#include <vector>

static const int LOOKUP_ENTRIES = 100001;
static const double LOOKUP_MAX = 10.0, LOOKUP_PREC = 1e-4;
static std::vector<double> lut;

static void init_lut() {
  lut.resize(LOOKUP_ENTRIES + 1);
  for (int i = 0; i <= LOOKUP_ENTRIES; ++i)
    lut[i] = std::log(1.0 + std::exp(-i * LOOKUP_PREC));
}

static inline double lse2(double a, double b) {
  if (a < b) { double t = a; a = b; b = t; }
  const double d = a - b;
  if (d >= LOOKUP_MAX || b == -std::numeric_limits<double>::infinity()) return a;
  const int n = (int)(d / LOOKUP_PREC);
  const double f0 = lut[n], f1 = lut[n + 1];
  return a + f0 + (f1 - f0) * ((d - n * LOOKUP_PREC) / LOOKUP_PREC);
}

int main(int argc, char** argv) {
  if (argc != 6) { std::fprintf(stderr, "usage: %s xlen ylen A C reps\n", argv[0]); return 1; }
  const int X = std::atoi(argv[1]), Y = std::atoi(argv[2]);
  const int A = std::atoi(argv[3]), C = std::atoi(argv[4]), reps = std::atoi(argv[5]);
  init_lut();

  // random emission profiles (linear space) and substitution matrices
  std::vector<double> xprof((X + 1) * C * A), yprof((Y + 1) * C * A);
  std::vector<double> sub(C * A * A), root(C * A);
  unsigned seed = 12345;
  auto rnd = [&]() { seed = seed * 1103515245u + 12345u; return (seed >> 8) * (1.0 / 16777216.0); };
  for (auto& v : xprof) v = rnd() + 1e-3;
  for (auto& v : yprof) v = rnd() + 1e-3;
  for (auto& v : sub) v = rnd() + 1e-3;
  for (auto& v : root) v = (rnd() + 1e-3) / (A * C);

  const double t_imm_imm = std::log(0.9), t_open = std::log(0.04), t_ext = std::log(0.4),
               t_close = std::log(0.55);
  const double NEG = -1e30;

  // precompute per-state emission scores the way the reference does
  // (forward.cpp:44-56): subx = leftMultiply, then inner products per pair
  std::vector<double> subx((X + 1) * C * A), suby((Y + 1) * C * A);
  auto leftmul = [&](const std::vector<double>& prof, std::vector<double>& out, int N) {
    for (int i = 0; i <= N; ++i)
      for (int c = 0; c < C; ++c)
        for (int a = 0; a < A; ++a) {
          double s = 0;
          for (int d = 0; d < A; ++d)
            s += sub[(c * A + a) * A + d] * prof[(i * C + c) * A + d];
          out[(i * C + c) * A + a] = s;
        }
  };

  std::vector<double> imm((Y + 1)), imd(Y + 1), idm(Y + 1), imi(Y + 1), iiw(Y + 1);
  std::vector<double> p_imm(Y + 1), p_imd(Y + 1), p_idm(Y + 1), p_imi(Y + 1), p_iiw(Y + 1);

  double sink = 0;
  auto t0 = std::chrono::steady_clock::now();
  for (int rep = 0; rep < reps; ++rep) {
    leftmul(xprof, subx, X);
    leftmul(yprof, suby, Y);
    for (int j = 0; j <= Y; ++j) p_imm[j] = p_imd[j] = p_idm[j] = p_imi[j] = p_iiw[j] = NEG;
    p_imm[0] = 0;
    for (int i = 1; i <= X; ++i) {
      imm[0] = imd[0] = idm[0] = imi[0] = iiw[0] = NEG;
      for (int j = 1; j <= Y; ++j) {
        // emission inner products over components x alphabet (the FLOPs)
        double absorb = 0, rsx = 0, rsy = 0;
        for (int c = 0; c < C; ++c)
          for (int a = 0; a < A; ++a) {
            const double r = root[c * A + a];
            const double sx = subx[(i * C + c) * A + a];
            const double sy = suby[(j * C + c) * A + a];
            absorb += r * sx * sy;
            rsx += r * sx;
            rsy += r * sy;
          }
        const double labs = std::log(absorb), lrsx = std::log(rsx), lrsy = std::log(rsy);
        imm[j] = lse2(lse2(p_imm[j - 1] + t_imm_imm, p_imd[j - 1] + t_close),
                      lse2(p_idm[j - 1] + t_close,
                           lse2(p_imi[j - 1] + t_close, p_iiw[j - 1] + t_close))) + labs;
        imd[j] = lse2(lse2(p_imm[j] + t_open, p_imd[j] + t_ext),
                      lse2(p_idm[j] + t_close, p_imi[j] + t_close)) + lrsx;
        iiw[j] = lse2(lse2(p_imm[j] + t_open, p_imi[j] + t_close), p_iiw[j] + t_ext) + lrsx;
        idm[j] = lse2(lse2(imm[j - 1] + t_open, imd[j - 1] + t_close),
                      lse2(idm[j - 1] + t_ext, iiw[j - 1] + t_close)) + lrsy;
        imi[j] = lse2(imm[j - 1] + t_open, imi[j - 1] + t_ext) + lrsy;
      }
      std::swap(imm, p_imm); std::swap(imd, p_imd); std::swap(idm, p_idm);
      std::swap(imi, p_imi); std::swap(iiw, p_iiw);
    }
    sink += p_imm[Y];
  }
  auto t1 = std::chrono::steady_clock::now();
  const double secs = std::chrono::duration<double>(t1 - t0).count();
  const double cells = (double)X * Y * 5 * reps;
  std::printf("%.6g\n", cells / secs);
  std::fprintf(stderr, "sink=%g secs=%g\n", sink, secs);
  return 0;
}
