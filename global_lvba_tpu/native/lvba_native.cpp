// Native host runtime for global_lvba_tpu: the C-side of the data loader
// and track-graph builder.  The reference's equivalents are PCL's PCD
// reader (+LZF), std::unordered_map voxel binning and the BFS track builder
// (/root/reference/src/dataset_io.cpp:263-288, src/lvba_system.cpp:965-986);
// here they are plain C functions exposed through ctypes, feeding numpy.
//
// Build: g++ -O3 -march=native -shared -fPIC lvba_native.cpp -o liblvba_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <dlfcn.h>

extern "C" {

// ---------------------------------------------------------------------------
// LZF decompression (PCL binary_compressed payload layout).
// Returns bytes written, or -1 on malformed input.
long lvba_lzf_decompress(const unsigned char* in, long in_len,
                         unsigned char* out, long out_len) {
  long ip = 0, op = 0;
  while (ip < in_len && op < out_len) {
    unsigned int ctrl = in[ip++];
    if (ctrl < 32) {  // literal run
      long cnt = (long)ctrl + 1;
      if (ip + cnt > in_len || op + cnt > out_len) return -1;
      std::memcpy(out + op, in + ip, cnt);
      ip += cnt;
      op += cnt;
    } else {  // back reference
      long len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return -1;
        len += in[ip++];
      }
      if (ip >= in_len) return -1;
      long ref = op - (((long)(ctrl & 0x1f)) << 8) - (long)in[ip++] - 1;
      if (ref < 0) return -1;
      len += 2;
      if (op + len > out_len) return -1;
      for (long i = 0; i < len; ++i) out[op + i] = out[ref + i];
      op += len;
    }
  }
  return op;
}

// ---------------------------------------------------------------------------
// Voxel key computation: floor(p / voxel) packed into int64 (21 bits/axis,
// offset 2^20) — matches map/voxelize.pack_voxel_keys.
int lvba_voxel_keys(const float* pts, long n, double voxel_size,
                    long long* keys_out) {
  const long long OFF = 1LL << 19;
  const long long LIM = 1LL << 20;
  for (long i = 0; i < n; ++i) {
    long long k = 0;
    for (int j = 0; j < 3; ++j) {
      double v = (double)pts[i * 3 + j] / voxel_size;
      long long c = (long long)std::floor(v) + OFF;
      if (c < 0 || c >= LIM) return -1;
      k = (k << 20) | c;
    }
    keys_out[i] = k;
  }
  return 0;
}

// f64 threaded variant (world coordinates are f64 on the host path; the
// f32 divide+floor can land one voxel off near cell boundaries).
int lvba_voxel_keys64(const double* pts, long n, double voxel_size,
                      int n_threads, long long* keys_out) {
  const long long OFF = 1LL << 19;
  const long long LIM = 1LL << 20;
  int T = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (T < 1) T = 1;
  std::vector<int> bad(T, 0);
  std::vector<std::thread> threads;
  for (int t = 0; t < T; ++t) {
    long lo = n * (long)t / T, hi = n * (long)(t + 1) / T;
    threads.emplace_back([=, &bad]() {
      for (long i = lo; i < hi; ++i) {
        long long k = 0;
        for (int j = 0; j < 3; ++j) {
          long long c = (long long)std::floor(pts[i * 3 + j] / voxel_size) + OFF;
          if (c < 0 || c >= LIM) { bad[t] = 1; return; }
          k = (k << 20) | c;
        }
        keys_out[i] = k;
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int t = 0; t < T; ++t)
    if (bad[t]) return -1;
  return 0;
}

// ---------------------------------------------------------------------------
// 8-pass LSD radix sort of int64 keys; fills the permutation (argsort).
void lvba_radix_argsort(const long long* keys, long n, long long* perm_out) {
  std::vector<long long> idx(n), tmp_idx(n);
  std::vector<unsigned long long> k(n), tmp_k(n);
  for (long i = 0; i < n; ++i) {
    idx[i] = i;
    k[i] = (unsigned long long)keys[i] ^ 0x8000000000000000ULL;
  }
  long cnt[256];
  for (int pass = 0; pass < 8; ++pass) {
    int shift = pass * 8;
    std::memset(cnt, 0, sizeof(cnt));
    for (long i = 0; i < n; ++i) cnt[(k[i] >> shift) & 0xff]++;
    long sum = 0;
    for (int b = 0; b < 256; ++b) {
      long c = cnt[b];
      cnt[b] = sum;
      sum += c;
    }
    for (long i = 0; i < n; ++i) {
      int b = (k[i] >> shift) & 0xff;
      tmp_k[cnt[b]] = k[i];
      tmp_idx[cnt[b]] = idx[i];
      cnt[b]++;
    }
    k.swap(tmp_k);
    idx.swap(tmp_idx);
  }
  std::memcpy(perm_out, idx.data(), n * sizeof(long long));
}

// ---------------------------------------------------------------------------
// Union-find over match edges; labels each node with its component root.
// nodes: 0..n-1; edges: (2, m) int64 pairs. Path halving + union by size.
void lvba_union_find(long n, const long long* edges_a, const long long* edges_b,
                     long m, long long* label_out) {
  std::vector<long long> parent(n);
  std::vector<long long> size(n, 1);
  for (long i = 0; i < n; ++i) parent[i] = i;
  auto find = [&](long long x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  for (long e = 0; e < m; ++e) {
    long long ra = find(edges_a[e]);
    long long rb = find(edges_b[e]);
    if (ra == rb) continue;
    if (size[ra] < size[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    size[ra] += size[rb];
  }
  for (long i = 0; i < n; ++i) label_out[i] = find(i);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Multithreaded CPU evaluation of the BALM plane eigen-factor (cost,
// gradient, Hessian) — the fair `vs_baseline` denominator for bench.py.
// Same math as VOX_HESS::acc_evaluate2 (formulas re-derived; see
// eval/oracle.py), optimized C++ with a std::thread fan-out over voxels and
// per-thread (g, H) accumulators reduced on join — the reference's own
// divide_thread parallelization pattern (bavoxel.hpp:597-639).

namespace {

struct M3 {
  double a[9];
  double* operator[](int r) { return a + 3 * r; }
  const double* operator[](int r) const { return a + 3 * r; }
};

inline void mat3_mul(const double* A, const double* B, double* C) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += A[3 * i + k] * B[3 * k + j];
      C[3 * i + j] = s;
    }
}

inline void hat3(const double* v, double* H) {
  H[0] = 0;      H[1] = -v[2]; H[2] = v[1];
  H[3] = v[2];   H[4] = 0;     H[5] = -v[0];
  H[6] = -v[1];  H[7] = v[0];  H[8] = 0;
}

// Cyclic Jacobi eigendecomposition of a symmetric 3x3; ascending
// eigenvalues, columns of V are eigenvectors.
inline void eigh3(const double* Ain, double* lam, double* V) {
  double A[9];
  std::memcpy(A, Ain, sizeof(A));
  double Vm[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  for (int sweep = 0; sweep < 30; ++sweep) {
    double off = std::fabs(A[1]) + std::fabs(A[2]) + std::fabs(A[5]);
    if (off < 1e-300) break;
    for (int pq = 0; pq < 3; ++pq) {
      int p = pq == 0 ? 0 : (pq == 1 ? 0 : 1);
      int q = pq == 0 ? 1 : (pq == 1 ? 2 : 2);
      double apq = A[3 * p + q];
      if (std::fabs(apq) < 1e-300) continue;
      double app = A[3 * p + p], aqq = A[3 * q + q];
      double tau = (aqq - app) / (2.0 * apq);
      double t = (tau >= 0 ? 1.0 : -1.0) /
                 (std::fabs(tau) + std::sqrt(1.0 + tau * tau));
      double c = 1.0 / std::sqrt(1.0 + t * t);
      double s = t * c;
      for (int k = 0; k < 3; ++k) {
        double akp = A[3 * k + p], akq = A[3 * k + q];
        A[3 * k + p] = c * akp - s * akq;
        A[3 * k + q] = s * akp + c * akq;
      }
      for (int k = 0; k < 3; ++k) {
        double apk = A[3 * p + k], aqk = A[3 * q + k];
        A[3 * p + k] = c * apk - s * aqk;
        A[3 * q + k] = s * apk + c * aqk;
      }
      for (int k = 0; k < 3; ++k) {
        double vkp = Vm[3 * k + p], vkq = Vm[3 * k + q];
        Vm[3 * k + p] = c * vkp - s * vkq;
        Vm[3 * k + q] = s * vkp + c * vkq;
      }
    }
  }
  int ord[3] = {0, 1, 2};
  double d[3] = {A[0], A[4], A[8]};
  for (int i = 0; i < 2; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (d[ord[j]] < d[ord[i]]) std::swap(ord[i], ord[j]);
  for (int i = 0; i < 3; ++i) {
    lam[i] = d[ord[i]];
    for (int k = 0; k < 3; ++k) V[3 * k + i] = Vm[3 * k + ord[i]];
  }
}

struct PlaneCghArgs {
  const float* n;
  const float* mu;
  const float* Pc;
  const int* frame;
  long V;
  int K;
  const double* R;
  const double* p;
  int W;
};

void plane_cgh_range(const PlaneCghArgs& a, long v0, long v1, double* resid,
                     double* g, double* H) {
  const int K = a.K, W = a.W;
  std::vector<double> Praw(K * 9), vi(K * 3), Auk(K * 18), wv(K * 3),
      jj(K * 6);
  std::vector<int> slots(K);
  for (long v = v0; v < v1; ++v) {
    int ns = 0;
    double N = 0;
    for (int k = 0; k < K; ++k) {
      double nn = a.n[v * K + k];
      if (nn > 0) {
        slots[ns++] = k;
        N += nn;
      }
    }
    if (ns == 0) continue;
    // aggregate world moments
    double vtot[3] = {0, 0, 0}, Ptot[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
    for (int si = 0; si < ns; ++si) {
      int k = slots[si];
      double nn = a.n[v * K + k];
      const float* muk = a.mu + (v * K + k) * 3;
      const float* Pck = a.Pc + (v * K + k) * 9;
      int f = a.frame[v * K + k];
      const double* Rf = a.R + f * 9;
      const double* pf = a.p + f * 3;
      double Pr[9], vk[3];
      for (int i = 0; i < 3; ++i) {
        vk[i] = nn * muk[i];
        for (int j = 0; j < 3; ++j)
          Pr[3 * i + j] = Pck[3 * i + j] + nn * (double)muk[i] * muk[j];
      }
      std::memcpy(&Praw[k * 9], Pr, sizeof(Pr));
      std::memcpy(&vi[k * 3], vk, sizeof(vk));
      double Rv[3];
      for (int i = 0; i < 3; ++i) {
        Rv[i] = Rf[3 * i] * vk[0] + Rf[3 * i + 1] * vk[1] + Rf[3 * i + 2] * vk[2];
        vtot[i] += Rv[i] + nn * pf[i];
      }
      double RP[9], RPRt[9];
      mat3_mul(Rf, Pr, RP);
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j)
          RPRt[3 * i + j] =
              RP[3 * i] * Rf[3 * j] + RP[3 * i + 1] * Rf[3 * j + 1] +
              RP[3 * i + 2] * Rf[3 * j + 2];
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j)
          Ptot[3 * i + j] += RPRt[3 * i + j] + Rv[i] * pf[j] + pf[i] * Rv[j] +
                             nn * pf[i] * pf[j];
    }
    double vbar[3] = {vtot[0] / N, vtot[1] / N, vtot[2] / N};
    double cov[9];
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j)
        cov[3 * i + j] = Ptot[3 * i + j] / N - vbar[i] * vbar[j];
    double lam[3], U[9];
    eigh3(cov, lam, U);
    double uk[3] = {U[0], U[3], U[6]};
    *resid += lam[0];
    double umumT[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
    for (int e = 1; e < 3; ++e) {
      double den = lam[0] - lam[e];
      if (std::fabs(den) < 1e-300) den = -1e-300;
      double ue[3] = {U[e], U[3 + e], U[6 + e]};
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j)
          umumT[3 * i + j] += 2.0 / den * ue[i] * ue[j];
    }
    // per-slot A, w, gradient, diagonal D
    for (int si = 0; si < ns; ++si) {
      int k = slots[si];
      double nn = a.n[v * K + k];
      int f = a.frame[v * K + k];
      const double* Rf = a.R + f * 9;
      const double* pf = a.p + f * 3;
      const double* Pr = &Praw[k * 9];
      const double* vk = &vi[k * 3];
      double RiTuk[3];
      for (int i = 0; i < 3; ++i)
        RiTuk[i] = Rf[i] * uk[0] + Rf[3 + i] * uk[1] + Rf[6 + i] * uk[2];
      double w[3] = {vk[1] * RiTuk[2] - vk[2] * RiTuk[1],
                     vk[2] * RiTuk[0] - vk[0] * RiTuk[2],
                     vk[0] * RiTuk[1] - vk[1] * RiTuk[0]};
      std::memcpy(&wv[k * 3], w, sizeof(w));
      double tiv[3] = {pf[0] - vbar[0], pf[1] - vbar[1], pf[2] - vbar[2]};
      double aa = uk[0] * tiv[0] + uk[1] * tiv[1] + uk[2] * tiv[2];
      double PiRiTuk[3];
      for (int i = 0; i < 3; ++i)
        PiRiTuk[i] =
            Pr[3 * i] * RiTuk[0] + Pr[3 * i + 1] * RiTuk[1] + Pr[3 * i + 2] * RiTuk[2];
      double hatP[9], hatv[9], hatR[9];
      hat3(PiRiTuk, hatP);
      hat3(vk, hatv);
      hat3(RiTuk, hatR);
      double combo1[9];
      for (int i = 0; i < 9; ++i) combo1[i] = hatP[i] + hatv[i] * aa;
      double combo2[3];
      for (int i = 0; i < 3; ++i)
        combo2[i] = Rf[3 * i] * vk[0] + Rf[3 * i + 1] * vk[1] +
                    Rf[3 * i + 2] * vk[2] + nn * tiv[i];
      // A[:,0:3] = (Rf Praw + tiv viᵀ) hatR − Rf combo1; A[:,3:6] = ...
      double RP[9], tmp[9], Rc1[9];
      mat3_mul(Rf, Pr, RP);
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) tmp[3 * i + j] = RP[3 * i + j] + tiv[i] * vk[j];
      double left[9];
      mat3_mul(tmp, hatR, left);
      mat3_mul(Rf, combo1, Rc1);
      double* A = &Auk[k * 18];
      double c2u = combo2[0] * uk[0] + combo2[1] * uk[1] + combo2[2] * uk[2];
      for (int i = 0; i < 3; ++i) {
        for (int j = 0; j < 3; ++j) {
          A[6 * i + j] = (left[3 * i + j] - Rc1[3 * i + j]) / N;
          A[6 * i + 3 + j] =
              (combo2[i] * uk[j] + (i == j ? c2u : 0.0)) / N;
        }
      }
      double* jk = &jj[k * 6];
      for (int c = 0; c < 6; ++c)
        jk[c] = A[c] * uk[0] + A[6 + c] * uk[1] + A[12 + c] * uk[2];
      for (int c = 0; c < 6; ++c) g[6 * f + c] += jk[c];
      // diagonal block D
      double hatRP[9], diff[9], Drr[9], hatj[9];
      mat3_mul(hatR, Pr, hatRP);
      for (int i = 0; i < 9; ++i) diff[i] = combo1[i] - hatRP[i];
      mat3_mul(diff, hatR, Drr);
      hat3(jk, hatj);  // uses jk[0:3]
      double* Hrow = H + (6 * f) * (6 * W) + 6 * f;
      for (int i = 0; i < 3; ++i)
        for (int j = 0; j < 3; ++j) {
          Hrow[i * 6 * W + j] += 2.0 / N * Drr[3 * i + j] - 0.5 * hatj[3 * i + j];
          Hrow[i * 6 * W + 3 + j] += 2.0 / N * w[i] * uk[j];
          Hrow[(3 + i) * 6 * W + j] += 2.0 / N * w[j] * uk[i];
          Hrow[(3 + i) * 6 * W + 3 + j] += 2.0 * nn / N * uk[i] * uk[j];
        }
    }
    // cross blocks for every ordered slot pair
    double inv2 = 2.0 / (N * N);
    for (int si = 0; si < ns; ++si) {
      int ki = slots[si];
      double ni = a.n[v * K + ki];
      int fi = a.frame[v * K + ki];
      double T[18];  // umumT @ A_ki -> used transposed
      const double* Ai = &Auk[ki * 18];
      for (int i = 0; i < 3; ++i)
        for (int c = 0; c < 6; ++c)
          T[6 * i + c] = umumT[3 * i] * Ai[c] + umumT[3 * i + 1] * Ai[6 + c] +
                         umumT[3 * i + 2] * Ai[12 + c];
      for (int sj = 0; sj < ns; ++sj) {
        int kj = slots[sj];
        double nj = a.n[v * K + kj];
        int fj = a.frame[v * K + kj];
        const double* Aj = &Auk[kj * 18];
        double* Hrow = H + (6 * fi) * (6 * W) + 6 * fj;
        // B = Aiᵀ umumT Aj = Tᵀ(6x3)... note T = umumT @ Ai (3x6)
        for (int r = 0; r < 6; ++r)
          for (int c = 0; c < 6; ++c) {
            double s = T[r] * Aj[c] + T[6 + r] * Aj[6 + c] + T[12 + r] * Aj[12 + c];
            Hrow[r * 6 * W + c] += s;
          }
        const double* wi = &wv[ki * 3];
        const double* wj = &wv[kj * 3];
        for (int i = 0; i < 3; ++i)
          for (int j = 0; j < 3; ++j) {
            Hrow[i * 6 * W + j] += -inv2 * wi[i] * wj[j];
            Hrow[i * 6 * W + 3 + j] += -inv2 * nj * wi[i] * uk[j];
            Hrow[(3 + i) * 6 * W + j] += -inv2 * ni * uk[i] * wj[j];
            Hrow[(3 + i) * 6 * W + 3 + j] += -inv2 * ni * nj * uk[i] * uk[j];
          }
      }
    }
  }
}

}  // namespace

namespace {

// Threaded fan-out over voxels; ACCUMULATES into g/H (callers zero them).
double plane_cgh_threaded(const PlaneCghArgs& args, int n_threads,
                          double* g_out, double* H_out) {
  const long V = args.V;
  int T = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (T < 1) T = 1;
  if ((long)T > V) T = (int)(V > 0 ? V : 1);
  long n6 = 6L * args.W;
  std::vector<std::vector<double>> gs(T), Hs(T);
  std::vector<double> rs(T, 0.0);
  std::vector<std::thread> threads;
  for (int t = 0; t < T; ++t) {
    gs[t].assign(n6, 0.0);
    Hs[t].assign(n6 * n6, 0.0);
  }
  for (int t = 0; t < T; ++t) {
    long v0 = V * t / T, v1 = V * (t + 1) / T;
    threads.emplace_back([&, t, v0, v1]() {
      plane_cgh_range(args, v0, v1, &rs[t], gs[t].data(), Hs[t].data());
    });
  }
  double resid = 0;
  for (int t = 0; t < T; ++t) {
    threads[t].join();
    resid += rs[t];
    for (long i = 0; i < n6; ++i) g_out[i] += gs[t][i];
    for (long i = 0; i < n6 * n6; ++i) H_out[i] += Hs[t][i];
  }
  return resid;
}

// LAPACK dgesv resolved at runtime from an optimized BLAS (the image's
// reference libblas runs at ~1 GFLOP/s — unusably slow for the (6W)² solve
// — while scipy ships OpenBLAS; lvba_set_lapack points us at it).
typedef void (*dgesv_t)(const int*, const int*, double*, const int*, int*,
                        double*, const int*, int*);
dgesv_t g_dgesv = nullptr;

// Fallback: partial-pivot LU solve, in-place (used only without LAPACK).
int lu_solve(double* A, double* b, long n) {
  std::vector<long> piv(n);
  for (long c = 0; c < n; ++c) {
    long pr = c;
    double best = std::fabs(A[c * n + c]);
    for (long r = c + 1; r < n; ++r) {
      double v = std::fabs(A[r * n + c]);
      if (v > best) { best = v; pr = r; }
    }
    if (best == 0.0) return -1;
    if (pr != c) {
      for (long j = 0; j < n; ++j) std::swap(A[c * n + j], A[pr * n + j]);
      std::swap(b[c], b[pr]);
    }
    double inv = 1.0 / A[c * n + c];
    for (long r = c + 1; r < n; ++r) {
      double f = A[r * n + c] * inv;
      if (f == 0.0) continue;
      A[r * n + c] = 0.0;
      for (long j = c + 1; j < n; ++j) A[r * n + j] -= f * A[c * n + j];
      b[r] -= f * b[c];
    }
  }
  for (long r = n - 1; r >= 0; --r) {
    double s = b[r];
    for (long j = r + 1; j < n; ++j) s -= A[r * n + j] * b[j];
    b[r] = s / A[r * n + r];
  }
  return 0;
}

inline void exp_so3_native(const double* w, double* Rm) {
  double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double th = std::sqrt(th2);
  double A, B;
  if (th < 1e-8) {
    A = 1.0 - th2 / 6.0;
    B = 0.5 - th2 / 24.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
  }
  double hx[9];
  hat3(w, hx);
  double hx2[9];
  mat3_mul(hx, hx, hx2);
  for (int i = 0; i < 9; ++i) Rm[i] = A * hx[i] + B * hx2[i];
  Rm[0] += 1.0;
  Rm[4] += 1.0;
  Rm[8] += 1.0;
}

}  // namespace

extern "C" {

// Point dgesv at an optimized LAPACK (e.g. scipy's bundled OpenBLAS).
// Tries the scipy_-prefixed symbol first, then the plain Fortran name.
// Threaded body->world point transform: out_i = R[fid_i] pts_i + p[fid_i].
// The numpy formulation (R[fid] fancy-gather to (N, 3, 3) then einsum)
// materializes 144 MB of per-point rotation copies at 2M points and ran
// 1.6 s single-threaded — the single largest host cost of
// build_voxel_map before this kernel.
void lvba_transform_points(const double* pts, const int* fid, long n,
                           const double* R, const double* p, int n_threads,
                           double* out) {
  int T = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (T < 1) T = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < T; ++t) {
    long lo = n * (long)t / T, hi = n * (long)(t + 1) / T;
    threads.emplace_back([=]() {
      for (long i = lo; i < hi; ++i) {
        const double* Ri = R + 9L * fid[i];
        const double* pi = p + 3L * fid[i];
        const double* x = pts + 3 * i;
        double* o = out + 3 * i;
        o[0] = Ri[0] * x[0] + Ri[1] * x[1] + Ri[2] * x[2] + pi[0];
        o[1] = Ri[3] * x[0] + Ri[4] * x[1] + Ri[5] * x[2] + pi[1];
        o[2] = Ri[6] * x[0] + Ri[7] * x[1] + Ri[8] * x[2] + pi[2];
      }
    });
  }
  for (auto& th : threads) th.join();
}

// Threaded per-segment point-moment accumulation: the host half of
// cut_voxel's per-voxel stats (/root/reference/include/BALM/
// bavoxel.hpp:799-836).  For segment i, rows sort_idx[starts[i] ..
// starts[i+1]) of pts (n, 3) accumulate (sum xyz, sum of the 6 unique
// xxT entries) SEQUENTIALLY in segment order — the same order
// np.add.reduceat uses, so the numpy fallback and this path agree to
// f64 rounding.  Threads split the segment list by equal point counts.
void lvba_bin_moments(const double* pts, const long long* sort_idx, long n,
                      const long long* starts, long s, int n_threads,
                      double* sums /* (s, 3) */, double* moms /* (s, 6) */) {
  int T = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (T < 1) T = 1;
  if ((long)T > s) T = (int)(s > 0 ? s : 1);
  std::vector<std::thread> threads;
  for (int t = 0; t < T; ++t) {
    // balance by POINTS, not segments: segment sizes are heavy-tailed
    long p_lo = n * (long)t / T, p_hi = n * (long)(t + 1) / T;
    // segment range covering [p_lo, p_hi): first segment whose start
    // >= p_lo .. first whose start >= p_hi (starts is sorted, starts[0]=0)
    long s_lo = (long)(std::lower_bound(starts, starts + s, (long long)p_lo) - starts);
    long s_hi = (long)(std::lower_bound(starts, starts + s, (long long)p_hi) - starts);
    threads.emplace_back([=]() {
      for (long i = s_lo; i < s_hi; ++i) {
        long e0 = starts[i];
        long e1 = (i + 1 < s) ? (long)starts[i + 1] : n;
        double s0 = 0, s1 = 0, s2 = 0;
        double m0 = 0, m1 = 0, m2 = 0, m3 = 0, m4 = 0, m5 = 0;
        for (long e = e0; e < e1; ++e) {
          const double* q = pts + 3 * sort_idx[e];
          double x = q[0], y = q[1], z = q[2];
          s0 += x; s1 += y; s2 += z;
          m0 += x * x; m1 += x * y; m2 += x * z;
          m3 += y * y; m4 += y * z; m5 += z * z;
        }
        double* so = sums + 3 * i;
        so[0] = s0; so[1] = s1; so[2] = s2;
        double* mo = moms + 6 * i;
        mo[0] = m0; mo[1] = m1; mo[2] = m2; mo[3] = m3; mo[4] = m4; mo[5] = m5;
      }
    });
  }
  for (auto& th : threads) th.join();
}

void lvba_set_lapack(const char* path) {
  void* h = dlopen(path, RTLD_NOW | RTLD_LOCAL);
  if (!h) return;
  void* s = dlsym(h, "scipy_dgesv_");
  if (!s) s = dlsym(h, "dgesv_");
  if (s) g_dgesv = (dgesv_t)s;
}

// Min-depth z-buffer rasterization of world points through the distorted
// pinhole model (generateDepthWithVoxel hot loop, /root/reference/src/
// lvba_system.cpp:885-901).  Mirrors pipeline/depth._zbuffer_host: f32
// arithmetic in the same operation order, Z >= 1e-3 gate, min per integer
// pixel, inf -> 0.  depth_out must hold H*W floats.
namespace {
struct ZbufCam {
  float R00, R01, R02, R10, R11, R12, R20, R21, R22, t0, t1, t2;
  float fx, fy, cx, cy, k1, k2, p1, p2;
  int W, H;
};

inline ZbufCam zbuf_cam(const double* Rcw, const double* tcw, double fx,
                        double fy, double cx, double cy, double k1, double k2,
                        double p1d, double p2d, int W, int H) {
  return ZbufCam{(float)Rcw[0], (float)Rcw[1], (float)Rcw[2],
                 (float)Rcw[3], (float)Rcw[4], (float)Rcw[5],
                 (float)Rcw[6], (float)Rcw[7], (float)Rcw[8],
                 (float)tcw[0], (float)tcw[1], (float)tcw[2],
                 (float)fx,     (float)fy,     (float)cx,
                 (float)cy,     (float)k1,     (float)k2,
                 (float)p1d,    (float)p2d,    W,           H};
}

inline void zbuf_accum(const float* pts, long i0, long i1, const ZbufCam& c,
                       float* depth_out) {
  for (long i = i0; i < i1; ++i) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    const float Z = c.R20 * px + c.R21 * py + c.R22 * pz + c.t2;
    if (!(Z >= 1e-3f)) continue;
    const float X = c.R00 * px + c.R01 * py + c.R02 * pz + c.t0;
    const float Y = c.R10 * px + c.R11 * py + c.R12 * pz + c.t1;
    const float x = X / Z, y = Y / Z;
    const float r2 = x * x + y * y;
    const float radial = 1.0f + c.k1 * r2 + c.k2 * r2 * r2;
    const float xd =
        x * radial + 2.0f * c.p1 * x * y + c.p2 * (r2 + 2.0f * x * x);
    const float yd =
        y * radial + c.p1 * (r2 + 2.0f * y * y) + 2.0f * c.p2 * x * y;
    const float uf = c.fx * xd + c.cx;
    const float vf = c.fy * yd + c.cy;
    if (!std::isfinite(uf) || !std::isfinite(vf)) continue;
    // trunc-toward-zero cast, same as numpy astype(int32): uf in (-1, 0)
    // truncates to pixel 0 and stays in-bounds
    if (uf <= -1.0f || uf >= (float)c.W || vf <= -1.0f || vf >= (float)c.H)
      continue;
    const int u = (int)uf, v = (int)vf;
    if (u < 0 || u >= c.W || v < 0 || v >= c.H) continue;
    float& d = depth_out[(long)v * c.W + u];
    if (Z < d) d = Z;
  }
}

inline void zbuf_finish(float* depth_out, long hw) {
  for (long i = 0; i < hw; ++i)
    if (!std::isfinite(depth_out[i])) depth_out[i] = 0.0f;
}
}  // namespace

void lvba_zbuffer(const float* pts, long n, const double* Rcw,
                  const double* tcw, double fx, double fy, double cx,
                  double cy, double k1, double k2, double p1d, double p2d,
                  int W, int H, float* depth_out) {
  const long hw = (long)H * W;
  for (long i = 0; i < hw; ++i) depth_out[i] = INFINITY;
  const ZbufCam c =
      zbuf_cam(Rcw, tcw, fx, fy, cx, cy, k1, k2, p1d, p2d, W, H);
  zbuf_accum(pts, 0, n, c, depth_out);
  zbuf_finish(depth_out, hw);
}

// Same rasterization reading points straight out of the grid map's CSR
// (starts/counts into the voxel-grouped point array): the per-image
// covisible-point GATHER (numpy ragged-range expansion) measured ~60 ms at
// 2M covisible points while the rasterization itself is ~11 ms — reading
// the ranges in place removes the copy entirely (generateDepthWithVoxel,
// /root/reference/src/lvba_system.cpp:885-901, gathers per image too; the
// CSR-direct form is behavior-identical).
void lvba_zbuffer_ranges(const float* pts, const long long* starts,
                         const long long* counts, long n_ranges,
                         const double* Rcw, const double* tcw, double fx,
                         double fy, double cx, double cy, double k1,
                         double k2, double p1d, double p2d, int W, int H,
                         float* depth_out) {
  const long hw = (long)H * W;
  for (long i = 0; i < hw; ++i) depth_out[i] = INFINITY;
  const ZbufCam c =
      zbuf_cam(Rcw, tcw, fx, fy, cx, cy, k1, k2, p1d, p2d, W, H);
  for (long r = 0; r < n_ranges; ++r)
    zbuf_accum(pts, (long)starts[r], (long)(starts[r] + counts[r]), c,
               depth_out);
  zbuf_finish(depth_out, hw);
}

// Multithreaded plane-factor (residual, gradient, Hessian) evaluation.
// n (V,K) f32; mu (V,K,3) f32; Pc (V,K,3,3) f32; frame (V,K) i32;
// R (W,3,3) f64 row-major; p (W,3) f64; outputs resid (1), g (6W), H (6W,6W).
void lvba_plane_cgh(const float* n, const float* mu, const float* Pc,
                    const int* frame, long V, int K, const double* R,
                    const double* p, int W, int n_threads, double* resid_out,
                    double* g_out, double* H_out) {
  PlaneCghArgs args{n, mu, Pc, frame, V, K, R, p, W};
  long n6 = 6L * W;
  std::memset(g_out, 0, n6 * sizeof(double));
  std::memset(H_out, 0, n6 * n6 * sizeof(double));
  *resid_out = plane_cgh_threaded(args, n_threads, g_out, H_out);
}

// Full damped-LM solve over multiple factor buckets — the honest
// optimized-CPU baseline at representative scale (the reference's
// damping_iter, bavoxel.hpp:662-767, with the same one-trial-evaluation-
// per-iteration scheme as the TPU engine so the per-iteration work
// matches).  R/p are updated IN PLACE; returns final averaged residual
// and the iteration count.
void lvba_lm_solve(int n_buckets, const float** n_l, const float** mu_l,
                   const float** Pc_l, const int** f_l, const long* V_l,
                   const int* K_l, double* R, double* p, int W, int max_iters,
                   int n_threads, double* resid_out, int* iters_out) {
  long n6 = 6L * W;
  long g_size = 0;
  for (int b = 0; b < n_buckets; ++b) g_size += V_l[b];
  if (g_size < 1) g_size = 1;
  std::vector<double> g(n6), H(n6 * n6), g_t(n6), H_t(n6 * n6);
  std::vector<double> A(n6 * n6), dx(n6), d(n6);
  std::vector<double> Rt(9L * W), pt(3L * W);
  std::vector<int> ipiv(n6);

  auto cgh = [&](const double* Rq, const double* pq, double* gg, double* HH) {
    std::memset(gg, 0, n6 * sizeof(double));
    std::memset(HH, 0, n6 * n6 * sizeof(double));
    double r = 0;
    for (int b = 0; b < n_buckets; ++b) {
      PlaneCghArgs args{n_l[b], mu_l[b], Pc_l[b], f_l[b],
                        V_l[b], K_l[b], Rq,      pq,     W};
      r += plane_cgh_threaded(args, n_threads, gg, HH);
    }
    return r / (double)g_size;
  };

  double u = 0.01, v = 2.0;
  double res1 = cgh(R, p, g.data(), H.data());
  int it = 0;
  for (int i = 0; i < max_iters; ++i) {
    it = i + 1;
    double dmax = 0;
    for (long r = 0; r < n6; ++r) {
      d[r] = H[r * n6 + r];
      dmax = std::max(dmax, std::fabs(d[r]));
    }
    double eps = 1e-12 * (1.0 + dmax);  // pin unobserved frames (zero rows)
    std::memcpy(A.data(), H.data(), n6 * n6 * sizeof(double));
    for (long r = 0; r < n6; ++r) {
      A[r * n6 + r] += u * d[r] + eps;
      dx[r] = -g[r];
    }
    if (g_dgesv) {
      // A is symmetric, so the row-major buffer IS its column-major self
      int n = (int)n6, nrhs = 1, info = 0;
      g_dgesv(&n, &nrhs, A.data(), &n, ipiv.data(), dx.data(), &n, &info);
      if (info != 0) break;
    } else {
      if (lu_solve(A.data(), dx.data(), n6) != 0) break;
    }
    for (int j = 0; j < W; ++j) {
      double dR[9];
      exp_so3_native(&dx[6 * j], dR);
      mat3_mul(R + 9 * j, dR, &Rt[9 * j]);
      for (int c = 0; c < 3; ++c) pt[3 * j + c] = p[3 * j + c] + dx[6 * j + 3 + c];
    }
    double q1 = 0;
    for (long r = 0; r < n6; ++r) q1 += dx[r] * (u * d[r] * dx[r] - g[r]);
    q1 *= 0.5 / (double)g_size;
    double res2 = cgh(Rt.data(), pt.data(), g_t.data(), H_t.data());
    double q = res1 - res2;
    bool converged =
        std::fabs(res1 - res2) / std::max(std::fabs(res1), 1e-300) < 1e-6;
    if (q > 0) {
      std::memcpy(R, Rt.data(), 9L * W * sizeof(double));
      std::memcpy(p, pt.data(), 3L * W * sizeof(double));
      g.swap(g_t);
      H.swap(H_t);
      res1 = res2;
      double qr = q1 != 0 ? q / q1 : 1.0;
      double qq = 1.0 - std::pow(2.0 * qr - 1.0, 3.0);
      u *= std::max(1.0 / 3.0, qq);
      v = 2.0;
    } else {
      u *= v;
      v *= 2.0;
    }
    if (converged) break;
  }
  *resid_out = res1;
  *iters_out = it;
}

}  // extern "C"
