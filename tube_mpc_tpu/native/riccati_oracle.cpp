// Independent C++ oracle for the DDP/Riccati recursions, used for differential
// testing of the JAX scan path and the Pallas lane kernels (a third, dependency-free
// implementation of the same math — reference semantics core/ddp.py:213-254, 317-427).
//
// Deliberately simple scalar double-precision code: correctness oracle, not a fast
// path (the fast paths are the XLA scan and the Pallas kernels).
//
// Build: g++ -O2 -shared -fPIC -o libriccati_oracle.so riccati_oracle.cpp
// (auto-built by tube_mpc_tpu/native/__init__.py)

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Solve M x = b for small SPD M (n <= 8) by Gaussian elimination with partial pivot.
void solve_small(int n, const double* M_in, const double* b_in, double* x_out) {
  double M[64];
  double b[8];
  std::memcpy(M, M_in, sizeof(double) * n * n);
  std::memcpy(b, b_in, sizeof(double) * n);
  for (int col = 0; col < n; ++col) {
    int piv = col;
    for (int r = col + 1; r < n; ++r) {
      if (std::abs(M[r * n + col]) > std::abs(M[piv * n + col])) piv = r;
    }
    if (piv != col) {
      for (int c = 0; c < n; ++c) std::swap(M[col * n + c], M[piv * n + c]);
      std::swap(b[col], b[piv]);
    }
    const double d = M[col * n + col];
    for (int r = col + 1; r < n; ++r) {
      const double f = M[r * n + col] / d;
      for (int c = col; c < n; ++c) M[r * n + c] -= f * M[col * n + c];
      b[r] -= f * b[col];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double acc = b[r];
    for (int c = r + 1; c < n; ++c) acc -= M[r * n + c] * x_out[c];
    x_out[r] = acc / M[r * n + r];
  }
}

}  // namespace

extern "C" {

// Backward Riccati sweep (one problem). Layouts row-major:
//   A [N,n,n], B [N,n,m], lx [N,n], lu [N,m], lxx [N,n,n], luu [N,m,m], lux [N,m,n],
//   phix [n], phixx [n,n] -> K [N,m,n], kff [N,m]
void riccati_backward(const double* A, const double* B, const double* lx,
                      const double* lu, const double* lxx, const double* luu,
                      const double* lux, const double* phix, const double* phixx,
                      double reg, int N, int n, int m, double* K_out,
                      double* kff_out) {
  std::vector<double> Vx(phix, phix + n);
  std::vector<double> Vxx(phixx, phixx + n * n);
  std::vector<double> Qx(n), Qu(m), Qxx(n * n), Qux(m * n), Quu(m * m);
  std::vector<double> VA(n * n), VB(n * m), col(m);

  for (int k = N - 1; k >= 0; --k) {
    const double* Ak = A + k * n * n;
    const double* Bk = B + k * n * m;

    // VA = Vxx A ; VB = Vxx B
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double acc = 0;
        for (int l = 0; l < n; ++l) acc += Vxx[i * n + l] * Ak[l * n + j];
        VA[i * n + j] = acc;
      }
    for (int i = 0; i < n; ++i)
      for (int a = 0; a < m; ++a) {
        double acc = 0;
        for (int l = 0; l < n; ++l) acc += Vxx[i * n + l] * Bk[l * m + a];
        VB[i * m + a] = acc;
      }

    for (int i = 0; i < n; ++i) {
      double acc = lx[k * n + i];
      for (int j = 0; j < n; ++j) acc += Ak[j * n + i] * Vx[j];
      Qx[i] = acc;
    }
    for (int a = 0; a < m; ++a) {
      double acc = lu[k * m + a];
      for (int j = 0; j < n; ++j) acc += Bk[j * m + a] * Vx[j];
      Qu[a] = acc;
    }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double acc = lxx[k * n * n + i * n + j];
        for (int l = 0; l < n; ++l) acc += Ak[l * n + i] * VA[l * n + j];
        Qxx[i * n + j] = acc;
      }
    for (int a = 0; a < m; ++a)
      for (int i = 0; i < n; ++i) {
        double acc = lux[k * m * n + a * n + i];
        for (int l = 0; l < n; ++l) acc += Bk[l * m + a] * VA[l * n + i];
        Qux[a * n + i] = acc;
      }
    for (int a = 0; a < m; ++a)
      for (int b = 0; b < m; ++b) {
        double acc = luu[k * m * m + a * m + b];
        for (int l = 0; l < n; ++l) acc += Bk[l * m + a] * VB[l * m + b];
        Quu[a * m + b] = acc;
      }

    // regularized gains
    std::vector<double> Quu_reg(Quu);
    for (int a = 0; a < m; ++a) Quu_reg[a * m + a] += reg;

    double* Kk = K_out + k * m * n;
    double* kffk = kff_out + k * m;
    std::vector<double> rhs(m), sol(m);
    for (int i = 0; i < n; ++i) {
      for (int a = 0; a < m; ++a) rhs[a] = Qux[a * n + i];
      solve_small(m, Quu_reg.data(), rhs.data(), sol.data());
      for (int a = 0; a < m; ++a) Kk[a * n + i] = -sol[a];
    }
    solve_small(m, Quu_reg.data(), Qu.data(), sol.data());
    for (int a = 0; a < m; ++a) kffk[a] = -sol[a];

    // V_x  = Q_x + Kᵀ Q_uu kff + Kᵀ Q_u + Q_uxᵀ kff
    // V_xx = Q_xx + Kᵀ Q_uu K + Kᵀ Q_ux + Q_uxᵀ K
    std::vector<double> Quu_kff(m, 0.0);
    for (int a = 0; a < m; ++a)
      for (int b = 0; b < m; ++b) Quu_kff[a] += Quu[a * m + b] * kffk[b];
    for (int i = 0; i < n; ++i) {
      double acc = Qx[i];
      for (int a = 0; a < m; ++a)
        acc += Kk[a * n + i] * (Quu_kff[a] + Qu[a]) + Qux[a * n + i] * kffk[a];
      Vx[i] = acc;
    }
    std::vector<double> QuuK(m * n, 0.0);
    for (int a = 0; a < m; ++a)
      for (int j = 0; j < n; ++j) {
        double acc = 0;
        for (int b = 0; b < m; ++b) acc += Quu[a * m + b] * Kk[b * n + j];
        QuuK[a * n + j] = acc;
      }
    std::vector<double> Vxx_new(n * n);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double acc = Qxx[i * n + j];
        for (int a = 0; a < m; ++a)
          acc += Kk[a * n + i] * QuuK[a * n + j] + Kk[a * n + i] * Qux[a * n + j] +
                 Qux[a * n + i] * Kk[a * n + j];
        Vxx_new[i * n + j] = acc;
      }
    Vxx = Vxx_new;
  }
}

// Sensitivity backward/forward sweep with active-set elimination
// (reference ddp.py:317-427). active: [N,m] int8 (1 = clamped dim).
void ddp_sensitivity_oracle(const double* A, const double* B, const double* lxx,
                            const double* luu, const double* lux,
                            const double* phixx, const double* gx /*[N+1,n]*/,
                            const double* gu /*[N,m]*/, const signed char* active,
                            double reg, int N, int n, int m, double* dX /*[N+1,n]*/,
                            double* dU /*[N,m]*/, double* dlam /*[N+1,n]*/) {
  std::vector<double> Vxx(phixx, phixx + n * n);
  std::vector<double> tVx(gx + N * n, gx + (N + 1) * n);
  std::vector<double> Ks(N * m * n), kffs(N * m), Vxxs((N + 1) * n * n),
      tVxs((N + 1) * n);
  std::memcpy(Vxxs.data() + N * n * n, Vxx.data(), sizeof(double) * n * n);
  std::memcpy(tVxs.data() + N * n, tVx.data(), sizeof(double) * n);

  std::vector<double> Qxx(n * n), Qxu(n * m), Qux(m * n), Quu(m * m), tQu(m),
      tQx(n), VA(n * n), VB(n * m);

  for (int k = N - 1; k >= 0; --k) {
    const double* Ak = A + k * n * n;
    const double* Bk = B + k * n * m;
    const signed char* act = active + k * m;

    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double acc = 0;
        for (int l = 0; l < n; ++l) acc += Vxx[i * n + l] * Ak[l * n + j];
        VA[i * n + j] = acc;
      }
    for (int i = 0; i < n; ++i)
      for (int a = 0; a < m; ++a) {
        double acc = 0;
        for (int l = 0; l < n; ++l) acc += Vxx[i * n + l] * Bk[l * m + a];
        VB[i * m + a] = acc;
      }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double acc = lxx[k * n * n + i * n + j];
        for (int l = 0; l < n; ++l) acc += Ak[l * n + i] * VA[l * n + j];
        Qxx[i * n + j] = acc;
      }
    for (int i = 0; i < n; ++i)
      for (int a = 0; a < m; ++a) {
        double acc = lux[k * m * n + a * n + i];  // lux^T entry
        for (int l = 0; l < n; ++l) acc += Ak[l * n + i] * VB[l * m + a];
        Qxu[i * m + a] = acc;
      }
    for (int a = 0; a < m; ++a)
      for (int i = 0; i < n; ++i) {
        double acc = lux[k * m * n + a * n + i];
        for (int l = 0; l < n; ++l) acc += Bk[l * m + a] * VA[l * n + i];
        Qux[a * n + i] = acc;
      }
    for (int a = 0; a < m; ++a)
      for (int b = 0; b < m; ++b) {
        double acc = luu[k * m * m + a * m + b];
        for (int l = 0; l < n; ++l) acc += Bk[l * m + a] * VB[l * m + b];
        Quu[a * m + b] = acc;
      }
    for (int a = 0; a < m; ++a) {
      double acc = gu[k * m + a];
      for (int j = 0; j < n; ++j) acc += Bk[j * m + a] * tVx[j];
      tQu[a] = acc;
    }
    for (int i = 0; i < n; ++i) {
      double acc = gx[k * n + i];
      for (int j = 0; j < n; ++j) acc += Ak[j * n + i] * tVx[j];
      tQx[i] = acc;
    }

    // masked reduced solves: active rows/cols -> identity, rhs zeroed
    std::vector<double> M(m * m);
    for (int a = 0; a < m; ++a)
      for (int b = 0; b < m; ++b) {
        if (act[a] || act[b])
          M[a * m + b] = (a == b) ? 1.0 : 0.0;
        else
          M[a * m + b] = Quu[a * m + b] + ((a == b) ? reg : 0.0);
      }
    double* Kk = Ks.data() + k * m * n;
    double* kffk = kffs.data() + k * m;
    std::vector<double> rhs(m), sol(m);
    for (int i = 0; i < n; ++i) {
      for (int a = 0; a < m; ++a) rhs[a] = act[a] ? 0.0 : Qux[a * n + i];
      solve_small(m, M.data(), rhs.data(), sol.data());
      for (int a = 0; a < m; ++a) Kk[a * n + i] = -sol[a];
    }
    for (int a = 0; a < m; ++a) rhs[a] = act[a] ? 0.0 : tQu[a];
    solve_small(m, M.data(), rhs.data(), sol.data());
    for (int a = 0; a < m; ++a) kffk[a] = -sol[a];

    // tVx = tQx + Qxu kff ; Vxx = Qxx + Qxu K
    std::vector<double> tVx_new(n), Vxx_new(n * n);
    for (int i = 0; i < n; ++i) {
      double acc = tQx[i];
      for (int a = 0; a < m; ++a) acc += Qxu[i * m + a] * kffk[a];
      tVx_new[i] = acc;
    }
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j) {
        double acc = Qxx[i * n + j];
        for (int a = 0; a < m; ++a) acc += Qxu[i * m + a] * Kk[a * n + j];
        Vxx_new[i * n + j] = acc;
      }
    tVx = tVx_new;
    Vxx = Vxx_new;
    std::memcpy(Vxxs.data() + k * n * n, Vxx.data(), sizeof(double) * n * n);
    std::memcpy(tVxs.data() + k * n, tVx.data(), sizeof(double) * n);
  }

  // forward δ-rollout
  for (int i = 0; i < n; ++i) dX[i] = 0.0;
  for (int k = 0; k < N; ++k) {
    const double* Ak = A + k * n * n;
    const double* Bk = B + k * n * m;
    const signed char* act = active + k * m;
    for (int a = 0; a < m; ++a) {
      double acc = kffs[k * m + a];
      for (int i = 0; i < n; ++i) acc += Ks[k * m * n + a * n + i] * dX[k * n + i];
      dU[k * m + a] = act[a] ? 0.0 : acc;
    }
    for (int i = 0; i < n; ++i) {
      double acc = 0;
      for (int j = 0; j < n; ++j) acc += Ak[i * n + j] * dX[k * n + j];
      for (int a = 0; a < m; ++a) acc += Bk[i * m + a] * dU[k * m + a];
      dX[(k + 1) * n + i] = acc;
    }
    for (int i = 0; i < n; ++i) {
      double acc = tVxs[k * n + i];
      for (int j = 0; j < n; ++j) acc += Vxxs[k * n * n + i * n + j] * dX[k * n + j];
      dlam[k * n + i] = acc;
    }
  }
  for (int i = 0; i < n; ++i) {
    double acc = tVxs[N * n + i];
    for (int j = 0; j < n; ++j) acc += Vxxs[N * n * n + i * n + j] * dX[N * n + j];
    dlam[N * n + i] = acc;
  }
}

}  // extern "C"
