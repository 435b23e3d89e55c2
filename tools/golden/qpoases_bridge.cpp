// Golden-solver bridge around the reference's vendored qpOASES.
//
// Compiled (by build.sh) against the READ-ONLY reference tree at
// /root/reference/be2r_cmpc_unitree/src/third_party/qpOASES — the exact
// active-set solver the reference controller ships — so the test suite can
// produce true reference-solver goldens for the MPC QP:
//
//   min_x  0.5 x'H x + g'x   s.t.  lb <= A x <= ub
//
// Semantics replicated from SolverMPC.cpp:
//   * Options::setToMPC(), printLevel PL_NONE, nWSR = 100
//     (SolverMPC.cpp:854, 955-958)
//   * optional swing-leg variable elimination: any constraint row with
//     lb ~ 0 and ub ~ 0 whose row has a ~1 entry at column j marks
//     variables {j-2, j-1, j} and the 5 friction rows of that (step, leg)
//     block for removal; the reduced QP is solved and the solution
//     re-expanded with zeros (SolverMPC.cpp:859-950, 973-981).
//     near-zero tolerance is |a| < 0.01 (SolverMPC.cpp:72-80).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <qpOASES.hpp>

#include <cstring>
#include <vector>

namespace {

constexpr double kNearTol = 0.01;  // SolverMPC.cpp:72-75

bool near_zero(double a) { return a < kNearTol && a > -kNearTol; }
bool near_one(double a) { return near_zero(a - 1.0); }

// One qpOASES solve with the reference's MPC options. Returns qpOASES
// status (0 == SUCCESSFUL_RETURN) and fills x_out (n doubles).
int solve_raw(int n, int m, const double* H, const double* g,
              const double* A, const double* lb, const double* ub,
              int nwsr_in, double* x_out, int* nwsr_out) {
  qpOASES::QProblem qp(n, m);
  qpOASES::Options op;
  op.setToMPC();
  op.printLevel = qpOASES::PL_NONE;
  qp.setOptions(op);
  qpOASES::int_t nWSR = nwsr_in;
  qpOASES::returnValue rv =
      qp.init(H, g, A, nullptr, nullptr, lb, ub, nWSR);
  if (nwsr_out) *nwsr_out = static_cast<int>(nWSR);
  if (rv != qpOASES::SUCCESSFUL_RETURN) return static_cast<int>(rv);
  rv = qp.getPrimalSolution(x_out);
  return static_cast<int>(rv);
}

}  // namespace

extern "C" {

// Solve the full QP, no elimination.  Row-major H (n*n), A (m*n).
int qpm_golden_solve(int n, int m, const double* H, const double* g,
                     const double* A, const double* lb, const double* ub,
                     int nwsr, double* x_out, int* nwsr_out) {
  return solve_raw(n, m, H, g, A, lb, ub, nwsr, x_out, nwsr_out);
}

// Solve with the reference's swing-leg reduction applied first
// (SolverMPC.cpp:859-981).  n must be 12*h and m 20*h for the index
// arithmetic (cs = (j*5)/3 - 3) to be meaningful.  x_out gets the
// re-expanded n-vector (zeros at eliminated variables).  Returns the
// qpOASES status of the reduced solve; *n_red_out reports the reduced
// variable count.
int qpm_golden_solve_reduced(int n, int m, const double* H, const double* g,
                             const double* A, const double* lb,
                             const double* ub, int nwsr, double* x_out,
                             int* n_red_out) {
  std::vector<char> var_elim(n, 0), con_elim(m, 0);
  for (int i = 0; i < m; ++i) {
    if (!(near_zero(lb[i]) && near_zero(ub[i]))) continue;
    const double* row = A + static_cast<size_t>(i) * n;
    for (int j = 0; j < n; ++j) {
      if (!near_one(row[j])) continue;
      int cs = (j * 5) / 3 - 3;
      var_elim[j - 2] = var_elim[j - 1] = var_elim[j] = 1;
      for (int k = 0; k < 5; ++k) con_elim[cs + k] = 1;
    }
  }

  std::vector<int> var_ind, con_ind;
  for (int i = 0; i < n; ++i)
    if (!var_elim[i]) var_ind.push_back(i);
  for (int i = 0; i < m; ++i)
    if (!con_elim[i]) con_ind.push_back(i);
  const int nr = static_cast<int>(var_ind.size());
  const int mr = static_cast<int>(con_ind.size());
  if (n_red_out) *n_red_out = nr;

  std::vector<double> Hr(static_cast<size_t>(nr) * nr);
  std::vector<double> gr(nr), Ar(static_cast<size_t>(mr) * nr);
  std::vector<double> lbr(mr), ubr(mr), xr(nr);
  for (int i = 0; i < nr; ++i) {
    gr[i] = g[var_ind[i]];
    for (int j = 0; j < nr; ++j)
      Hr[static_cast<size_t>(i) * nr + j] =
          H[static_cast<size_t>(var_ind[i]) * n + var_ind[j]];
  }
  for (int c = 0; c < mr; ++c) {
    for (int v = 0; v < nr; ++v)
      Ar[static_cast<size_t>(c) * nr + v] =
          A[static_cast<size_t>(con_ind[c]) * n + var_ind[v]];
    lbr[c] = lb[con_ind[c]];
    ubr[c] = ub[con_ind[c]];
  }

  int rv = solve_raw(nr, mr, Hr.data(), gr.data(), Ar.data(), lbr.data(),
                     ubr.data(), nwsr, xr.data(), nullptr);
  std::memset(x_out, 0, sizeof(double) * n);
  for (int i = 0; i < nr; ++i) x_out[var_ind[i]] = xr[i];
  return rv;
}

}  // extern "C"
