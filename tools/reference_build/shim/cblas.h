// minimal cblas shim for building the reference CPU GNN trainer
// (naive loops; correctness-only, used to generate golden outputs)
#pragma once
#include <cstddef>
enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 };
enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112 };
typedef enum CBLAS_ORDER CBLAS_LAYOUT;

static inline float cblas_sdot(int n, const float* x, int incx, const float* y, int incy) {
  double s = 0; for (int i = 0; i < n; i++) s += (double)x[i*incx] * y[i*incy]; return (float)s;
}
static inline void cblas_sscal(int n, float a, float* x, int incx) {
  for (int i = 0; i < n; i++) x[i*incx] *= a;
}
static inline void cblas_saxpy(int n, float a, const float* x, int incx, float* y, int incy) {
  for (int i = 0; i < n; i++) y[i*incy] += a * x[i*incx];
}
static inline void cblas_scopy(int n, const float* x, int incx, float* y, int incy) {
  for (int i = 0; i < n; i++) y[i*incy] = x[i*incx];
}
static inline void cblas_sgemm(enum CBLAS_ORDER, enum CBLAS_TRANSPOSE ta, enum CBLAS_TRANSPOSE tb,
                               int M, int N, int K, float alpha, const float* A, int lda,
                               const float* B, int ldb, float beta, float* C, int ldc) {
  #pragma omp parallel for
  for (int i = 0; i < M; i++) {
    for (int j = 0; j < N; j++) {
      double acc = 0;
      for (int k = 0; k < K; k++) {
        float a = (ta == CblasNoTrans) ? A[i*lda + k] : A[k*lda + i];
        float b = (tb == CblasNoTrans) ? B[k*ldb + j] : B[j*ldb + k];
        acc += (double)a * b;
      }
      C[i*ldc + j] = alpha * (float)acc + beta * C[i*ldc + j];
    }
  }
}
static inline void cblas_sgemv(enum CBLAS_ORDER, enum CBLAS_TRANSPOSE ta, int M, int N,
                               float alpha, const float* A, int lda, const float* x, int incx,
                               float beta, float* y, int incy) {
  if (ta == CblasNoTrans) {
    for (int i = 0; i < M; i++) {
      double acc = 0; for (int j = 0; j < N; j++) acc += (double)A[i*lda+j] * x[j*incx];
      y[i*incy] = alpha * (float)acc + beta * y[i*incy];
    }
  } else {
    for (int j = 0; j < N; j++) {
      double acc = 0; for (int i = 0; i < M; i++) acc += (double)A[i*lda+j] * x[i*incx];
      y[j*incy] = alpha * (float)acc + beta * y[j*incy];
    }
  }
}
