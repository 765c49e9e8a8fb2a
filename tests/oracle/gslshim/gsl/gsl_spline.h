/* Natural cubic spline matching gsl_interp_cspline semantics. */
#ifndef GSLSHIM_SPLINE_H
#define GSLSHIM_SPLINE_H

#include <cstdlib>
#include <cstdio>

typedef struct { int unused; } gsl_interp_type;
static const gsl_interp_type gsl_interp_cspline_obj = {0};
#define gsl_interp_cspline (&gsl_interp_cspline_obj)

typedef struct { int unused; } gsl_interp_accel;

typedef struct {
  size_t n;
  double *x, *y, *b, *c, *d;  /* y(t) = y_i + b_i dx + c_i dx^2 + d_i dx^3 */
} gsl_spline;

static inline gsl_interp_accel *gsl_interp_accel_alloc(void) {
  return (gsl_interp_accel *)calloc(1, sizeof(gsl_interp_accel));
}
static inline void gsl_interp_accel_free(gsl_interp_accel *a) { free(a); }

static inline gsl_spline *gsl_spline_alloc(const gsl_interp_type *, size_t n) {
  gsl_spline *s = (gsl_spline *)calloc(1, sizeof(gsl_spline));
  s->n = n;
  s->x = (double *)calloc(n, sizeof(double));
  s->y = (double *)calloc(n, sizeof(double));
  s->b = (double *)calloc(n, sizeof(double));
  s->c = (double *)calloc(n, sizeof(double));
  s->d = (double *)calloc(n, sizeof(double));
  return s;
}

static inline void gsl_spline_free(gsl_spline *s) {
  /* Intentional no-op: the reference's Deltaf_Data destructor frees spline
   * pointers that were never allocated when include_baryon = 1
   * (DeltafData.cpp:49-63 vs iS3D.cpp:242-246).  Leaking instead of crashing
   * is fine for the short-lived oracle process. */
  (void)s;
}

/* natural cubic spline coefficients via Thomas algorithm */
static inline int gsl_spline_init(gsl_spline *s, const double *x,
                                  const double *y, size_t n) {
  for (size_t i = 0; i < n; i++) { s->x[i] = x[i]; s->y[i] = y[i]; }
  size_t m = n - 2;
  double *h = (double *)calloc(n - 1, sizeof(double));
  for (size_t i = 0; i < n - 1; i++) h[i] = x[i + 1] - x[i];
  if (m > 0) {
    double *cp = (double *)calloc(m, sizeof(double));
    double *dp = (double *)calloc(m, sizeof(double));
    for (size_t i = 0; i < m; i++) {
      double rhs = 3.0 * ((y[i + 2] - y[i + 1]) / h[i + 1] -
                          (y[i + 1] - y[i]) / h[i]);
      double diag = 2.0 * (h[i] + h[i + 1]);
      if (i == 0) { cp[0] = h[1] / diag; dp[0] = rhs / diag; }
      else {
        double denom = diag - h[i] * cp[i - 1];
        cp[i] = h[i + 1] / denom;
        dp[i] = (rhs - h[i] * dp[i - 1]) / denom;
      }
    }
    s->c[m] = dp[m - 1];
    for (size_t i = m - 1; i > 0; i--) s->c[i] = dp[i - 1] - cp[i - 1] * s->c[i + 1];
    free(cp); free(dp);
  }
  s->c[0] = 0.0; s->c[n - 1] = 0.0;
  for (size_t i = 0; i < n - 1; i++) {
    s->b[i] = (y[i + 1] - y[i]) / h[i] - h[i] * (s->c[i + 1] + 2.0 * s->c[i]) / 3.0;
    s->d[i] = (s->c[i + 1] - s->c[i]) / (3.0 * h[i]);
  }
  free(h);
  return 0;
}

static inline double gsl_spline_eval(const gsl_spline *s, double xq,
                                     gsl_interp_accel *) {
  size_t lo = 0, hi = s->n - 1;
  if (xq <= s->x[0]) lo = 0;
  else if (xq >= s->x[s->n - 1]) lo = s->n - 2;
  else {
    while (hi - lo > 1) {
      size_t mid = (hi + lo) / 2;
      if (s->x[mid] > xq) hi = mid; else lo = mid;
    }
  }
  double dx = xq - s->x[lo];
  return s->y[lo] + dx * (s->b[lo] + dx * (s->c[lo] + dx * s->d[lo]));
}

#endif
