/* LU decomposition with partial pivoting (Doolittle), solve, invert.
 * General-n, but the reference only uses 3x3. */
#ifndef GSLSHIM_LINALG_H
#define GSLSHIM_LINALG_H

#include <cstdlib>
#include <cmath>

typedef struct {
  size_t n1, n2;
  double *data;  /* row-major, owned flag */
  int owned;
} gsl_matrix;

typedef struct { size_t n; double *data; int owned; } gsl_vector;

typedef struct { gsl_matrix matrix; } gsl_matrix_view;
typedef struct { gsl_vector vector; } gsl_vector_view;

typedef struct { size_t n; size_t *p; } gsl_permutation;

static inline gsl_matrix_view gsl_matrix_view_array(double *a, size_t n1, size_t n2) {
  gsl_matrix_view v; v.matrix.n1 = n1; v.matrix.n2 = n2;
  v.matrix.data = a; v.matrix.owned = 0; return v;
}
static inline gsl_vector_view gsl_vector_view_array(double *a, size_t n) {
  gsl_vector_view v; v.vector.n = n; v.vector.data = a; v.vector.owned = 0; return v;
}
static inline gsl_matrix *gsl_matrix_alloc(size_t n1, size_t n2) {
  gsl_matrix *m = (gsl_matrix *)calloc(1, sizeof(gsl_matrix));
  m->n1 = n1; m->n2 = n2; m->data = (double *)calloc(n1 * n2, sizeof(double));
  m->owned = 1; return m;
}
static inline void gsl_matrix_free(gsl_matrix *m) {
  if (!m) return; if (m->owned) free(m->data); free(m);
}
static inline double gsl_matrix_get(const gsl_matrix *m, size_t i, size_t j) {
  return m->data[i * m->n2 + j];
}
static inline gsl_vector *gsl_vector_alloc(size_t n) {
  gsl_vector *v = (gsl_vector *)calloc(1, sizeof(gsl_vector));
  v->n = n; v->data = (double *)calloc(n, sizeof(double)); v->owned = 1; return v;
}
static inline void gsl_vector_free(gsl_vector *v) {
  if (!v) return; if (v->owned) free(v->data); free(v);
}
static inline double gsl_vector_get(const gsl_vector *v, size_t i) { return v->data[i]; }

static inline gsl_permutation *gsl_permutation_alloc(size_t n) {
  gsl_permutation *p = (gsl_permutation *)calloc(1, sizeof(gsl_permutation));
  p->n = n; p->p = (size_t *)calloc(n, sizeof(size_t));
  for (size_t i = 0; i < n; i++) p->p[i] = i;
  return p;
}
static inline gsl_permutation *gsl_permutation_calloc(size_t n) {
  return gsl_permutation_alloc(n);
}
static inline void gsl_permutation_free(gsl_permutation *p) {
  if (!p) return; free(p->p); free(p);
}

/* LU with partial pivoting, in place; permutation recorded in p, sign in *signum */
static inline int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p, int *signum) {
  size_t n = A->n1;
  double *a = A->data;
  *signum = 1;
  for (size_t i = 0; i < n; i++) p->p[i] = i;
  for (size_t k = 0; k < n; k++) {
    size_t piv = k;
    double maxv = fabs(a[k * n + k]);
    for (size_t i = k + 1; i < n; i++) {
      double v = fabs(a[i * n + k]);
      if (v > maxv) { maxv = v; piv = i; }
    }
    if (piv != k) {
      for (size_t j = 0; j < n; j++) {
        double t = a[k * n + j]; a[k * n + j] = a[piv * n + j]; a[piv * n + j] = t;
      }
      size_t tp = p->p[k]; p->p[k] = p->p[piv]; p->p[piv] = tp;
      *signum = -(*signum);
    }
    double akk = a[k * n + k];
    if (akk != 0.0) {
      for (size_t i = k + 1; i < n; i++) {
        double f = a[i * n + k] / akk;
        a[i * n + k] = f;
        for (size_t j = k + 1; j < n; j++) a[i * n + j] -= f * a[k * n + j];
      }
    }
  }
  return 0;
}

static inline int gsl_linalg_LU_solve(const gsl_matrix *LU, const gsl_permutation *p,
                                      const gsl_vector *b, gsl_vector *x) {
  size_t n = LU->n1;
  const double *a = LU->data;
  for (size_t i = 0; i < n; i++) x->data[i] = b->data[p->p[i]];
  for (size_t i = 1; i < n; i++) {   /* forward (unit lower) */
    double s = x->data[i];
    for (size_t j = 0; j < i; j++) s -= a[i * n + j] * x->data[j];
    x->data[i] = s;
  }
  for (size_t i = n; i-- > 0;) {     /* backward (upper) */
    double s = x->data[i];
    for (size_t j = i + 1; j < n; j++) s -= a[i * n + j] * x->data[j];
    x->data[i] = s / a[i * n + i];
  }
  return 0;
}

static inline int gsl_linalg_LU_invert(const gsl_matrix *LU, const gsl_permutation *p,
                                       gsl_matrix *inverse) {
  size_t n = LU->n1;
  gsl_vector *b = gsl_vector_alloc(n);
  gsl_vector *x = gsl_vector_alloc(n);
  for (size_t col = 0; col < n; col++) {
    for (size_t i = 0; i < n; i++) b->data[i] = (i == col) ? 1.0 : 0.0;
    gsl_linalg_LU_solve(LU, p, b, x);
    for (size_t i = 0; i < n; i++) inverse->data[i * n + col] = x->data[i];
  }
  gsl_vector_free(b);
  gsl_vector_free(x);
  return 0;
}

#endif
