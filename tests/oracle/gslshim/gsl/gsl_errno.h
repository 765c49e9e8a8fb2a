/* Minimal GSL API shim so the reference C++ (tests/oracle) can be compiled
 * without a system GSL.  Implements only what iS3D2 calls: natural cubic
 * splines, 3x3 LU decompose/solve/invert, and the error-handler toggle.
 * Used exclusively to produce golden outputs for validation tests. */
#ifndef GSLSHIM_ERRNO_H
#define GSLSHIM_ERRNO_H
static inline void gsl_set_error_handler_off(void) {}
#endif
