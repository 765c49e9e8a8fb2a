/* included by the reference but no bessel function is actually called */
#ifndef GSLSHIM_SF_BESSEL_H
#define GSLSHIM_SF_BESSEL_H
#endif
