#ifndef GSLSHIM_INTERP_H
#define GSLSHIM_INTERP_H
#include "gsl_spline.h"
#endif
