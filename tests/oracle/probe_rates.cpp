// Probe harness for the reference's exact-mode sampler rate integrals.
//
// Links against the reference's ParticleSampler.cpp (compiled in place,
// nothing copied) and calls its free function max_particle_number
// (/root/reference/src/cpp/ParticleSampler.cpp:164-239) directly, so the
// per-(cell, species) exact densities of the TPU sampler can be
// golden-tested value by value instead of only statistically.
//
// stdin, one case per line:
//   mbar degeneracy sign baryon T alphaB bulkPi F G betabulk z
//   feqmod_breaks_down df_mode include_baryon
// stdout: one density per line (%.17g).

#include <cstdio>
#include <cstring>

#include "iS3D.h"          // hbarC, two_pi2_hbarC3
#include "readindata.h"    // deltaf_coefficients, Gauss_Laguerre

double max_particle_number(double mbar, double degeneracy, double sign,
                           double baryon, double T, double alphaB,
                           double bulkPi, deltaf_coefficients df,
                           bool feqmod_breaks_down, Gauss_Laguerre *laguerre,
                           int df_mode, int include_baryon, double neq_fact,
                           double J20_fact);

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: probe_rates <gla_roots_weights.txt>\n");
    return 1;
  }
  Gauss_Laguerre laguerre;
  laguerre.load_roots_and_weights(argv[1]);

  double mbar, deg, sign, baryon, T, alphaB, bulkPi, F, G, betabulk, z;
  int breaks, df_mode, include_baryon;
  while (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %d %d %d",
               &mbar, &deg, &sign, &baryon, &T, &alphaB, &bulkPi, &F, &G,
               &betabulk, &z, &breaks, &df_mode, &include_baryon) == 14) {
    deltaf_coefficients df;
    memset(&df, 0, sizeof df);
    df.F = F;
    df.G = G;
    df.betabulk = betabulk;
    df.z = z;
    double neq_fact = T * T * T / two_pi2_hbarC3;
    double J20_fact = T * neq_fact;
    printf("%.17g\n",
           max_particle_number(mbar, deg, sign, baryon, T, alphaB, bulkPi, df,
                               breaks != 0, &laguerre, df_mode, include_baryon,
                               neq_fact, J20_fact));
  }
  return 0;
}
