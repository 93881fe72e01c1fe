// Multi-threaded host integration example (analogue of the reference's
// OpenMP example, grackle: src/example/cxx_omp_example.C).  The
// reference parallelizes INSIDE the library with OpenMP; grackle_tpu
// instead serializes host calls through the shim mutex and parallelizes
// on-device, so the demonstration here is that concurrent host threads
// each driving their own grid slab are safe and produce the same
// answers as a single-threaded sweep.
//
// Build: g++ -fopenmp -I../clib/include cxx_omp_example.cpp \
//            -L../clib -lgrackle_tpu -Wl,-rpath,$PWD/../clib \
//            -o cxx_omp_example
// Run with PYTHONPATH pointing at the repo root.

#include <cmath>
#include <cstdio>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {
#include "grackle_tpu.h"
}

static const int kSlab = 16;
static const int kThreads = 4;

struct Slab {
  std::vector<gr_float> density, energy, de, HI, HII, HeI, HeII, HeIII,
      vel;
  int dims[1], start[1], end[1];
  grackle_field_data f = {};

  explicit Slab(double velocity_units, int seed)
      : density(kSlab), energy(kSlab), de(kSlab), HI(kSlab), HII(kSlab),
        HeI(kSlab), HeII(kSlab), HeIII(kSlab), vel(kSlab, 0.0) {
    for (int i = 0; i < kSlab; i++) {
      double d = 1.0 + 0.1 * ((seed * kSlab + i) % 7);
      density[i] = d;
      HI[i] = 0.38 * d;
      HII[i] = 0.38 * d;
      HeI[i] = 0.24 * d;
      HeII[i] = 1e-20;
      HeIII[i] = 1e-20;
      de[i] = HII[i];
      energy[i] = 1.0e5 / 0.6 /
                  (velocity_units * velocity_units * 1.67262171e-24 /
                   1.3806504e-16) /
                  (5.0 / 3.0 - 1.0);
    }
    dims[0] = kSlab;
    start[0] = 0;
    end[0] = kSlab - 1;
    f.grid_rank = 1;
    f.grid_dimension = dims;
    f.grid_start = start;
    f.grid_end = end;
    f.density = density.data();
    f.internal_energy = energy.data();
    f.x_velocity = vel.data();
    f.y_velocity = vel.data();
    f.z_velocity = vel.data();
    f.e_density = de.data();
    f.HI_density = HI.data();
    f.HII_density = HII.data();
    f.HeI_density = HeI.data();
    f.HeII_density = HeII.data();
    f.HeIII_density = HeIII.data();
  }
};

int main() {
  code_units my_units;
  my_units.comoving_coordinates = 0;
  my_units.density_units = 1.67262171e-24;
  my_units.length_units = 3.0857e21;
  my_units.time_units = 3.1556952e13;
  my_units.a_units = 1.0;
  my_units.a_value = 1.0;
  my_units.velocity_units = my_units.length_units / my_units.time_units;

  chemistry_data chem;
  set_default_chemistry_parameters(&chem);
  chem.use_grackle = 1;
  chem.primordial_chemistry = 1;
  // host-thread count knob kept for API parity with the reference
  chem.omp_nthreads = kThreads;

  chemistry_data_storage rates;
  if (local_initialize_chemistry_data(&chem, &rates, &my_units) !=
      GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "initialize failed\n");
    return 1;
  }

  // serial reference sweep
  std::vector<double> serial(kThreads);
  for (int t = 0; t < kThreads; t++) {
    Slab s(my_units.velocity_units, t);
    if (local_solve_chemistry(&chem, &rates, &my_units, &s.f, 0.01) !=
        GRACKLE_TPU_SUCCESS) {
      std::fprintf(stderr, "serial solve failed\n");
      return 1;
    }
    serial[t] = s.HI[0];
  }

  // concurrent sweep: one slab per host thread
  std::vector<double> parallel(kThreads);
  int failures = 0;
#pragma omp parallel for num_threads(kThreads) reduction(+ : failures)
  for (int t = 0; t < kThreads; t++) {
    Slab s(my_units.velocity_units, t);
    if (local_solve_chemistry(&chem, &rates, &my_units, &s.f, 0.01) !=
        GRACKLE_TPU_SUCCESS) {
      failures += 1;
    } else {
      parallel[t] = s.HI[0];
    }
  }
  if (failures) {
    std::fprintf(stderr, "%d threaded solves failed\n", failures);
    return 1;
  }

  for (int t = 0; t < kThreads; t++) {
    std::printf("slab %d: serial HI[0]=%g threaded HI[0]=%g\n", t,
                serial[t], parallel[t]);
    if (std::fabs(parallel[t] / serial[t] - 1.0) > 1e-12) {
      std::fprintf(stderr, "thread/serial mismatch on slab %d\n", t);
      return 1;
    }
  }

  // Independent contexts are isolated values (docs/Integration.md §9):
  // two parameter sets driven concurrently from different threads must
  // each reproduce their own serial answer.  Context B disables
  // radiative cooling, so its energies must come back unchanged while
  // context A's evolve — a cross-contamination canary.
  chemistry_data chem_b;
  set_default_chemistry_parameters(&chem_b);
  chem_b.use_grackle = 1;
  chem_b.primordial_chemistry = 1;
  chem_b.with_radiative_cooling = 0;
  chemistry_data_storage rates_b;
  if (local_initialize_chemistry_data(&chem_b, &rates_b, &my_units) !=
      GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "context B initialize failed\n");
    return 1;
  }
  double a_HI = 0.0, b_energy_in = 0.0, b_energy_out = 0.0;
  failures = 0;
#pragma omp parallel num_threads(2) reduction(+ : failures)
  {
#ifdef _OPENMP
    const int tid = omp_get_thread_num();
#else
    const int tid = 0;
#endif
    if (tid == 0) {
      Slab s(my_units.velocity_units, 0);
      if (local_solve_chemistry(&chem, &rates, &my_units, &s.f, 0.01) !=
          GRACKLE_TPU_SUCCESS) {
        failures += 1;
      } else {
        a_HI = s.HI[0];
      }
    } else {
      Slab s(my_units.velocity_units, 1);
      b_energy_in = s.energy[0];
      if (local_solve_chemistry(&chem_b, &rates_b, &my_units, &s.f,
                                0.01) != GRACKLE_TPU_SUCCESS) {
        failures += 1;
      } else {
        b_energy_out = s.energy[0];
      }
    }
  }
  if (failures) {
    std::fprintf(stderr, "two-context concurrent solve failed\n");
    return 1;
  }
  if (std::fabs(a_HI / serial[0] - 1.0) > 1e-12) {
    std::fprintf(stderr, "context A answer changed under context B\n");
    return 1;
  }
  if (b_energy_out != b_energy_in) {
    std::fprintf(stderr,
                 "context B (cooling off) energy changed: %g -> %g\n",
                 b_energy_in, b_energy_out);
    return 1;
  }

  std::printf("CXX_OMP_EXAMPLE_SUCCESS\n");
  local_free_chemistry_data(&chem_b, &rates_b);
  local_free_chemistry_data(&chem, &rates);
  return 0;
}
