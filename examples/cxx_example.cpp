// C++ integration example (mirror of grackle: src/example/cxx_example.C).
// Build: g++ -I../clib/include cxx_example.cpp -L../clib -lgrackle_tpu \
//            -Wl,-rpath,$PWD/../clib -o cxx_example
// Run with PYTHONPATH pointing at the repo root and JAX_PLATFORMS as
// desired.

#include <cstdio>
#include <vector>

extern "C" {
#include "grackle_tpu.h"
}

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

  chemistry_data_storage rates;
  if (local_initialize_chemistry_data(&chem, &rates, &my_units) !=
      GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "initialize failed\n");
    return 1;
  }

  const int n = 16;
  std::vector<gr_float> density(n, 1.0), energy(n), de(n), HI(n),
      HII(n), HeI(n), HeII(n), HeIII(n), vel(n, 0.0), cool(n);
  for (int i = 0; i < n; i++) {
    HI[i] = 1e-20;
    HII[i] = 0.76;
    HeI[i] = 0.24;
    HeII[i] = 1e-20;
    HeIII[i] = 1e-20;
    de[i] = HII[i];
    energy[i] = 1.0e5 / 0.6 /
                (my_units.velocity_units * my_units.velocity_units *
                 1.67262171e-24 / 1.3806504e-16) /
                (5.0 / 3.0 - 1.0);
  }
  int dims[1] = {n}, start[1] = {0}, end[1] = {n - 1};
  grackle_field_data f = {};
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

  if (local_calculate_cooling_time(&chem, &rates, &my_units, &f,
                                   cool.data()) != GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "cooling time failed\n");
    return 1;
  }
  std::printf("cooling_time[0] = %g\n", (double)cool[0]);
  if (local_solve_chemistry(&chem, &rates, &my_units, &f, 0.01) !=
      GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "solve failed\n");
    return 1;
  }
  std::printf("HI[0] after solve = %g\n", (double)HI[0]);
  std::printf("CXX_EXAMPLE_SUCCESS\n");
  local_free_chemistry_data(&chem, &rates);
  return 0;
}
