/* Legacy flat-pointer API example for grackle_tpu.
 *
 * Exercises the deprecated pre-field-struct tier
 * (grackle: src/clib/grackle.h:34-77 — _set_default_chemistry_parameters,
 * _initialize_chemistry_data, _solve_chemistry, _calculate_temperature,
 * _free_chemistry_data) so host codes written against the old Grackle
 * interface link and run unchanged.  New code should use c_example.c's
 * local_* tier instead.
 *
 * Build (from examples/):
 *   gcc -Wno-deprecated-declarations -I../clib/include \
 *       c_legacy_api_example.c -L../clib -lgrackle_tpu \
 *       -Wl,-rpath,../clib -o c_legacy_api_example
 * Run with PYTHONPATH=.. so the embedded interpreter finds grackle_tpu.
 */

#include <stdio.h>
#include <stdlib.h>

#include "grackle_tpu.h"

int main(int argc, char *argv[]) {
  grackle_verbose = 0;

  code_units my_units;
  my_units.comoving_coordinates = 0;
  my_units.density_units = 1.67262171e-24;
  my_units.length_units = 3.0857e21;
  my_units.time_units = 3.1556952e13;
  my_units.a_units = 1.0;
  my_units.a_value = 1.0;
  set_velocity_units(&my_units);

  /* old tier: defaults returned by value */
  chemistry_data my_chemistry = _set_default_chemistry_parameters();
  my_chemistry.use_grackle = 1;
  my_chemistry.with_radiative_cooling = 1;
  my_chemistry.primordial_chemistry = 2;
  my_chemistry.metal_cooling = 0;
  my_chemistry.UVbackground = 0;

  chemistry_data_storage my_rates;
  if (_initialize_chemistry_data(&my_chemistry, &my_rates, &my_units) !=
      GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in _initialize_chemistry_data.\n");
    return 1;
  }

  int n = 8;
  int grid_rank = 1;
  int grid_dimension[] = {8};
  int grid_start[] = {0};
  int grid_end[] = {7};

  gr_float *density = malloc(n * sizeof(gr_float));
  gr_float *energy = malloc(n * sizeof(gr_float));
  gr_float *x_vel = calloc(n, sizeof(gr_float));
  gr_float *y_vel = calloc(n, sizeof(gr_float));
  gr_float *z_vel = calloc(n, sizeof(gr_float));
  gr_float *HI = malloc(n * sizeof(gr_float));
  gr_float *HII = malloc(n * sizeof(gr_float));
  gr_float *HM = malloc(n * sizeof(gr_float));
  gr_float *HeI = malloc(n * sizeof(gr_float));
  gr_float *HeII = malloc(n * sizeof(gr_float));
  gr_float *HeIII = malloc(n * sizeof(gr_float));
  gr_float *H2I = malloc(n * sizeof(gr_float));
  gr_float *H2II = malloc(n * sizeof(gr_float));
  gr_float *de = malloc(n * sizeof(gr_float));

  double tiny = 1.0e-20;
  for (int i = 0; i < n; i++) {
    density[i] = 1.0;
    HI[i] = 0.76 * density[i];
    HII[i] = tiny * density[i];
    HM[i] = tiny * density[i];
    HeI[i] = 0.24 * density[i];
    HeII[i] = tiny * density[i];
    HeIII[i] = tiny * density[i];
    H2I[i] = tiny * density[i];
    H2II[i] = tiny * density[i];
    de[i] = HII[i] + HeII[i] / 4.0 + HeIII[i] / 2.0;
    energy[i] = 1.0e4 / 1.2 /
                (my_units.velocity_units * my_units.velocity_units *
                 1.67262171e-24 / 1.3806504e-16) /
                (5.0 / 3.0 - 1.0);
  }

  double dt = 3.15e7 * 1e6 / my_units.time_units; /* 1 Myr */
  /* old tier: every field is its own pointer argument; fields the
   * 9-species problem doesn't use pass NULL (metal, D species, dust,
   * heating/RT arrays), exactly like legacy Grackle hosts did */
  if (_solve_chemistry(&my_chemistry, &my_rates, &my_units, dt, 0.0,
                       grid_rank, grid_dimension, grid_start, grid_end,
                       density, energy, x_vel, y_vel, z_vel,
                       HI, HII, HM, HeI, HeII, HeIII, H2I, H2II,
                       NULL, NULL, NULL, de, NULL, NULL,
                       NULL, NULL, NULL, NULL, NULL, NULL, NULL,
                       NULL) != GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in _solve_chemistry.\n");
    return 1;
  }

  gr_float *temperature = malloc(n * sizeof(gr_float));
  gr_float *pressure = malloc(n * sizeof(gr_float));
  if (_calculate_temperature(&my_chemistry, &my_rates, &my_units,
                             grid_rank, grid_dimension, grid_start,
                             grid_end, density, energy,
                             HI, HII, HM, HeI, HeII, HeIII, H2I, H2II,
                             NULL, NULL, NULL, de, NULL,
                             temperature) != GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in _calculate_temperature.\n");
    return 1;
  }
  if (_calculate_pressure(&my_chemistry, &my_rates, &my_units,
                          grid_rank, grid_dimension, grid_start,
                          grid_end, density, energy,
                          HI, HII, HM, HeI, HeII, HeIII, H2I, H2II,
                          NULL, NULL, NULL, de, NULL,
                          pressure) != GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in _calculate_pressure.\n");
    return 1;
  }

  printf("HI[0] = %g\n", (double)HI[0]);
  printf("temperature[0] = %g\n", (double)temperature[0]);
  printf("pressure[0] = %g\n", (double)pressure[0]);
  printf("C_LEGACY_EXAMPLE_SUCCESS\n");

  _free_chemistry_data(&my_chemistry, &my_rates);
  return 0;
}
