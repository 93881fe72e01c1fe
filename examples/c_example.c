/* C integration example for grackle_tpu.
 *
 * Mirror of the reference's C example (grackle: src/example/c_example.c):
 * set parameters, initialize, build a small field set, run solve_chemistry
 * plus the derived-field calculators, and print results.
 *
 * Build (from examples/):
 *   gcc -I../clib/include c_example.c -L../clib -lgrackle_tpu \
 *       -Wl,-rpath,../clib -o c_example
 * Run with PYTHONPATH=.. so the embedded interpreter finds grackle_tpu.
 */

#include <stdio.h>
#include <stdlib.h>

#include "grackle_tpu.h"

int main(int argc, char *argv[]) {
  grackle_verbose = 0;

  /* units: 1 H/cc density, kpc length, Myr time */
  code_units my_units;
  my_units.comoving_coordinates = 0;
  my_units.density_units = 1.67262171e-24;
  my_units.length_units = 3.0857e21;
  my_units.time_units = 3.1556952e13;
  my_units.a_units = 1.0;
  my_units.a_value = 1.0;
  my_units.velocity_units =
      my_units.length_units / my_units.time_units;

  chemistry_data my_chemistry;
  set_default_chemistry_parameters(&my_chemistry);
  my_chemistry.use_grackle = 1;
  my_chemistry.with_radiative_cooling = 1;
  my_chemistry.primordial_chemistry = 2;
  my_chemistry.metal_cooling = 0;
  my_chemistry.UVbackground = 0;

  chemistry_data_storage my_rates;
  if (local_initialize_chemistry_data(&my_chemistry, &my_rates,
                                      &my_units) != GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in initialize_chemistry_data.\n");
    return 1;
  }

  /* one 8-cell rank-1 grid */
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
    /* T ~ 1e4 K with mu ~ 1.2 */
    energy[i] = 1.0e4 / 1.2 /
                (my_units.velocity_units * my_units.velocity_units *
                 1.67262171e-24 / 1.3806504e-16) /
                (5.0 / 3.0 - 1.0);
  }

  grackle_field_data my_fields = {0};
  my_fields.grid_rank = grid_rank;
  my_fields.grid_dimension = grid_dimension;
  my_fields.grid_start = grid_start;
  my_fields.grid_end = grid_end;
  my_fields.grid_dx = 0.0;
  my_fields.density = density;
  my_fields.internal_energy = energy;
  my_fields.x_velocity = x_vel;
  my_fields.y_velocity = y_vel;
  my_fields.z_velocity = z_vel;
  my_fields.HI_density = HI;
  my_fields.HII_density = HII;
  my_fields.HM_density = HM;
  my_fields.HeI_density = HeI;
  my_fields.HeII_density = HeII;
  my_fields.HeIII_density = HeIII;
  my_fields.H2I_density = H2I;
  my_fields.H2II_density = H2II;
  my_fields.e_density = de;

  double dt = 3.15e7 * 1e6 / my_units.time_units; /* 1 Myr */
  if (local_solve_chemistry(&my_chemistry, &my_rates, &my_units,
                            &my_fields, dt) != GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in solve_chemistry.\n");
    return 1;
  }

  gr_float *cooling_time = malloc(n * sizeof(gr_float));
  gr_float *temperature = malloc(n * sizeof(gr_float));
  gr_float *pressure = malloc(n * sizeof(gr_float));
  gr_float *gamma_arr = malloc(n * sizeof(gr_float));
  if (local_calculate_cooling_time(&my_chemistry, &my_rates, &my_units,
                                   &my_fields, cooling_time) !=
      GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in calculate_cooling_time.\n");
    return 1;
  }
  if (local_calculate_temperature(&my_chemistry, &my_rates, &my_units,
                                  &my_fields, temperature) !=
      GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in calculate_temperature.\n");
    return 1;
  }
  if (local_calculate_pressure(&my_chemistry, &my_rates, &my_units,
                               &my_fields, pressure) !=
      GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in calculate_pressure.\n");
    return 1;
  }
  if (local_calculate_gamma(&my_chemistry, &my_rates, &my_units,
                            &my_fields, gamma_arr) !=
      GRACKLE_TPU_SUCCESS) {
    fprintf(stderr, "Error in calculate_gamma.\n");
    return 1;
  }

  printf("HI[0] = %g\n", (double)HI[0]);
  printf("HII[0] = %g\n", (double)HII[0]);
  printf("cooling_time[0] = %g\n", (double)cooling_time[0]);
  printf("temperature[0] = %g\n", (double)temperature[0]);
  printf("pressure[0] = %g\n", (double)pressure[0]);
  printf("gamma[0] = %g\n", (double)gamma_arr[0]);
  printf("C_EXAMPLE_SUCCESS\n");

  local_free_chemistry_data(&my_chemistry, &my_rates);
  return 0;
}
