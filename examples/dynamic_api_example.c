/* Dynamic parameter API example/smoke test: string-keyed typed access
 * to chemistry_data fields and per-type name enumeration
 * (grackle: src/clib/dynamic_api.c:35-116, grackle.h:41-50). */
#include <stdio.h>
#include <string.h>
#include "grackle_tpu.h"

int main(void) {
  chemistry_data c;
  set_default_chemistry_parameters(&c);
  int *pc = local_chemistry_data_access_int(&c, "primordial_chemistry");
  if (!pc || *pc != 0) { printf("FAIL int access\n"); return 1; }
  *pc = 3;
  if (c.primordial_chemistry != 3) { printf("FAIL int write\n"); return 1; }
  double *g = local_chemistry_data_access_double(&c, "Gamma");
  if (!g || *g < 1.6 || *g > 1.7) { printf("FAIL double access\n"); return 1; }
  const char **df = local_chemistry_data_access_string(&c, "grackle_data_file");
  if (!df) { printf("FAIL string access\n"); return 1; }
  if (local_chemistry_data_access_int(&c, "Gamma")) { printf("FAIL type mix\n"); return 1; }
  if (local_chemistry_data_access_int(&c, "nope")) { printf("FAIL unknown\n"); return 1; }
  int n_int = 0, n_dbl = 0, n_str = 0;
  while (param_name_int(n_int)) n_int++;
  while (param_name_double(n_dbl)) n_dbl++;
  while (param_name_string(n_str)) n_str++;
  printf("dynamic API OK: %d int, %d double, %d string params\n",
         n_int, n_dbl, n_str);
  printf("DYNAPI_EXAMPLE_SUCCESS\n");
  /* every enumerated name must round-trip through the accessor */
  for (int i = 0; i < n_int; i++)
    if (!local_chemistry_data_access_int(&c, param_name_int(i))) {
      printf("FAIL roundtrip %s\n", param_name_int(i)); return 1;
    }
  return 0;
}
