// 3-D ghost-zone grid integration example (the TPU-native analogue of
// grackle: src/example/cxx_grid_example.C).
//
// Drives the C ABI's grid path: a (5,6,7) grid with asymmetric ghost
// depths (1,0,2), ghost cells filled with random garbage, active cells
// with a physical state.  Verifies that solve_chemistry and every
// calculate_* routine evolve ONLY the active region -- ghost values
// must pass through bit-identical -- across primordial_chemistry 0-3.
//
// Build: g++ -I../clib/include cxx_grid_example.cpp -L../clib \
//            -lgrackle_tpu -Wl,-rpath,$PWD/../clib -o cxx_grid_example
// Run:   ./cxx_grid_example <path-to-cloudy-data.h5>
//        (generate one with grackle_tpu.data.synthetic if needed)

#include <cstdio>
#include <cstring>
#include <map>
#include <random>
#include <string>
#include <vector>

extern "C" {
#include "grackle_tpu.h"
}

namespace {

constexpr int kDims[3] = {5, 6, 7};
constexpr int kGhost[3] = {1, 0, 2};
constexpr gr_float kTiny = 1.0e-20;

int field_size() { return kDims[0] * kDims[1] * kDims[2]; }

bool is_ghost(int ix, int iy, int iz) {
  return ix < kGhost[0] || ix >= kDims[0] - kGhost[0] ||
         iy < kGhost[1] || iy >= kDims[1] - kGhost[1] ||
         iz < kGhost[2] || iz >= kDims[2] - kGhost[2];
}

using FieldMap = std::map<std::string, std::vector<gr_float>>;

// every array starts as random garbage; active cells are overwritten
// with physics below, ghost cells keep the garbage
std::vector<gr_float> random_field(std::mt19937& rng) {
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::vector<gr_float> out(field_size());
  for (auto& v : out) v = (gr_float)uni(rng);
  return out;
}

int ghost_mismatches(const std::vector<gr_float>& before,
                     const std::vector<gr_float>& after) {
  int bad = 0;
  for (int iz = 0; iz < kDims[2]; iz++)
    for (int iy = 0; iy < kDims[1]; iy++)
      for (int ix = 0; ix < kDims[0]; ix++) {
        int i = ix + kDims[0] * (iy + kDims[1] * iz);
        if (is_ghost(ix, iy, iz) && before[i] != after[i]) bad++;
      }
  return bad;
}

bool check_ghosts(const FieldMap& before, const FieldMap& after,
                  const char* what) {
  int bad = 0;
  for (const auto& kv : before)
    bad += ghost_mismatches(kv.second, after.at(kv.first));
  if (bad) {
    std::fprintf(stderr, "%s mutated %d ghost values\n", what, bad);
    return false;
  }
  std::fprintf(stderr, "%s: ghost zones untouched\n", what);
  return true;
}

int run_one(int primordial_chemistry, const char* data_file) {
  code_units units;
  units.comoving_coordinates = 0;
  units.density_units = 1.67262171e-24;
  units.length_units = 3.0857e21;
  units.time_units = 3.1556952e13;
  units.a_units = 1.0;
  units.a_value = 1.0;
  set_velocity_units(&units);

  chemistry_data* chem = new chemistry_data;
  if (set_default_chemistry_parameters(chem) != GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "set_default_chemistry_parameters failed\n");
    return 1;
  }
  grackle_data->use_grackle = 1;
  grackle_data->with_radiative_cooling = 1;
  grackle_data->primordial_chemistry = primordial_chemistry;
  grackle_data->dust_chemistry = primordial_chemistry == 0 ? 0 : 1;
  grackle_data->metal_cooling = 1;
  grackle_data->UVbackground = 1;
  grackle_data->use_isrf_field = 1;
  grackle_data->grackle_data_file = data_file;

  if (initialize_chemistry_data(&units) != GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "initialize_chemistry_data failed\n");
    return 1;
  }

  std::mt19937 rng(1234u + (unsigned)primordial_chemistry);
  static const char* kFieldNames[] = {
      "density", "internal_energy", "x_velocity", "y_velocity",
      "z_velocity", "e_density", "HI_density", "HII_density",
      "HeI_density", "HeII_density", "HeIII_density", "HM_density",
      "H2I_density", "H2II_density", "DI_density", "DII_density",
      "HDI_density", "metal_density", "volumetric_heating_rate",
      "specific_heating_rate", "RT_heating_rate",
      "RT_HI_ionization_rate", "RT_HeI_ionization_rate",
      "RT_HeII_ionization_rate", "RT_H2_dissociation_rate",
      "isrf_habing"};
  FieldMap vals;
  for (const char* name : kFieldNames) vals[name] = random_field(rng);

  double tunits = get_temperature_units(&units);
  double fh = grackle_data->HydrogenFractionByMass;
  for (int iz = 0; iz < kDims[2]; iz++)
    for (int iy = 0; iy < kDims[1]; iy++)
      for (int ix = 0; ix < kDims[0]; ix++) {
        if (is_ghost(ix, iy, iz)) continue;
        int i = ix + kDims[0] * (iy + kDims[1] * iz);
        gr_float d = 1.0;
        vals["density"][i] = d;
        vals["HI_density"][i] = (gr_float)(fh * d);
        vals["HII_density"][i] = kTiny * d;
        vals["HeI_density"][i] = (gr_float)((1.0 - fh) * d);
        vals["HeII_density"][i] = kTiny * d;
        vals["HeIII_density"][i] = kTiny * d;
        vals["e_density"][i] = kTiny * d;
        vals["HM_density"][i] = kTiny * d;
        vals["H2I_density"][i] = kTiny * d;
        vals["H2II_density"][i] = kTiny * d;
        vals["DI_density"][i] = (gr_float)(2.0 * 3.4e-5 * d);
        vals["DII_density"][i] = kTiny * d;
        vals["HDI_density"][i] = kTiny * d;
        vals["metal_density"][i] =
            (gr_float)(grackle_data->SolarMetalFractionByMass * d);
        vals["x_velocity"][i] = 0.0;
        vals["y_velocity"][i] = 0.0;
        vals["z_velocity"][i] = 0.0;
        vals["internal_energy"][i] = (gr_float)(1000.0 / tunits);
        vals["volumetric_heating_rate"][i] = 0.0;
        vals["specific_heating_rate"][i] = 0.0;
        vals["RT_heating_rate"][i] = 0.0;
        vals["RT_HI_ionization_rate"][i] = 0.0;
        vals["RT_HeI_ionization_rate"][i] = 0.0;
        vals["RT_HeII_ionization_rate"][i] = 0.0;
        vals["RT_H2_dissociation_rate"][i] = 0.0;
        vals["isrf_habing"][i] =
            (gr_float)grackle_data->interstellar_radiation_field;
      }

  int dims[3], start[3], end[3];
  for (int a = 0; a < 3; a++) {
    dims[a] = kDims[a];
    start[a] = kGhost[a];
    end[a] = kDims[a] - kGhost[a] - 1;
  }
  grackle_field_data f;
  std::memset(&f, 0, sizeof f);
  f.grid_rank = 3;
  f.grid_dimension = dims;
  f.grid_start = start;
  f.grid_end = end;
  f.grid_dx = 0.0;
  f.density = vals["density"].data();
  f.internal_energy = vals["internal_energy"].data();
  f.x_velocity = vals["x_velocity"].data();
  f.y_velocity = vals["y_velocity"].data();
  f.z_velocity = vals["z_velocity"].data();
  f.e_density = vals["e_density"].data();
  f.HI_density = vals["HI_density"].data();
  f.HII_density = vals["HII_density"].data();
  f.HeI_density = vals["HeI_density"].data();
  f.HeII_density = vals["HeII_density"].data();
  f.HeIII_density = vals["HeIII_density"].data();
  f.HM_density = vals["HM_density"].data();
  f.H2I_density = vals["H2I_density"].data();
  f.H2II_density = vals["H2II_density"].data();
  f.DI_density = vals["DI_density"].data();
  f.DII_density = vals["DII_density"].data();
  f.HDI_density = vals["HDI_density"].data();
  f.metal_density = vals["metal_density"].data();
  f.volumetric_heating_rate = vals["volumetric_heating_rate"].data();
  f.specific_heating_rate = vals["specific_heating_rate"].data();
  f.RT_heating_rate = vals["RT_heating_rate"].data();
  f.RT_HI_ionization_rate = vals["RT_HI_ionization_rate"].data();
  f.RT_HeI_ionization_rate = vals["RT_HeI_ionization_rate"].data();
  f.RT_HeII_ionization_rate = vals["RT_HeII_ionization_rate"].data();
  f.RT_H2_dissociation_rate = vals["RT_H2_dissociation_rate"].data();
  f.isrf_habing = vals["isrf_habing"].data();

  FieldMap before = vals;  // deep copy

  double dt = 3.15e7 * 1.0e6 / units.time_units;
  if (solve_chemistry(&units, &f, dt) != GRACKLE_TPU_SUCCESS) {
    std::fprintf(stderr, "solve_chemistry failed\n");
    return 1;
  }
  if (!check_ghosts(before, vals, "solve_chemistry")) return 1;

  // active region must actually have evolved
  {
    int i0 = kGhost[0] +
             kDims[0] * (kGhost[1] + kDims[1] * kGhost[2]);
    if (vals["internal_energy"][i0] ==
        before["internal_energy"][i0]) {
      std::fprintf(stderr, "active region did not evolve\n");
      return 1;
    }
  }

  struct Calc {
    const char* name;
    int (*fn)(code_units*, grackle_field_data*, gr_float*);
  };
  const Calc calcs[] = {
      {"calculate_cooling_time", &calculate_cooling_time},
      {"calculate_temperature", &calculate_temperature},
      {"calculate_pressure", &calculate_pressure},
      {"calculate_gamma", &calculate_gamma},
      {"calculate_dust_temperature", &calculate_dust_temperature},
  };
  for (const Calc& c : calcs) {
    std::vector<gr_float> out = random_field(rng);
    std::vector<gr_float> out_before = out;
    if (c.fn(&units, &f, out.data()) != GRACKLE_TPU_SUCCESS) {
      std::fprintf(stderr, "%s failed\n", c.name);
      return 1;
    }
    if (ghost_mismatches(out_before, out)) {
      std::fprintf(stderr, "%s wrote into ghost cells\n", c.name);
      return 1;
    }
    std::fprintf(stderr, "%s: ghost zones untouched\n", c.name);
  }

  local_free_chemistry_data(grackle_data, &grackle_rates);
  delete chem;
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <cloudy-data-file.h5>\n", argv[0]);
    return 1;
  }
  grackle_verbose = 0;
  for (int chem = 0; chem <= 3; chem++) {
    std::fprintf(stderr, "primordial_chemistry = %d\n", chem);
    if (run_one(chem, argv[1])) return 1;
  }
  std::printf("CXX_GRID_EXAMPLE_SUCCESS\n");
  return 0;
}
