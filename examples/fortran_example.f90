!=======================================================================
! Fortran host-code integration example (the TPU-native analogue of
! grackle: src/example/fortran_example.F, modernized to F2003 BIND(C)).
!
! Uses the generated grackle_tpu_fortran module: sets up code units and
! chemistry parameters, initializes, evolves a 6-species slab for one
! timestep, and computes cooling time + temperature through the C ABI.
!
! Build (needs gfortran):
!   gfortran -c ../clib/grackle_tpu_fortran.f90
!   gfortran fortran_example.f90 grackle_tpu_fortran.o \
!       -L../clib -lgrackle_tpu -Wl,-rpath,$PWD/../clib \
!       -o fortran_example
! Run with PYTHONPATH at the repo root and JAX_PLATFORMS=cpu.
!=======================================================================

program fortran_example
  use iso_c_binding
  use grackle_tpu_fortran
  implicit none

  integer, parameter :: n = 16
  type(grackle_tpu_units) :: my_units
  type(grackle_tpu_chemistry_data), target :: my_chemistry
  type(grackle_tpu_storage) :: my_rates
  type(grackle_tpu_field_data) :: my_fields
  integer(c_int), dimension(3), target :: dims, istart, iend
  real(c_double), dimension(n), target :: density, energy, de, &
       HI_d, HII_d, HeI_d, HeII_d, HeIII_d, velocity, cooltime, temp
  real(c_double) :: temperature_units, dt
  integer(c_int) :: rc
  integer :: i

  ! code units (cgs conversions; proper coordinates)
  my_units%comoving_coordinates = 0
  my_units%density_units = 1.67262171d-24
  my_units%length_units = 3.0857d21
  my_units%time_units = 3.1556952d13
  my_units%a_units = 1.0d0
  my_units%a_value = 1.0d0
  call set_velocity_units(my_units)

  rc = set_default_chemistry_parameters(my_chemistry)
  if (rc /= 1) stop 'set_default_chemistry_parameters failed'
  my_chemistry%use_grackle = 1
  my_chemistry%with_radiative_cooling = 1
  my_chemistry%primordial_chemistry = 1
  my_chemistry%metal_cooling = 0
  my_chemistry%UVbackground = 0

  rc = local_initialize_chemistry_data(my_chemistry, my_rates, my_units)
  if (rc /= 1) stop 'initialize_chemistry_data failed'

  temperature_units = get_temperature_units(my_units)

  do i = 1, n
     density(i) = 1.0d0
     HI_d(i) = 1.0d-20
     HII_d(i) = 0.76d0 * density(i)
     HeI_d(i) = 0.24d0 * density(i)
     HeII_d(i) = 1.0d-20
     HeIII_d(i) = 1.0d-20
     de(i) = HII_d(i)
     velocity(i) = 0.0d0
     ! 10^5 K, ionized-gas mean molecular weight ~0.6
     energy(i) = 1.0d5 / 0.6d0 / temperature_units / (5.0d0/3.0d0 - 1.0d0)
  end do

  dims = (/ n, 1, 1 /)
  istart = (/ 0, 0, 0 /)
  iend = (/ n - 1, 0, 0 /)
  my_fields%grid_rank = 1
  my_fields%grid_dimension = c_loc(dims)
  my_fields%grid_start = c_loc(istart)
  my_fields%grid_end = c_loc(iend)
  my_fields%grid_dx = 0.0d0
  my_fields%density = c_loc(density)
  my_fields%internal_energy = c_loc(energy)
  my_fields%x_velocity = c_loc(velocity)
  my_fields%y_velocity = c_loc(velocity)
  my_fields%z_velocity = c_loc(velocity)
  my_fields%e_density = c_loc(de)
  my_fields%HI_density = c_loc(HI_d)
  my_fields%HII_density = c_loc(HII_d)
  my_fields%HeI_density = c_loc(HeI_d)
  my_fields%HeII_density = c_loc(HeII_d)
  my_fields%HeIII_density = c_loc(HeIII_d)
  my_fields%HM_density = c_null_ptr
  my_fields%H2I_density = c_null_ptr
  my_fields%H2II_density = c_null_ptr
  my_fields%DI_density = c_null_ptr
  my_fields%DII_density = c_null_ptr
  my_fields%HDI_density = c_null_ptr
  my_fields%metal_density = c_null_ptr
  my_fields%dust_density = c_null_ptr
  my_fields%volumetric_heating_rate = c_null_ptr
  my_fields%specific_heating_rate = c_null_ptr
  my_fields%RT_heating_rate = c_null_ptr
  my_fields%RT_HI_ionization_rate = c_null_ptr
  my_fields%RT_HeI_ionization_rate = c_null_ptr
  my_fields%RT_HeII_ionization_rate = c_null_ptr
  my_fields%RT_H2_dissociation_rate = c_null_ptr
  my_fields%H2_self_shielding_length = c_null_ptr
  my_fields%H2_custom_shielding_factor = c_null_ptr
  my_fields%isrf_habing = c_null_ptr

  rc = calculate_cooling_time(my_units, my_fields, c_loc(cooltime))
  if (rc /= 1) stop 'calculate_cooling_time failed'
  write(*, '(a, es12.4)') 'cooling_time(1) = ', cooltime(1)

  dt = 0.01d0
  rc = local_solve_chemistry(my_chemistry, my_rates, my_units, &
       my_fields, dt)
  if (rc /= 1) stop 'solve_chemistry failed'
  write(*, '(a, es12.4)') 'HI(1) after solve = ', HI_d(1)

  rc = calculate_temperature(my_units, my_fields, c_loc(temp))
  if (rc /= 1) stop 'calculate_temperature failed'
  write(*, '(a, es12.4)') 'temperature(1) = ', temp(1)

  rc = local_free_chemistry_data(my_chemistry, my_rates)
  write(*, '(a)') 'FORTRAN_EXAMPLE_SUCCESS'

end program fortran_example
