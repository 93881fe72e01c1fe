!=======================================================================
! Fortran 2003 interface to the grackle_tpu C ABI.
!
! TPU-native analogue of the reference's Fortran interface
! (grackle: src/clib/grackle_fortran_interface.def:15-243): BIND(C)
! mirror types of chemistry_data / chemistry_data_storage / code_units /
! grackle_field_data plus interfaces to every public entry point, so
! Fortran hydro codes can `use grackle_tpu_fortran` and link against
! libgrackle_tpu.so.
!
! Field order in grackle_tpu_chemistry_data matches the generated C
! struct in clib/include/grackle_tpu.h exactly (both are generated from
! the same Python registry ordering).
!=======================================================================

module grackle_tpu_fortran
  use iso_c_binding
  implicit none

  integer, parameter :: RKIND = c_double   ! build with FLOAT=8
  integer, parameter :: DKIND = c_double

  type, bind(C) :: grackle_tpu_units
     integer(c_int) :: comoving_coordinates
     real(c_double) :: density_units
     real(c_double) :: length_units
     real(c_double) :: time_units
     real(c_double) :: velocity_units
     real(c_double) :: a_units
     real(c_double) :: a_value
  end type grackle_tpu_units

  type, bind(C) :: grackle_tpu_storage
     integer(c_long_long) :: handle
  end type grackle_tpu_storage

  type, bind(C) :: grackle_tpu_field_data
     integer(c_int) :: grid_rank
     type(c_ptr)    :: grid_dimension
     type(c_ptr)    :: grid_start
     type(c_ptr)    :: grid_end
     real(c_double) :: grid_dx
     type(c_ptr)    :: density
     type(c_ptr)    :: HI_density
     type(c_ptr)    :: HII_density
     type(c_ptr)    :: HM_density
     type(c_ptr)    :: HeI_density
     type(c_ptr)    :: HeII_density
     type(c_ptr)    :: HeIII_density
     type(c_ptr)    :: H2I_density
     type(c_ptr)    :: H2II_density
     type(c_ptr)    :: DI_density
     type(c_ptr)    :: DII_density
     type(c_ptr)    :: HDI_density
     type(c_ptr)    :: e_density
     type(c_ptr)    :: metal_density
     type(c_ptr)    :: dust_density
     type(c_ptr)    :: internal_energy
     type(c_ptr)    :: x_velocity
     type(c_ptr)    :: y_velocity
     type(c_ptr)    :: z_velocity
     type(c_ptr)    :: volumetric_heating_rate
     type(c_ptr)    :: specific_heating_rate
     type(c_ptr)    :: RT_heating_rate
     type(c_ptr)    :: RT_HI_ionization_rate
     type(c_ptr)    :: RT_HeI_ionization_rate
     type(c_ptr)    :: RT_HeII_ionization_rate
     type(c_ptr)    :: RT_H2_dissociation_rate
     type(c_ptr)    :: H2_self_shielding_length
     type(c_ptr)    :: H2_custom_shielding_factor
     type(c_ptr)    :: isrf_habing
  end type grackle_tpu_field_data

  interface
     integer(c_int) function initialize_chemistry_data(my_units) &
          bind(C, name='initialize_chemistry_data')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
     end function initialize_chemistry_data

     integer(c_int) function solve_chemistry(my_units, my_fields, &
          dt_value) bind(C, name='solve_chemistry')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
       type(grackle_tpu_field_data), intent(inout) :: my_fields
       real(c_double), value :: dt_value
     end function solve_chemistry

     integer(c_int) function calculate_cooling_time(my_units, &
          my_fields, cooling_time) bind(C, name='calculate_cooling_time')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
       type(grackle_tpu_field_data), intent(inout) :: my_fields
       type(c_ptr), value :: cooling_time
     end function calculate_cooling_time

     integer(c_int) function calculate_temperature(my_units, &
          my_fields, temperature) bind(C, name='calculate_temperature')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
       type(grackle_tpu_field_data), intent(inout) :: my_fields
       type(c_ptr), value :: temperature
     end function calculate_temperature

     integer(c_int) function calculate_pressure(my_units, &
          my_fields, pressure) bind(C, name='calculate_pressure')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
       type(grackle_tpu_field_data), intent(inout) :: my_fields
       type(c_ptr), value :: pressure
     end function calculate_pressure

     integer(c_int) function calculate_gamma(my_units, &
          my_fields, my_gamma) bind(C, name='calculate_gamma')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
       type(grackle_tpu_field_data), intent(inout) :: my_fields
       type(c_ptr), value :: my_gamma
     end function calculate_gamma

     integer(c_int) function calculate_dust_temperature(my_units, &
          my_fields, dust_temperature) &
          bind(C, name='calculate_dust_temperature')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
       type(grackle_tpu_field_data), intent(inout) :: my_fields
       type(c_ptr), value :: dust_temperature
     end function calculate_dust_temperature

     ! units helpers (grackle_fortran_interface.def:147-167)
     real(c_double) function get_velocity_units(my_units) &
          bind(C, name='get_velocity_units')
       import
       type(grackle_tpu_units), intent(in) :: my_units
     end function get_velocity_units

     subroutine set_velocity_units(my_units) &
          bind(C, name='set_velocity_units')
       import
       type(grackle_tpu_units), intent(inout) :: my_units
     end subroutine set_velocity_units

     real(c_double) function get_temperature_units(my_units) &
          bind(C, name='get_temperature_units')
       import
       type(grackle_tpu_units), intent(in) :: my_units
     end function get_temperature_units
  end interface

end module grackle_tpu_fortran
