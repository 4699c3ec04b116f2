! Fortran driver for the TPU solver through the C ABI bridge — the
! f_pddrive analog (reference: FORTRAN/f_pddrive.F90). Reads a
! Harwell-Boeing matrix, factors, solves A x = b for b = A*ones, and
! prints the max-norm error (pdinf_norm_error analog).
program f_drive
  use iso_c_binding
  use superlu_tpu_mod
  implicit none
  integer(c_int64_t) :: h, n
  integer(c_int) :: info
  real(c_double), allocatable :: x(:), b(:)
  real(c_double) :: err
  integer :: i

  h = slu_tpu_read_matrix("g20.rua" // c_null_char)
  if (h == 0) stop "read_matrix failed"
  n = slu_tpu_n(h)
  allocate (x(n), b(n))
  x = 1.0_c_double
  info = slu_tpu_factor(h, '{"dtype": "float32"}' // c_null_char)
  if (info /= 0) stop "factor failed"
  info = slu_tpu_matvec(h, x, b)
  info = slu_tpu_solve(h, b, 1_c_int64_t, 0, 1)
  if (info /= 0) stop "solve failed"
  err = 0.0_c_double
  do i = 1, int(n)
     err = max(err, abs(b(i) - 1.0_c_double))
  end do
  print "(a, es12.4)", "||x - 1||_inf = ", err
  call slu_tpu_free(h)
end program f_drive
