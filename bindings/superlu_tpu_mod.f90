! Fortran-90 interface to the superlu_dist_tpu C ABI bridge.
!
! Handle-based wrapper in the style of the reference's F90 module
! (reference: FORTRAN/superlu_mod.f90:24-168 and the C glue
! superlu_c2f_dwrap.c:142-156): opaque integer handles stand in for the
! solver state, and every call forwards to the plain-C surface exported
! by libslu_tpu_bridge.so (ops/host/native/bridge.cpp — the pdbridge
! analog, reference: PYTHON/pdbridge.h:27-37).
!
! Uses standard ISO_C_BINDING (F2003); no compiler-specific name
! mangling is needed, unlike the reference's FortranCInterface layer.
! Build:  gfortran -c superlu_tpu_mod.f90
!         gfortran f_drive.F90 superlu_tpu_mod.o -lslu_tpu_bridge
! (This image ships no Fortran compiler, so these files are validated
! by inspection + the C consumer test of the same ABI,
! tests/test_cbridge.py.)

module superlu_tpu_mod
  use iso_c_binding
  implicit none

  interface
     ! handle = slu_tpu_init(n, colptr, rowind, re, im_or_null)
     function slu_tpu_init(n, colptr, rowind, nzval_re, nzval_im) &
          bind(C, name="slu_tpu_init") result(handle)
       import :: c_int64_t, c_double, c_ptr
       integer(c_int64_t), value :: n
       integer(c_int64_t), dimension(*) :: colptr, rowind
       real(c_double), dimension(*) :: nzval_re
       type(c_ptr), value :: nzval_im      ! pass c_null_ptr for real A
       integer(c_int64_t) :: handle
     end function slu_tpu_init

     ! handle = slu_tpu_read_matrix(path) — HB/RB/MatrixMarket readers
     function slu_tpu_read_matrix(path) &
          bind(C, name="slu_tpu_read_matrix") result(handle)
       import :: c_char, c_int64_t
       character(kind=c_char), dimension(*) :: path
       integer(c_int64_t) :: handle
     end function slu_tpu_read_matrix

     function slu_tpu_n(handle) bind(C, name="slu_tpu_n") result(n)
       import :: c_int64_t
       integer(c_int64_t), value :: handle
       integer(c_int64_t) :: n
     end function slu_tpu_n

     ! info = slu_tpu_factor(handle, options_json)
     ! info = 0 ok; k > 0 singular at pivot k; -1 error
     function slu_tpu_factor(handle, options_json) &
          bind(C, name="slu_tpu_factor") result(info)
       import :: c_char, c_int, c_int64_t
       integer(c_int64_t), value :: handle
       character(kind=c_char), dimension(*) :: options_json
       integer(c_int) :: info
     end function slu_tpu_factor

     ! rc = slu_tpu_solve(handle, b_inout, nrhs, trans, refine)
     ! b (n*nrhs, column-major; complex interleaved re,im) is replaced
     ! by the solution, as in f_pdgssvx.
     function slu_tpu_solve(handle, b, nrhs, trans, refine) &
          bind(C, name="slu_tpu_solve") result(rc)
       import :: c_double, c_int, c_int64_t
       integer(c_int64_t), value :: handle
       real(c_double), dimension(*) :: b
       integer(c_int64_t), value :: nrhs
       integer(c_int), value :: trans, refine
       integer(c_int) :: rc
     end function slu_tpu_solve

     ! y = A x  (for residual checks on the Fortran side)
     function slu_tpu_matvec(handle, x, y) &
          bind(C, name="slu_tpu_matvec") result(rc)
       import :: c_double, c_int, c_int64_t
       integer(c_int64_t), value :: handle
       real(c_double), dimension(*) :: x, y
       integer(c_int) :: rc
     end function slu_tpu_matvec

     ! log-determinant: sign/phase (re, im) and log|det|
     function slu_tpu_logdet(handle, sign_re, sign_im, logabs) &
          bind(C, name="slu_tpu_logdet") result(rc)
       import :: c_double, c_int, c_int64_t
       integer(c_int64_t), value :: handle
       real(c_double) :: sign_re, sign_im, logabs
       integer(c_int) :: rc
     end function slu_tpu_logdet

     subroutine slu_tpu_free(handle) bind(C, name="slu_tpu_free")
       import :: c_int64_t
       integer(c_int64_t), value :: handle
     end subroutine slu_tpu_free
  end interface

contains

  !> Convenience: factor + solve in one call (f_pdgssvx analog).
  !> b is overwritten with x; info as in slu_tpu_factor/solve.
  subroutine f_gssvx(handle, b, nrhs, info)
    integer(c_int64_t), intent(in) :: handle
    real(c_double), dimension(*), intent(inout) :: b
    integer(c_int64_t), intent(in) :: nrhs
    integer(c_int), intent(out) :: info
    info = slu_tpu_factor(handle, "{}" // c_null_char)
    if (info /= 0) return
    info = slu_tpu_solve(handle, b, nrhs, 0, 1)
  end subroutine f_gssvx

end module superlu_tpu_mod
