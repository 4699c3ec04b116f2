"""Device (JAX/XLA/Pallas) kernels: tape-driven block LU, level-set
triangular solves, SpMV."""
