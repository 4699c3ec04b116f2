"""Host-side (numpy) preprocessing: equilibration, static pivoting,
orderings, elimination trees, block symbolic factorization."""
