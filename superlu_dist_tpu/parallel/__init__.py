"""Distributed layer: process-grid analogs over jax.sharding meshes,
2D block-cyclic and 3D elimination-forest executors."""
