"""Compute layer: host preprocessing algorithms + device kernels."""
