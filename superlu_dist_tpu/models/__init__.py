"""Solver drivers: expert drivers (gssvx/gssvx3d analogs), batched driver."""
