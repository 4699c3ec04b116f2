"""Spike 20: remote DMA (make_async_remote_copy) under shard_map in TPU
interpret mode on a virtual CPU mesh — the validation vehicle for a
multi-chip RDMA factor kernel (NVSHMEM put+signal analog,
reference: SRC/cuda/pdgstrs_lsum_cuda.cu:597-657).

Test: 8 devices in a ring; each pushes its block to the right neighbor;
kernel waits its recv semaphore, adds 1, writes out.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")

import functools

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def kern(x_ref, o_ref, sRecv, sendS, recvS):
    me = lax.axis_index("x")
    n = lax.axis_size("x")
    right = lax.rem(me + 1, n)
    # push my block into the right neighbor's sRecv scratch
    rdma = pltpu.make_async_remote_copy(
        x_ref, sRecv, sendS, recvS, device_id=(right,),
        device_id_type=pltpu.DeviceIdType.MESH)
    rdma.start()
    rdma.wait()          # waits send on my side AND recv on my sRecv
    sRecv[...] = sRecv[...] + 1.0
    cp = pltpu.make_async_copy(sRecv, o_ref, sendS)
    cp.start()
    cp.wait()


def main():
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    x = jnp.arange(8, dtype=jnp.float32)[:, None, None] * jnp.ones(
        (8, 8, 128), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())])

    def local(xs):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                collective_id=7),
            interpret=pltpu.InterpretParams(dma_execution_mode="eager"),
        )(xs[0])[None]

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(P("x"),),
                           out_specs=P("x"), check_vma=False))
    y = np.asarray(fn(x))
    expect = (np.arange(8) - 1) % 8 + 1.0
    got = y[:, 0, 0]
    print("got:", got)
    print("expect:", expect)
    assert np.allclose(got, expect), "RDMA ring mismatch"
    print("OK: remote DMA works under interpret mode on the CPU mesh")


if __name__ == "__main__":
    main()
