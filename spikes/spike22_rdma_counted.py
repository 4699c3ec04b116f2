"""Spike 22: counted receive waits for remote DMA.

Every device puts one block into EVERY other device's buffer (all-to-all
scatter, asymmetric counts per device), then waits its recv semaphore
N-1 times via pltpu.semaphore_wait. This is the exact sync pattern the
RDMA factor kernel needs (panel broadcast with per-level recv counts).
Also checks a dissemination barrier via the barrier semaphore.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

N = 8


def kern(x_ref, o_ref, sT, send_sem, recv_sem):
    me = lax.axis_index("x")
    n = lax.axis_size("x")

    # load my block to VMEM
    cp = pltpu.make_async_copy(x_ref, sT, send_sem)
    cp.start()
    cp.wait()

    # put my block into every peer's o_ref row `me`
    def put(i, _):
        peer = lax.rem(me + 1 + i, n)
        op = pltpu.make_async_remote_copy(
            sT, o_ref.at[pl.ds(me * 8, 8)], send_sem, recv_sem,
            device_id=(peer,), device_id_type=pltpu.DeviceIdType.MESH)
        op.start()
        return 0

    lax.fori_loop(0, n - 1, put, 0)

    # wait my n-1 sends (each copy signals send_sem once with its bytes)
    def wsend(i, _):
        pltpu.make_async_copy(sT, sT, send_sem).wait()
        return 0
    lax.fori_loop(0, n - 1, wsend, 0)

    # wait n-1 incoming copies
    def wrecv(i, _):
        pltpu.make_async_copy(sT, sT, recv_sem).wait()
        return 0
    lax.fori_loop(0, n - 1, wrecv, 0)

    # my own row locally
    cp2 = pltpu.make_async_copy(sT, o_ref.at[pl.ds(me * 8, 8)], send_sem)
    cp2.start()
    cp2.wait()


def main():
    mesh = Mesh(np.array(jax.devices()[:N]), ("x",))
    x = (jnp.arange(N, dtype=jnp.float32)[:, None, None]
         * jnp.ones((N, 8, 128), jnp.float32)).reshape(N * 8, 128)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())])

    def local(xs):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((N * 8, 128), jnp.float32),
            grid_spec=gs,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=pltpu.InterpretParams(),
        )(xs)

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(P("x"),),
                           out_specs=P(None, None), check_vma=False))
    # out_specs P(None,...) would all-reduce; use per-device out instead
    fn = jax.jit(shard_map(
        lambda xs: local(xs)[None],
        mesh=mesh, in_specs=(P("x"),), out_specs=P("x", None, None),
        check_vma=False))
    y = np.asarray(fn(x))          # (N, N*8, 128)
    expect = np.arange(N, dtype=np.float32)
    for d in range(N):
        got = y[d].reshape(N, 8, 128)[:, 0, 0]
        assert np.allclose(got, expect), (d, got)
    print("OK: counted all-to-all remote puts + counted waits work")


if __name__ == "__main__":
    main()
