"""Spike 21: minimal right-neighbor remote copy, official tutorial shape.
(docs.jax.dev pallas/tpu/distributed 'Example: Right Permute')."""

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
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def right_permute_kernel(input_ref, output_ref, send_sem, recv_sem):
    my_id = lax.axis_index("x")
    num_devices = lax.axis_size("x")
    right_neighbor = lax.rem(my_id + 1, num_devices)
    remote_copy_op = pltpu.make_async_remote_copy(
        src_ref=input_ref,
        dst_ref=output_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=(right_neighbor,),
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    remote_copy_op.start()
    remote_copy_op.wait()


def main():
    num_devices = 8
    mesh = Mesh(np.array(jax.devices()[:num_devices]), ("x",))
    x = jnp.arange(num_devices * 8 * 128, dtype=jnp.int32).reshape(
        (num_devices * 8, 128))

    out_shape = jax.ShapeDtypeStruct((8, 128), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=(
            [pltpu.SemaphoreType.DMA] * 2
        ),
    )

    right_permute = pl.pallas_call(
        right_permute_kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=pltpu.InterpretParams(),
    )
    fn = jax.jit(
        shard_map(
            right_permute,
            mesh=mesh,
            in_specs=P("x"),
            out_specs=P("x"),
            check_vma=False,
        )
    )
    y = np.asarray(fn(x))
    expect = np.roll(np.asarray(x).reshape(num_devices, 8, 128), 1, axis=0)
    assert np.array_equal(y.reshape(num_devices, 8, 128), expect)
    print("OK: tutorial-shape right permute works in interpret mode")


if __name__ == "__main__":
    main()
