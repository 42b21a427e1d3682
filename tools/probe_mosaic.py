"""Feasibility probes for the fused NTT transform kernel: what does this
box's Mosaic stack support in-kernel?

1. jnp.swapaxes on a 3D i32 block (R, 32, 128) <-> (R, 128, 32)
2. int8 dot_general with preferred_element_type=int32
3. u32 elementwise multiply (low 32 bits)
4. reshape (R, 32, 128) -> (R*32, 128) in-kernel
5. concatenate along lanes
"""
import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R = 8


def probe(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        np.asarray(out)
        print(f"{name:44s} OK shape={out.shape} dtype={out.dtype}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:44s} FAIL {msg}")
        return False


x3 = jnp.arange(R * 32 * 128, dtype=jnp.int32).reshape(R, 32, 128)
a8 = jnp.ones((256, 128), dtype=jnp.int8)
b8 = jnp.ones((128, 256), dtype=jnp.int8)
u = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)


def k_swap(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], -1, -2)


probe("in-kernel swapaxes (R,32,128)->(R,128,32)",
      lambda x: pl.pallas_call(
          k_swap, out_shape=jax.ShapeDtypeStruct((R, 128, 32), jnp.int32))(x),
      x3)


def k_swap2(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[0], 0, 1)[None]


probe("in-kernel 2D transpose (32,128)->(128,32)",
      lambda x: pl.pallas_call(
          k_swap2,
          out_shape=jax.ShapeDtypeStruct((1, 128, 32), jnp.int32))(x[:1]),
      x3)


def k_dot(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


probe("in-kernel i8 dot -> i32 (256,128)@(128,256)",
      lambda a, b: pl.pallas_call(
          k_dot, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32))(a, b),
      a8, b8)


def k_mul(a_ref, o_ref):
    o_ref[:] = a_ref[:] * a_ref[:]


probe("in-kernel u32 multiply (low)",
      lambda a: pl.pallas_call(
          k_mul, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32))(a),
      u)


def k_reshape(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(R * 32, 128)


probe("in-kernel reshape (R,32,128)->(R*32,128)",
      lambda x: pl.pallas_call(
          k_reshape,
          out_shape=jax.ShapeDtypeStruct((R * 32, 128), jnp.int32))(x),
      x3)


def k_concat(x_ref, o_ref):
    h = x_ref[:].astype(jnp.int8)
    o_ref[:] = jnp.concatenate([h, h, h, h], axis=-1)


probe("in-kernel lane concat x4 (8,128)i8->(8,512)",
      lambda a: pl.pallas_call(
          k_concat,
          out_shape=jax.ShapeDtypeStruct((8, 512), jnp.int8))(
              a.astype(jnp.int32)),
      u.astype(jnp.int32))


def k_shift(a_ref, o_ref):
    o_ref[:] = (a_ref[:] >> jnp.uint32(16)) & jnp.uint32(0xFFFF)


probe("in-kernel u32 shift/mask",
      lambda a: pl.pallas_call(
          k_shift, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32))(a),
      u)


def k_i8dot_big(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


a8b = jnp.ones((1024, 512), dtype=jnp.int8)
b8b = jnp.ones((512, 448), dtype=jnp.int8)
probe("in-kernel i8 dot (1024,512)@(512,448)",
      lambda a, b: pl.pallas_call(
          k_i8dot_big,
          out_shape=jax.ShapeDtypeStruct((1024, 448), jnp.int32))(a, b),
      a8b, b8b)
