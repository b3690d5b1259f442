"""Bit-exactness of the MXU one-hot table gather (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimg_tpu.ops.mxu_gather import gather_row, split3


def test_bit_exact_roundtrip():
    n, p = 200, 24
    npad = -(-n // 8) * 8
    rs = np.random.RandomState(1)
    table = (rs.randn(p, npad) * np.exp(rs.randn(p, npad) * 4)
             ).astype(np.float32)
    table[:, n:] = 0.0
    hi, mid, lo = split3(table)
    # the split itself is exact
    assert np.all(np.asarray(hi, np.float32) + np.asarray(mid, np.float32)
                  + np.asarray(lo, np.float32) == table)

    def kernel(id_ref, t_hi, t_mid, t_lo, o_ref):
        o_ref[:] = gather_row(t_hi, t_mid, t_lo,
                              id_ref[pl.ds(0, 1), :], npad)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )
    ids = jnp.asarray(rs.randint(0, n, (8, 128)), jnp.int32)
    out = np.asarray(fn(ids, jnp.asarray(hi), jnp.asarray(mid),
                        jnp.asarray(lo)))
    want = table[:, np.asarray(ids[0])]
    assert np.all(out == want)
