"""Pallas PyrUp kernel parity vs the XLA formulation (interpret mode on CPU,
compiled on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frtm_tpu.models.seg_network import pyr_up_bicubic


def _pallas_pyrup(x, **kw):
    from frtm_tpu.ops.pallas.pyrup import pyr_up_bicubic_pallas
    return pyr_up_bicubic_pallas(x, **kw)


@pytest.mark.parametrize("shape,rb", [((1, 8, 12, 4), 4), ((2, 16, 10, 3), 8),
                                      ((1, 12, 16, 8), 5)])
def test_pallas_pyrup_matches_xla(rng, shape, rb):
    from jax.experimental.pallas import tpu as pltpu
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = np.asarray(pyr_up_bicubic(x))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_pallas_pyrup(x, row_block=rb))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
