"""scan_chunks: chunked kernel orchestration parity.

The Pallas ops split >_MAX_CHUNK point batches into lax.scan'd chunks
(ops/chunking.py — one compiled body instead of k inlined programs).
These tests force tiny _MAX_CHUNK values and check the chunked paths
(fwd, custom-vjp bwd, nablas) against single-call references, in
interpret mode so the real kernel logic runs on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nr3d_lib_tpu.ops import lotd_brick as B
from nr3d_lib_tpu.ops.chunking import scan_chunks


class _chunk:
    def __init__(self, module, max_chunk):
        self.m, self.v = module, max_chunk

    def __enter__(self):
        self.saved = self.m._MAX_CHUNK
        self.m._MAX_CHUNK = self.v

    def __exit__(self, *a):
        self.m._MAX_CHUNK = self.saved


class _block:
    def __init__(self, block, version=3, mxu=True):
        self.block, self.version, self.mxu = block, version, mxu

    def __enter__(self):
        self.saved = (B._FWD_BLOCK, B._FWD_VERSION, B._MXU_DENSE)
        B._FWD_BLOCK, B._FWD_VERSION, B._MXU_DENSE = (
            self.block, self.version, self.mxu)

    def __exit__(self, *a):
        B._FWD_BLOCK, B._FWD_VERSION, B._MXU_DENSE = self.saved


def test_scan_chunks_concat_and_sum(rng):
    x = jnp.asarray(rng.standard_normal((1000, 3)), jnp.float32)

    def body(xc):
        return (xc * 2.0,), (jnp.sum(xc, axis=0),)

    (out,), (tot,) = scan_chunks(body, (x,), 1000, 256,
                                 sum_init=(jnp.zeros(3),))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0,
                               rtol=1e-6)
    # padding contributes zeros to sums
    np.testing.assert_allclose(np.asarray(tot), np.asarray(x).sum(0),
                               rtol=1e-5)


def test_scan_chunks_pad_values(rng):
    x = jnp.asarray(rng.uniform(0.1, 0.9, (70, 3)), jnp.float32)
    seen = []

    def body(xc):
        seen.append(xc.shape)
        return (xc,), ()

    (out,), _ = scan_chunks(body, (x,), 70, 32, pad_values=(0.5,))
    assert out.shape == (70, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-7)


@pytest.mark.parametrize("mxu", [False, True])
def test_brick_chunked_fwd_bwd_matches_single(rng, mxu):
    """Chunked custom-vjp path (interpret kernels) == single-call path."""
    meta = B.make_brick_meta([16, 32], ["Dense", "Hash"], hashmap_rows=256)
    table = jnp.asarray(
        rng.standard_normal((meta.total_rows, 128)) * 1e-2, jnp.float32)
    n = 700  # > 256 => 3 chunks; tile multiple handled by padding
    x = jnp.asarray(rng.uniform(0.01, 0.99, (n, 3)), jnp.float32)

    def loss(t_, x_):
        return jnp.sum(B.brick_encode(x_, t_, meta, use_pallas=False) ** 2)

    # reference: XLA path, unchunked (brick_encode's XLA branch)
    l_ref, (dt_ref, dx_ref) = jax.value_and_grad(
        loss, argnums=(0, 1))(table, x)

    from jax.experimental.pallas import tpu as pltpu

    with _chunk(B, 256), _block(64, mxu=mxu), \
            pltpu.force_tpu_interpret_mode():
        y_chunked = B._brick_encode_pallas(x, table, meta, tile=128,
                                           interpret=True)
        dx_c, dt_c = B._brick_bwd_pallas(
            x, table, 2 * B.brick_encode_xla(x, table, meta), meta,
            tile=128, interpret=True)

    y_ref = B.brick_encode_xla(x, table, meta)
    np.testing.assert_allclose(np.asarray(y_chunked), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dt_c), np.asarray(dt_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx_c), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-5)


def test_brick_chunked_nablas_matches_single(rng):
    """Chunked dydx kernel == unchunked, including tail-chunk trimming."""
    meta = B.make_brick_meta([16], ["Dense"])
    table = jnp.asarray(
        rng.standard_normal((meta.total_rows, 128)) * 1e-2, jnp.float32)
    n = 300
    x = jnp.asarray(rng.uniform(0.01, 0.99, (n, 3)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)

    from jax.experimental.pallas import tpu as pltpu

    with _block(64), pltpu.force_tpu_interpret_mode():
        dx_single = B._brick_dydx_pallas(g, x, table, meta, tile=128,
                                         interpret=True)
        with _chunk(B, 128):
            dx_chunked = B._brick_dydx_pallas(g, x, table, meta, tile=128,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(dx_chunked),
                               np.asarray(dx_single), rtol=1e-5, atol=1e-7)


def test_permuto_cell_chunked_fwd(rng):
    from nr3d_lib_tpu.ops import permuto_cell as PC

    meta = PC.make_permuto_cell_meta(3, [4.0, 8.0], hashmap_rows=512)
    table = jnp.asarray(
        rng.standard_normal((meta.total_rows, 128)) * 1e-2, jnp.float32)
    n = 500
    x = jnp.asarray(rng.uniform(0.05, 0.95, (n, 3)), jnp.float32)
    y_ref = PC.permuto_cell_encode_xla(x, table, meta)

    from jax.experimental.pallas import tpu as pltpu

    with _chunk(PC, 256), pltpu.force_tpu_interpret_mode():
        y_chunked = PC._encode_pallas(x, table, meta, tile=128,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(y_chunked), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-6)
