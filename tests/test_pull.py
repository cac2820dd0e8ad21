"""bulk_pull: bit-exactness, dtype round-trips, mixed-device grouping."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srba_slam_tpu.utils.pull import bulk_pull


def test_bulk_pull_bit_exact_all_dtypes(rng):
    arrays = [
        rng.integers(-2**31, 2**31 - 1, (7, 5), dtype=np.int64)
        .astype(np.int32),
        np.array([1.5, -0.0, np.nan, np.inf, -np.inf, 1e-45], np.float32),
        rng.random(11).astype(np.float32),
        rng.integers(0, 2, 13).astype(bool),
        rng.integers(-128, 127, (3, 4), dtype=np.int64).astype(np.int8),
        rng.integers(0, 255, 9, dtype=np.int64).astype(np.uint8),
        rng.integers(0, 2**32 - 1, 6, dtype=np.uint64).astype(np.uint32),
        rng.integers(-2**15, 2**15 - 1, 4, dtype=np.int64).astype(np.int16),
    ]
    handles = tuple(jnp.asarray(a) for a in arrays)
    out = bulk_pull(handles)
    ref = tuple(np.asarray(h) for h in jax.device_get(handles))
    for o, r in zip(out, ref):
        assert o.dtype == r.dtype and o.shape == r.shape
        np.testing.assert_array_equal(o.view(np.uint8), r.view(np.uint8))


def test_bulk_pull_mixed_device_sets(rng):
    """A mesh-sharded handle next to single-device-committed handles must
    pull correctly (grouped per device set, not one refused concat)."""
    devs = jax.devices()
    if len(devs) < 2:
        import pytest

        pytest.skip("needs multiple (virtual) devices")
    mesh = Mesh(np.array(devs), ("batch",))
    sharded = jax.device_put(
        rng.random((len(devs) * 4, 6)).astype(np.float32),
        NamedSharding(mesh, P("batch", None)))
    single_a = jax.device_put(
        rng.integers(0, 100, 10, dtype=np.int64).astype(np.int32), devs[0])
    single_b = jax.device_put(rng.random(5).astype(np.float32), devs[1])
    uncommitted = jnp.arange(8, dtype=jnp.int32) * 3

    handles = (sharded, single_a, single_b, uncommitted)
    out = bulk_pull(handles)
    ref = tuple(np.asarray(h) for h in jax.device_get(handles))
    for o, r in zip(out, ref):
        assert o.dtype == r.dtype and o.shape == r.shape
        np.testing.assert_array_equal(o, r)
