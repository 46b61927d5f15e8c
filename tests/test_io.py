"""IO tests: CSV round trips (native extension when built + numpy fallback),
checkpointing."""

import numpy as np
import pytest

import scythe_tpu.io as sio


def test_csv_roundtrip_fallback(tmp_path):
    path = str(tmp_path / "t.csv")
    cols = np.array([[1.0, 2.5], [3.0, -4.25], [1e-17, 1.23456789012345678]])
    names = ["r", "u"]
    # force the numpy fallback regardless of native availability
    nio = sio._nio
    sio._nio = None
    try:
        sio._write_csv(path, names, cols)
        names2, data = sio._read_csv(path)
    finally:
        sio._nio = nio
    assert names2 == names
    np.testing.assert_allclose(data, cols, rtol=0, atol=0)


@pytest.mark.skipif(sio._nio is None, reason="native extension not built")
def test_csv_roundtrip_native(tmp_path):
    path = str(tmp_path / "t.csv")
    rng = np.random.default_rng(0)
    cols = rng.normal(size=(257, 5)) * 10.0 ** rng.integers(-10, 10, size=(257, 5))
    names = ["r", "l", "h", "u", "v"]
    sio._write_csv(path, names, cols)
    names2, data = sio._read_csv(path)
    assert names2 == names
    np.testing.assert_allclose(data, cols, rtol=0, atol=0)  # %.17g is exact


@pytest.mark.skipif(sio._nio is None, reason="native extension not built")
def test_native_matches_fallback(tmp_path):
    path = str(tmp_path / "t.csv")
    cols = np.array([[0.1, 2.0], [3.0, 4.0]])
    sio._write_csv(path, ["a", "b"], cols)
    native = sio._read_csv(path)
    nio = sio._nio
    sio._nio = None
    try:
        fallback = sio._read_csv(path)
    finally:
        sio._nio = nio
    assert native[0] == fallback[0]
    np.testing.assert_array_equal(native[1], fallback[1])


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from scythe_tpu import timeintegration as ti

    spec = jnp.asarray(np.random.default_rng(1).normal(size=(2, 13)))
    state = ti.initial_state(spec, (2, 30), jnp.float64)
    state = state._replace(t=jnp.asarray(7))
    path = str(tmp_path / "ckpt.npz")
    sio.save_checkpoint(path, state, t_sim=21.0)
    state2, t_sim = sio.load_checkpoint(path)
    assert t_sim == 21.0
    assert int(state2.t) == 7
    np.testing.assert_array_equal(np.asarray(state2.spec), np.asarray(state.spec))
