"""Checkpoint save/load round-trip tests."""

import numpy as np

from perphil_tpu.forms import Function, create_function_spaces, mixed_space
from perphil_tpu.mesh import create_mesh
from perphil_tpu.utils.checkpoint import (
    load_function,
    load_rows,
    save_function,
    save_rows,
)


def test_scalar_roundtrip(tmp_path):
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    f = Function(V).interpolate(lambda x, y: x + 3 * y)
    save_function(tmp_path / "f.npz", f)
    g = load_function(tmp_path / "f.npz")
    assert g.space.mesh == mesh
    assert np.allclose(np.asarray(g.data), np.asarray(f.data))


def test_mixed_roundtrip(tmp_path):
    mesh = create_mesh(3, 3)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    w = Function(W)
    w.sub(0)  # touch API
    save_function(tmp_path / "w.npz", w)
    w2 = load_function(tmp_path / "w.npz")
    assert w2.space.num_sub_spaces() == 2
    for a, b in zip(w2.data, w.data):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_rows_roundtrip(tmp_path):
    rows = [{"N": 4, "it": 10, "e": 1.5}]
    save_rows(tmp_path / "rows.json", rows)
    assert load_rows(tmp_path / "rows.json") == rows
    assert load_rows(tmp_path / "missing.json") == []
