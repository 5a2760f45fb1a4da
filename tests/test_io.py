"""XDMF/H5 IO: read the reference's committed example meshes and run on them."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsxfus_tpu import LinearSpectralExplicit
from fenicsxfus_tpu.io.xdmf import read_mesh, save_field_npz, write_xdmf_field
from fenicsxfus_tpu.ops.operators import SEMOperators

REF2D = "/root/reference/python/examples/linear_planewave2d_1_exp/mesh.xdmf"

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF2D), reason="reference meshes not mounted"
)


@needs_ref
def test_read_reference_mesh():
    mesh = read_mesh(REF2D)
    assert mesh.dim == 2
    assert mesh.num_cells == 8400
    assert mesh.num_vertices == 8591
    assert set(mesh.facet_tags) == {1, 2, 3}
    assert mesh.cell_tags is not None and len(mesh.cell_tags) == 8400
    # all cells positively oriented after vertex permutation
    from fenicsxfus_tpu.core.geometry import volume_factors

    wdetJ, _ = volume_factors(mesh, 2)
    assert np.all(wdetJ > 0)
    # source facets (tag 1) lie on the x=0 boundary
    from fenicsxfus_tpu.core.mesh import facet_midpoints

    mids = facet_midpoints(mesh, mesh.facet_tags[1])
    assert np.all(np.abs(mids[:, 0]) < 1e-10)


@needs_ref
def test_solve_on_reference_mesh():
    """Short linear solve on the committed reference mesh (the example setup
    of ``linear_planewave2d_1_exp.py`` at reduced final time)."""
    mesh = read_mesh(REF2D)
    f0, p0 = 0.5e6, 60000.0
    c0, rho0 = 1500.0, 1000.0
    degree = 4
    h = mesh.h_min()
    dt = 0.9 * h / (c0 * degree**2)
    eqn = LinearSpectralExplicit(
        mesh, None, degree, c0, rho0, f0, p0, c0, 4, dt, dtype=jnp.float64
    )
    eqn.init()
    u, v, tf = eqn.rk(0.0, 40 * dt)
    assert np.all(np.isfinite(np.asarray(u)))
    assert float(jnp.max(jnp.abs(u))) > 0


def test_field_output(tmp_path):
    from fenicsxfus_tpu import create_rectangle

    mesh = create_rectangle((4, 3))
    ops = SEMOperators(mesh, 3, dtype=jnp.float64)
    u = jnp.asarray(ops.space.dof_coords[:, 0] ** 2)
    npz = tmp_path / "snap.npz"
    save_field_npz(str(npz), ops, {"u": u}, t=1.5)
    data = np.load(npz)
    assert data["t"] == 1.5 and data["u"].shape == (ops.ndofs,)

    xdmf = tmp_path / "field.xdmf"
    write_xdmf_field(str(xdmf), ops, u, name="u")
    assert xdmf.exists() and (tmp_path / "field.h5").exists()
    # round-trip: vertex values equal x^2 at the vertices
    import h5py

    with h5py.File(tmp_path / "field.h5", "r") as f:
        vv = np.asarray(f["/fields/u"])
    assert np.allclose(vv, mesh.vertices[:, 0] ** 2, atol=1e-13)


def test_movie_timeseries(tmp_path):
    """write_movie: temporal XDMF collection with frames matching the
    equivalent single rk() run (the VTX .bp analogue, VERDICT r1 #8)."""
    import xml.etree.ElementTree as ET

    import h5py

    from fenicsxfus_tpu import create_rectangle, tag_boundaries
    from fenicsxfus_tpu.io.xdmf import write_movie

    def make():
        mesh = create_rectangle((10, 3), (0, 0), (1.0, 0.3))
        tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
        )
        return LinearSpectralExplicit(
            mesh, None, 3, 1.0, 1.0, 10.0, 1.0, 1.0, 4, 1e-3, dtype=jnp.float64
        )

    m = make().init()
    path = tmp_path / "movie.xdmf"
    times = write_movie(m, 0.0, 0.2, str(path), n_frames=5)
    assert len(times) == 6 and abs(times[-1] - 0.2) < 1e-12

    ref = make().init()
    u_ref, _, _ = ref.rk(0.0, 0.2)
    from fenicsxfus_tpu.io.xdmf import _vertex_values

    with h5py.File(tmp_path / "movie.h5", "r") as f:
        assert np.allclose(
            np.asarray(f["/fields/u/5"]), _vertex_values(ref.ops, u_ref),
            atol=1e-12,
        )
        assert np.max(np.abs(np.asarray(f["/fields/u/3"]))) > 0
    # valid XML with 6 temporal frames
    tree = ET.parse(path)
    coll = [g for g in tree.getroot().iter("Grid")
            if g.get("CollectionType") == "Temporal"]
    assert len(coll) == 1 and len(coll[0].findall("Grid")) == 6


def test_checkpoint_resume(tmp_path):
    """A run split by checkpoint/resume must match the uninterrupted run."""
    import jax.numpy as jnp

    from fenicsxfus_tpu import LinearSpectralExplicit, create_interval, tag_boundaries
    from fenicsxfus_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    def make():
        mesh = create_interval(20, 0.0, 1.0)
        tag_boundaries(
            mesh, {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12}
        )
        return LinearSpectralExplicit(
            mesh, None, 4, 1.0, 1.0, 10.0, 1.0, 1.0, 4, 1e-3, dtype=jnp.float64
        )

    full = make()
    full.init()
    u_full, v_full, _ = full.rk(0.0, 0.2)

    part = make()
    part.init()
    part.rk(0.0, 0.1)
    ckpt = tmp_path / "state.npz"
    save_checkpoint(str(ckpt), part)

    resumed = make()
    resumed.init()
    t = load_checkpoint(str(ckpt), resumed)
    u_res, v_res, _ = resumed.rk(t, 0.2)
    assert np.allclose(np.asarray(u_res), np.asarray(u_full), atol=1e-13)
    assert np.allclose(np.asarray(v_res), np.asarray(v_full), atol=1e-13)

    # incompatible restore refuses
    import pytest as _pytest

    other = make()
    with _pytest.raises(ValueError, match="dofs"):
        bad = LinearSpectralExplicit(
            tag_boundaries(
                create_interval(10, 0.0, 1.0),
                {1: lambda x: x[0] < 1e-12, 2: lambda x: x[0] > 1 - 1e-12},
            ),
            None, 4, 1.0, 1.0, 10.0, 1.0, 1.0, 4, 1e-3, dtype=jnp.float64,
        )
        load_checkpoint(str(ckpt), bad)
