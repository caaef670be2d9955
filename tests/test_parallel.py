import numpy as np

import __graft_entry__ as graft
from masters_thesis_tpu.parallel.mesh import make_mesh


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(model=2)  # auto data
    assert mesh2.devices.shape == (4, 2)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_4():
    graft.dryrun_multichip(4)


def test_global_batch_from_host_local():
    """Single-process degenerate case of the multi-host input path: the
    assembled arrays are globally sharded over the mesh and numerically
    identical to the host batch."""
    import jax
    import numpy as np

    from masters_thesis_tpu.parallel.mesh import make_mesh
    from masters_thesis_tpu.parallel.sharding import (
        global_batch_from_host_local,
    )

    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(0)
    batch = {
        "betas": rng.standard_normal((8, 64)).astype(np.float32),
        "tokens": rng.integers(0, 10, (8, 5)).astype(np.int32),
        "target": rng.integers(0, 10, (8, 5)).astype(np.int32),
        "valid": np.ones(8, bool),  # non-sharded key passes through
    }
    g = global_batch_from_host_local(batch, mesh, with_voxel_axis=True)
    assert g["betas"].sharding.mesh.shape == {"data": 4, "model": 2}
    # batch axis sharded over 'data'
    assert len(g["betas"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(g["betas"]), batch["betas"])
    np.testing.assert_array_equal(np.asarray(g["tokens"]), batch["tokens"])
    assert g["valid"] is batch["valid"]
