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
