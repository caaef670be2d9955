import jax


def test_backend_is_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
