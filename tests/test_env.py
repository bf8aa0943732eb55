import jax


def test_virtual_cpu_mesh():
    devs = jax.devices()
    assert len(devs) == 8, devs
    assert devs[0].platform == "cpu"
