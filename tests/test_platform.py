import jax
def test_platform():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()
