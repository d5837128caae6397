import jax, jax.numpy as jnp
# binary-search the largest allocatable f32 buffer
def try_alloc(gb):
    try:
        n = int(gb * 1e9 / 4)
        x = jnp.zeros((n,), jnp.float32)
        x.block_until_ready()
        s = float(x[0])
        del x
        return True
    except Exception:
        return False
for gb in (2, 4, 6, 8, 10, 12, 14):
    print(gb, "GB:", try_alloc(gb))
