import time, jax, jax.numpy as jnp, numpy as np
t0=time.time()
x = jnp.ones((256,256), jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
r = np.asarray(f(x))
print(f"chip ok: {time.time()-t0:.1f}s sum={float(r.sum()):.1f} dev={jax.devices()}")
