"""Benes oracle vs XLA gather at n=28, M=13 on TPU."""
import time, jax, jax.numpy as jnp
from quantumcomputer_tpu.utils.compile_cache import enable; enable()
from quantumcomputer_tpu.models import circuit as cir
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine
from quantumcomputer_tpu.utils.profiling import time_circuit

n, M, C = 28, 13, 8191
mk = lambda i: cir.CAMODC(C, pow(3, i + 1, C), M + 1 + (i % (n - M - 1)))

eng_b = StateVectorEngine(Register(L=n - M, M=M), dtype=jnp.complex64, backend="pallas")
t2 = time_circuit(eng_b, tuple(mk(i) for i in range(2)), iters=3)
t10 = time_circuit(eng_b, tuple(mk(i) for i in range(10)), iters=3)
per_b = (t10 - t2) / 8
print(f"benes oracle: {per_b*1e3:.2f} ms/apply -> {2*(1<<n)*8/per_b/1e9:.0f} GB/s equiv")

eng_g = StateVectorEngine(Register(L=n - M, M=M), dtype=jnp.complex64, backend="xla")
t2g = time_circuit(eng_g, tuple(mk(i) for i in range(2)), iters=3)
t10g = time_circuit(eng_g, tuple(mk(i) for i in range(10)), iters=3)
per_g = (t10g - t2g) / 8
print(f"xla gather:   {per_g*1e3:.2f} ms/apply; benes speedup {per_g/per_b:.2f}x")
