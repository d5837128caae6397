import time, jax, jax.numpy as jnp
from quantumcomputer_tpu.utils.compile_cache import enable; enable()
from quantumcomputer_tpu.models.shor_circuit import shor_circuit, shor_circuit_mhigh
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine
from quantumcomputer_tpu.utils.profiling import time_circuit

C, a, M = 8191, 3, 13

# n=29, m_high + gather (two live buffers: 8.6 GB)
try:
    L = 29 - M
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", layout="m_high")
    t = time_circuit(eng, shor_circuit_mhigh(C, a, L, M), iters=2)
    print(f"n=29 m_high gather: {t:.3f}s")
except Exception as e:
    print("n=29 FAIL:", str(e)[:160])

# n=30, standard layout + Benes oracle: every op is an in-place aliased
# pallas kernel, so one 8.6 GB buffer suffices where the gather would OOM.
try:
    L = 30 - M
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", oracle="benes")
    t = time_circuit(eng, shor_circuit(C, a, L, M), iters=2)
    print(f"n=30 benes in-place: {t:.3f}s")
except Exception as e:
    print("n=30 FAIL:", str(e)[:160])
