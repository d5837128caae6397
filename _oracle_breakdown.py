import jax.numpy as jnp
from quantumcomputer_tpu.utils.compile_cache import enable; enable()
from quantumcomputer_tpu.models import circuit as cir
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine
from quantumcomputer_tpu.utils.profiling import time_circuit

n, M, C = 28, 13, 8191
L = n - M
eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", layout="m_high")

def oblk(cs):
    return tuple(cir.Gate("camodc_high", (c,), meta=(C, pow(3, i + 1, C), M)) for i, c in enumerate(cs))

for label, ctrl in [("pure c=14", 14), ("pure c=10", 10), ("mixed c=5", 5), ("mixed c=0", 0)]:
    t2 = time_circuit(eng, oblk([ctrl, ctrl]), iters=3)
    t8 = time_circuit(eng, oblk([ctrl] * 8), iters=3)
    per = (t8 - t2) / 6
    print(f"{label}: {per*1e3:.2f} ms/apply")
