import jax, jax.numpy as jnp
from quantumcomputer_tpu.utils.compile_cache import enable; enable()
from quantumcomputer_tpu.models import circuit as cir
from quantumcomputer_tpu.models.shor_circuit import shor_circuit
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine
from quantumcomputer_tpu.utils.profiling import time_circuit

def trial(label, fn):
    try:
        print(label, f"{fn():.3f}s")
    except Exception as e:
        print(label, "FAIL:", str(e)[:100])

# 1) single fused H pass at n=30 (aliased in-place)
eng30 = StateVectorEngine(Register(L=30, M=0), dtype=jnp.complex64, backend="pallas")
trial("n=30 one H pass:", lambda: time_circuit(eng30, (cir.H(20),), iters=1))
# 2) 8 fused gates at n=30
trial("n=30 8-gate block:", lambda: time_circuit(eng30, tuple(cir.RY(q, 0.1) for q in (0, 8, 20, 29, 1, 9, 21, 28)), iters=1))
# 3) full shor n=29 with benes (4.3 GB state)
C, a, M = 8191, 3, 13
eng29 = StateVectorEngine(Register(L=29 - M, M=M), dtype=jnp.complex64, backend="pallas", oracle="benes")
trial("n=29 shor benes:", lambda: time_circuit(eng29, shor_circuit(C, a, 29 - M, M), iters=1))
