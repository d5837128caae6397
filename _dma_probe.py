from quantumcomputer_tpu.utils.compile_cache import enable; enable()
from bench import bench_full_shor_circuit
t, g = bench_full_shor_circuit(28, "m_high")
print(f"full shor n=28 m_high (fixed purity rule): {t:.3f}s ({g} gates)")
