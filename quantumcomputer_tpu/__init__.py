"""quantumcomputer_tpu: a TPU-native state-vector quantum simulator.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
GSL-based Shor's-algorithm simulator (adamalderton/QuantumComputer): a
2^n complex amplitude vector lives HBM-resident (sharded over a device
mesh at scale); gates apply as strided-axis contractions, fused diagonals,
and permutation gathers — never as materialized 2^N x 2^N matrices.
"""

from quantumcomputer_tpu.algorithms.amplitude_estimation import amplitude_estimate  # noqa: F401
from quantumcomputer_tpu.algorithms.grover import grover_circuit, grover_search  # noqa: F401
from quantumcomputer_tpu.algorithms.oracle_algorithms import (  # noqa: F401
    bernstein_vazirani,
    deutsch_jozsa,
)
from quantumcomputer_tpu.algorithms.qpe import estimate_phase  # noqa: F401
from quantumcomputer_tpu.algorithms.simon import simon_search  # noqa: F401
from quantumcomputer_tpu.algorithms.quantum_volume import run_quantum_volume  # noqa: F401
from quantumcomputer_tpu.algorithms.semiclassical import run_semiclassical  # noqa: F401
from quantumcomputer_tpu.algorithms.variational import (  # noqa: F401
    HardwareEfficientAnsatz,
    expectation,
    expectation_on_engine,
    pauli_term,
    qaoa_maxcut,
    vqe,
)
from quantumcomputer_tpu.algorithms.shor import (  # noqa: F401
    Outcome,
    ShorResult,
    find_period,
    read_omega,
    shors_algorithm,
)
from quantumcomputer_tpu.models import circuit  # noqa: F401
from quantumcomputer_tpu.models.shor_circuit import shor_circuit, shor_circuit_reference  # noqa: F401
from quantumcomputer_tpu.parallel.mesh import build_mesh  # noqa: F401
from quantumcomputer_tpu.parallel.sharded import ShardedStateVectorEngine  # noqa: F401
from quantumcomputer_tpu.sim.dd_engine import DDStateVectorEngine  # noqa: F401
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine  # noqa: F401

__version__ = "0.3.0"
