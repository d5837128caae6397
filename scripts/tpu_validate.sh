#!/bin/sh
# Owed TPU validations — run when the axon tunnel is up (each step is
# independent; ~10-40 min cold depending on compile-cache state).
# Tunnel health check first: bench exits 1 with an error JSON if down.
set -x

# 1. Frozen-headline bench (writes the BENCH_r* numbers).
timeout 1200 python bench.py || exit 1

# 2. Semiclassical CLI end-to-end on TPU (implicit-control engine).
timeout 900 python -m quantumcomputer_tpu -C 391 -L 14 -M 9 --semiclassical --seed 5 -v

# 3. 30-bit headline demo: C = 1,060,314,373 = 32749 x 32377 (a=2,
#    period 622,212) on the M=30 complex32 per-step path — the largest
#    int32-legal modulus class, one chip.
timeout 3600 python -m quantumcomputer_tpu -C 1060314373 -L 45 -M 30 -a 2 \
  --semiclassical --dtype complex32 --seed 0 -v
