#!/bin/bash
# Run the test suite on the virtual 8-device CPU mesh.
#
# PALLAS_AXON_POOL_IPS is cleared so the environment's sitecustomize does
# not register/claim the TPU tunnel for a CPU-only test process (a claimed
# tunnel starves concurrent TPU jobs like bench.py).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ "$@"
